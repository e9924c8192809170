"""ArcFace IResNet (identity-loss backbone): golden vs an independent
torch implementation of the standard arcface iresnet at imported weights,
and the GFPGAN identity-loss training path.

The reference's own identity path is broken (gfpgan_model.py:198 uses an
undefined `backbones` module), so the torch side here is transcribed from
the public insightface arcface definition the reference intended to load.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from image_restoration_tpu.archs import build_network  # noqa: E402
from image_restoration_tpu.convert.iresnet_import import (  # noqa: E402
    import_iresnet)



def conv3x3(inp, out, stride=1):
    return nn.Conv2d(inp, out, 3, stride, 1, bias=False)


class TIBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(inplanes, eps=1e-05)
        self.conv1 = conv3x3(inplanes, planes)
        self.bn2 = nn.BatchNorm2d(planes, eps=1e-05)
        self.prelu = nn.PReLU(planes)
        self.conv2 = conv3x3(planes, planes, stride)
        self.bn3 = nn.BatchNorm2d(planes, eps=1e-05)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.bn1(x)
        out = self.conv1(out)
        out = self.bn2(out)
        out = self.prelu(out)
        out = self.conv2(out)
        out = self.bn3(out)
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class TIResNet(nn.Module):
    def __init__(self, layers, num_features=512):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64, eps=1e-05)
        self.prelu = nn.PReLU(64)
        self.layer1 = self._make_layer(64, layers[0], 2)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.bn2 = nn.BatchNorm2d(512, eps=1e-05)
        self.fc = nn.Linear(512 * 7 * 7, num_features)
        self.features = nn.BatchNorm1d(num_features, eps=1e-05)

    def _make_layer(self, planes, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
            nn.BatchNorm2d(planes, eps=1e-05))
        layers = [TIBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(TIBasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


def test_iresnet18_golden_at_imported_weights(rng):
    tnet = TIResNet([2, 2, 2, 2])
    # randomize parameters AND running stats so BN folding is exercised
    g = torch.Generator().manual_seed(0)
    sd = tnet.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    tnet.load_state_dict(sd)
    tnet.eval()

    x = rng.random((2, 112, 112, 3)).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    net = build_network(dict(type="IResNet18"))
    params = import_iresnet({k: v.numpy() for k, v in sd.items()
                             if not k.endswith("num_batches_tracked")})
    got = np.asarray(jax.jit(
        lambda p, t: net.apply({"params": p}, t))(params, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_gfpgan_identity_loss_step(tmp_path):
    from image_restoration_tpu.models import build_model
    opt = {
        "name": "t", "model_type": "GFPGANModel", "is_train": True,
        "manual_seed": 0, "num_devices": 1,
        "path": {"experiments_root": str(tmp_path),
                 "models": str(tmp_path), "log": str(tmp_path),
                 "visualization": str(tmp_path),
                 "training_states": str(tmp_path)},
        "network_g": dict(type="GFPGANv1OCR", input_width=32,
                          input_height=32, num_style_feat=16,
                          channel_multiplier=0.25, num_mlp=2,
                          input_is_latent=True, different_w=True,
                          narrow=0.5, sft_half=True, fix_decoder=False),
        "network_d": dict(type="StyleGAN2Discriminator", input_width=32,
                          input_height=32, channel_multiplier=0.25,
                          narrow=0.25),
        "network_identity": dict(type="IResNet18"),
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-3},
            "optim_d": {"type": "Adam", "lr": 2e-3},
            "total_iter": 2,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 0.1},
            "L1_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                        "loss_weight": 0.1},
            "identity_weight": 1.5,
            "r1_reg_weight": 10,
            "net_d_reg_every": 16,
        },
    }
    model = build_model(opt)
    rng = np.random.default_rng(1)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    lq = np.clip(gt + rng.normal(0, 0.1, gt.shape), -1, 1).astype(
        np.float32)
    before = jax.device_get(model.state["params_g"])
    out = model.optimize_parameters(1, {"lq": lq, "gt": gt},
                                    jax.random.PRNGKey(1))
    assert "l_identity" in out and np.isfinite(out["l_identity"])
    after = jax.device_get(model.state["params_g"])
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(np.abs(a - b).sum()),
                     before, after))
    assert diff > 0  # G stepped with the identity loss in the graph
