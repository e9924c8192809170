"""SRVGGNetCompact golden vs a torch transcription of the public
Real-ESRGAN srvgg_arch at imported weights (the serving headline model:
realesr-general-x4v3 checkpoints import through this path)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from image_restoration_tpu.archs import build_network  # noqa: E402
from image_restoration_tpu.convert.torch_import import (  # noqa: E402
    import_network)


class TSRVGGNetCompact(nn.Module):
    """Transcription of the public Real-ESRGAN SRVGGNetCompact."""

    def __init__(self, num_in_ch=3, num_out_ch=3, num_feat=64, num_conv=16,
                 upscale=4):
        super().__init__()
        self.upscale = upscale
        self.body = nn.ModuleList()
        self.body.append(nn.Conv2d(num_in_ch, num_feat, 3, 1, 1))
        self.body.append(nn.PReLU(num_parameters=num_feat))
        for _ in range(num_conv):
            self.body.append(nn.Conv2d(num_feat, num_feat, 3, 1, 1))
            self.body.append(nn.PReLU(num_parameters=num_feat))
        self.body.append(
            nn.Conv2d(num_feat, num_out_ch * upscale ** 2, 3, 1, 1))
        self.upsampler = nn.PixelShuffle(upscale)

    def forward(self, x):
        out = x
        for m in self.body:
            out = m(out)
        out = self.upsampler(out)
        base = F.interpolate(x, scale_factor=self.upscale, mode="nearest")
        return out + base


def test_srvgg_golden_at_imported_weights(rng):
    torch.manual_seed(0)
    tnet = TSRVGGNetCompact(num_feat=16, num_conv=4, upscale=4).eval()
    with torch.no_grad():  # randomize PReLU alphas off the 0.25 default
        for m in tnet.body:
            if isinstance(m, nn.PReLU):
                m.weight.copy_(torch.rand_like(m.weight) * 0.5)

    x = rng.random((2, 12, 12, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    jnet = build_network(dict(type="SRVGGNetCompact", num_feat=16,
                              num_conv=4, upscale=4))
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = import_network("SRVGGNetCompact", jnet, variables, sd)["params"]
    got = np.asarray(jax.jit(jnet.apply)({"params": params},
                                         jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)
