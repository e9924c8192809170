"""Architecture golden for the FID InceptionV3 backbone at RANDOM weights.

The trained pt_inception file is unobtainable here (zero egress; the
weights-gated golden in test_weights_gated_golden.py covers it when
provided), but the ARCHITECTURE can be validated without it: build the
reference FID net (basicsr/archs/inception.py:17-307 — its FIDInception*
forward patches and the InceptionV3 block wrapper run verbatim, on top of
the plain-torch torchvision block stub in tv_inception_stub.py), randomize
every parameter and BatchNorm buffer, and import that state_dict into our
flax net through the real `load_patched_inception_v3` path. This pins the
block wiring, conv paddings, BN eps, the FID pooling patches
(count_include_pad=False avg pools; Mixed_7c's max pool), the bilinear
input resize, and the final average pool.
"""

import numpy as np
import pytest
import torch

from ref_loader import install_stubs, load_ref_arch


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if name.endswith("bn.weight"):
                p.uniform_(0.5, 1.5, generator=g)
            elif "conv.weight" in name:
                fan_in = p.shape[1] * p.shape[2] * p.shape[3]
                p.normal_(0, fan_in ** -0.5, generator=g)
            else:
                p.normal_(0, 0.2, generator=g)
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.uniform_(0.5, 2.0, generator=g)
            elif name.endswith("running_mean"):
                b.normal_(0, 0.3, generator=g)


def test_inception_fid_arch_golden_random_weights(tmp_path, rng):
    install_stubs()
    ref_mod = load_ref_arch("inception")

    # fid_inception_v3 minus its weight download (inception.py:164-186):
    # same torchvision base, same FIDInception* replacements.
    import tv_inception_stub as tvi
    donor = tvi.inception_v3(num_classes=1008, aux_logits=False,
                             pretrained=False)
    donor.Mixed_5b = ref_mod.FIDInceptionA(192, pool_features=32)
    donor.Mixed_5c = ref_mod.FIDInceptionA(256, pool_features=64)
    donor.Mixed_5d = ref_mod.FIDInceptionA(288, pool_features=64)
    donor.Mixed_6b = ref_mod.FIDInceptionC(768, channels_7x7=128)
    donor.Mixed_6c = ref_mod.FIDInceptionC(768, channels_7x7=160)
    donor.Mixed_6d = ref_mod.FIDInceptionC(768, channels_7x7=160)
    donor.Mixed_6e = ref_mod.FIDInceptionC(768, channels_7x7=192)
    donor.Mixed_7b = ref_mod.FIDInceptionE_1(1280)
    donor.Mixed_7c = ref_mod.FIDInceptionE_2(2048)
    _randomize(donor)
    sd = donor.state_dict()

    ref_mod.load_url = lambda *a, **k: sd  # feed the randomized weights
    ref = ref_mod.InceptionV3(output_blocks=[3], resize_input=True,
                              normalize_input=True,
                              use_fid_inception=True).eval()

    x = rng.uniform(size=(2, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        ref_feat = ref(torch.from_numpy(x))[0][:, :, 0, 0].numpy()
    assert ref_feat.shape == (2, 2048) and np.isfinite(ref_feat).all()
    assert float(np.abs(ref_feat).mean()) > 1e-3  # didn't collapse

    pth = tmp_path / "fid_random.pth"
    torch.save(sd, str(pth))
    from image_restoration_tpu.metrics.fid import load_patched_inception_v3
    extract = load_patched_inception_v3(str(pth))
    ours = np.asarray(extract(np.transpose(x, (0, 2, 3, 1))))

    span = float(np.abs(ref_feat).max())
    np.testing.assert_allclose(ours, ref_feat, atol=2e-3 * span, rtol=0)
