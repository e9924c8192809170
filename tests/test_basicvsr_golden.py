"""BasicVSR / IconVSR full-net golden vs the reference torch modules at
imported weights (recurrent propagation + SpyNet flow + flow_warp; IconVSR
additionally exercises the DCN-based EDVRFeatureExtractor keyframe path
through the pure-torch DCNv2 in ref_loader)."""

import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ref_loader import install_stubs, load_ref_arch
from image_restoration_tpu.archs import build_network
from image_restoration_tpu.convert.torch_import import import_network

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not osp.exists("/root/reference/Car_Plate-Restoration"),
    reason="reference not mounted")]


def _golden(arch_name, jkw, tkw, t=4, size=64, tol=5e-4):
    import torch
    install_stubs()
    ref = load_ref_arch("basicvsr_arch")
    torch.manual_seed(0)
    tnet = getattr(ref, arch_name)(**tkw).eval()
    with torch.no_grad():  # randomize zero-init offset convs (IconVSR)
        for name, p in tnet.named_parameters():
            if "conv_offset" in name:
                p.copy_(torch.randn_like(p) * 0.05)
    rng = np.random.default_rng(0)
    x = rng.random((1, t, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()

    jnet = build_network(dict(type=arch_name, **jkw))
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = import_network(arch_name, jnet, variables, sd)["params"]
    got = np.asarray(jax.jit(jnet.apply)({"params": params},
                                         jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 1, 4, 2, 3), want,
                               rtol=tol, atol=tol)


def test_basicvsr_golden():
    _golden("BasicVSR", dict(num_feat=16, num_block=1),
            dict(num_feat=16, num_block=1))


def test_iconvsr_golden():
    # num_feat must be 64: the reference EDVRFeatureExtractor hardcodes
    # make_layer(ResidualBlockNoBN, 5, num_feat=64) (basicvsr_arch.py:259)
    _golden("IconVSR",
            dict(num_feat=64, num_block=1, keyframe_stride=2,
                 temporal_padding=2),
            dict(num_feat=64, num_block=1, keyframe_stride=2,
                 temporal_padding=2), t=6, size=64, tol=1e-3)
