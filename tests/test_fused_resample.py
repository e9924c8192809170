"""Exactness of the fused FIR-resample convs (ops/fused_resample.py).

The fused ops must match the two-pass path (conv_transpose + upfirdn /
upfirdn + strided conv) to float precision — that path is itself golden
vs the PyTorch reference (tests/test_ops.py, tests/test_archs.py), so
equivalence here transfers the goldens to the fused forms. The fusion is
a measured perf REJECTION on current XLA/TPU (docs/PERFORMANCE.md) and
defaults off; these tests keep the ops honest for future layouts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_restoration_tpu.ops.modulated_conv import (conv2d,
                                                      conv_transpose2d)
from image_restoration_tpu.ops.upfirdn import upfirdn_smooth
from image_restoration_tpu.ops import fused_resample
from image_restoration_tpu.ops.fused_resample import (conv_up_fir,
                                                      conv_down_fir)

FIR = (1, 3, 3, 1)


@pytest.mark.parametrize("h,w,ci,co", [(16, 16, 8, 12), (17, 23, 4, 4),
                                       (8, 8, 3, 5)])
def test_conv_up_fir_exact(h, w, ci, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    ref = upfirdn_smooth(conv_transpose2d(x, wk, 2),
                         jnp.asarray(FIR, jnp.float32),
                         upsample_factor=2, kernel_size=3)
    got = conv_up_fir(x, wk, FIR)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("h,w,ci,co,k", [(16, 16, 8, 12, 3),
                                         (32, 48, 4, 4, 3),
                                         (16, 16, 8, 12, 1),
                                         (18, 22, 5, 7, 1)])
def test_conv_down_fir_exact(h, w, ci, co, k):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((k, k, ci, co)), jnp.float32)
    sm = upfirdn_smooth(x, jnp.asarray(FIR, jnp.float32),
                        downsample_factor=2, kernel_size=k)
    ref = conv2d(sm, wk, stride=2, padding=0)
    got = conv_down_fir(x, wk, FIR)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_full_net_flag_equivalence():
    """GFPGAN 64² forward identical with fusion on vs off (same params)."""
    from image_restoration_tpu.archs import build_network
    net = build_network(dict(type="GFPGANv1OCR", input_width=64,
                             input_height=64, num_style_feat=256,
                             channel_multiplier=0.5, num_mlp=4,
                             input_is_latent=True, different_w=True,
                             narrow=1, sft_half=True, fix_decoder=False))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)

    def fwd():
        return jax.jit(lambda p, x: net.apply(
            {"params": p}, x, randomize_noise=False))(v["params"], x)

    old_up, old_down = fused_resample.FUSE_UP, fused_resample.FUSE_DOWN
    try:
        fused_resample.FUSE_UP = fused_resample.FUSE_DOWN = False
        y0 = fwd()
        fused_resample.FUSE_UP = fused_resample.FUSE_DOWN = True
        y1 = fwd()
    finally:
        fused_resample.FUSE_UP, fused_resample.FUSE_DOWN = old_up, old_down
    if isinstance(y0, tuple):
        y0, y1 = y0[0], y1[0]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-4)
