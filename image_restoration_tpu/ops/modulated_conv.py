"""Per-sample modulated convolution (StyleGAN2) — TPU-native formulation.

The reference implements ModulatedConv2d
(Car_Plate-Restoration/basicsr/archs/stylegan2_ocr_arch.py:182-285) by
materializing a per-sample weight `w[n] = W * style[n]` (optionally
demodulated) and running a grouped conv with groups=batch. That reshape-batch-
into-groups trick maps terribly onto the TPU MXU (tiny groups, dynamic
reshapes).

Here we use the exact algebraic rewrite: a per-input-channel scale commutes
into the input, a per-output-channel scale commutes out of the output:

    conv(x, W * s_in * d_out) == d_out ⊙ conv(x ⊙ s_in, W)

so the conv itself is a single large dense conv that XLA tiles onto the MXU;
the modulation/demodulation are fused elementwise epilogues. The demod norm
`d[n,o] = rsqrt(Σ_{hwi} (W*s)² + eps)` collapses to one einsum
(`Σ_hwi W² ⊗ s²`) — also MXU work. This is mathematically identical to the
reference (both paths are linear), verified by golden tests vs PyTorch.

Weight layout: HWIO (kh, kw, Cin, Cout). Activations: NHWC.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

from .upfirdn import upfirdn_smooth
from . import fused_resample
from .fused_resample import conv_up_fir, conv_down_fir

# ---- dynamic-int8 serving mode (GFPGAN PTQ study, docs/PERFORMANCE.md).
# When enabled, every conv routed through this module (EqualConv2d,
# ConvLayer, StyleConv/ToRGB modulated convs — i.e. the whole StyleGAN2/
# GFPGAN family) runs with per-OUT-CHANNEL int8 weights and per-tensor
# DYNAMIC int8 activations: the activation scale is max|x|/127 computed on
# the fly (one VPU reduction per conv — self-calibrating, no calibration
# pass, exact analog of TensorRT's dynamic-range int8). The epilogue
# dequantizes in bf16. Trace-time flag: re-jit after toggling.
_INT8_SERVING = False


@contextmanager
def int8_serving():
    """Enable dynamic-int8 convs inside the with-block's traces."""
    global _INT8_SERVING
    _INT8_SERVING = True
    try:
        yield
    finally:
        _INT8_SERVING = False


def _dyn_quant(t):
    s = jnp.max(jnp.abs(t.astype(jnp.float32))) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s.astype(jnp.float32)


def _quant_weight(w):
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0 + 1e-12  # per out-ch
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_conv(x, w_hwio, stride, padding, lhs_dilation=None,
               out_dtype=None):
    xq, sx = _dyn_quant(x)
    wq, sw = _quant_weight(w_hwio)
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride),
        padding=padding, lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    deq = (sx * sw).astype(jnp.bfloat16)
    return (acc.astype(jnp.bfloat16) * deq).astype(out_dtype or x.dtype)


def fused_valid_conv(xp: jax.Array, wc: jax.Array) -> jax.Array:
    """Inner dense conv for the fused-resample paths: VALID, stride 1,
    honoring the dynamic-int8 serving mode (trace-time dispatch)."""
    if _INT8_SERVING:
        return _int8_conv(xp, wc, 1, ((0, 0), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, wc.astype(xp.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv2d(x: jax.Array, w_hwio: jax.Array, stride: int = 1,
           padding: int = 0) -> jax.Array:
    """Plain NHWC conv (torch Conv2d semantics: correlation, symmetric pad)."""
    if _INT8_SERVING:
        return _int8_conv(x, w_hwio, stride,
                          ((padding, padding), (padding, padding)))
    return jax.lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_transpose2d(x: jax.Array, w_hwio: jax.Array, stride: int = 2) -> jax.Array:
    """torch.conv_transpose2d(stride, padding=0) equivalent.

    Expressed as an input-dilated correlation with the spatially-flipped
    kernel — the form XLA lowers efficiently on TPU. `w_hwio` here is the
    same (kh, kw, Cin, Cout) tensor a forward conv would use.
    """
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    w = jnp.flip(w_hwio, (0, 1)).astype(x.dtype)
    if _INT8_SERVING:
        return _int8_conv(x, w, 1,
                          ((kh - 1, kh - 1), (kw - 1, kw - 1)),
                          lhs_dilation=(stride, stride))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def modulated_conv2d(x: jax.Array, weight: jax.Array, style: jax.Array,
                     demodulate: bool = True, sample_mode: str | None = None,
                     smooth_kernel=(1, 3, 3, 1), eps: float = 1e-8) -> jax.Array:
    """StyleGAN2 modulated conv, ref stylegan2_ocr_arch.py:239-285.

    Args:
      x: (N, H, W, Cin) activations.
      weight: (kh, kw, Cin, Cout) shared weight (already `1/sqrt(fan_in)`-
        scaled by the caller, matching EqualConv semantics).
      style: (N, Cin) per-sample modulation (output of the style MLP).
      demodulate: apply the rsqrt demodulation.
      sample_mode: None | 'upsample' (stride-2 transposed conv + FIR smooth)
        | 'downsample' (FIR smooth + stride-2 conv).
    """
    kh = weight.shape[0]
    w32 = weight.astype(jnp.float32)
    s32 = style.astype(jnp.float32)

    demod = None
    if demodulate:
        w_sq = jnp.einsum("hwio,ni->no", w32 * w32, s32 * s32)
        demod = jax.lax.rsqrt(w_sq + eps)  # (N, Cout)

    xs = x * style[:, None, None, :].astype(x.dtype)
    if sample_mode == "upsample":
        if fused_resample.FUSE_UP:
            # single subpixel conv with the FIR folded into the weights
            # (exact; see ops/fused_resample.py)
            out = conv_up_fir(xs, weight, smooth_kernel,
                              conv_fn=fused_valid_conv)
        else:
            out = conv_transpose2d(xs, weight, stride=2)
            out = upfirdn_smooth(out, smooth_kernel, upsample_factor=2,
                                 kernel_size=kh)
    elif sample_mode == "downsample":
        if fused_resample.FUSE_DOWN:
            out = conv_down_fir(xs, weight, smooth_kernel,
                                conv_fn=fused_valid_conv)
        else:
            xs = upfirdn_smooth(xs, smooth_kernel, downsample_factor=2,
                                kernel_size=kh)
            out = conv2d(xs, weight, stride=2, padding=0)
    else:
        out = conv2d(xs, weight, stride=1, padding=kh // 2)

    if demod is not None:
        out = out * demod[:, None, None, :].astype(out.dtype)
    return out
