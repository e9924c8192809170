"""upfirdn2d — pad → zero-insertion upsample → FIR filter → downsample.

TPU-native replacement for the reference CUDA kernel
(Car_Plate-Restoration/basicsr/ops/upfirdn2d/src/upfirdn2d_kernel.cu and the
native fallback in basicsr/ops/upfirdn2d/upfirdn2d.py:162-192).

Instead of a hand-written gather kernel we express the whole op as ONE
`lax.conv_general_dilated`: zero-insertion upsampling is `lhs_dilation`,
edge padding (including negative crop) is the explicit `padding` config, and
downsampling is the window stride.  XLA lowers this to a single fused conv
that the TPU vectorizes; there is nothing left to hand-schedule.

Semantics notes (matching the reference exactly):
  * the reference inserts `up-1` zeros AFTER every sample (so the dilated
    length is `h*up`), while `lhs_dilation` inserts zeros BETWEEN samples
    (length `(h-1)*up + 1`): we add the missing `up-1` trailing zeros to the
    high-side padding.
  * the reference runs true convolution (it flips the kernel before calling
    `F.conv2d`, which correlates). `lax.conv_general_dilated` also correlates,
    so we flip the kernel here too.

Layout: NHWC (TPU-native). Filters are shared across channels → depthwise
conv with `feature_group_count=C`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_resample_kernel(k) -> jnp.ndarray:
    """Outer-product + normalize a 1D FIR window into a 2D resample kernel.

    Mirrors reference `stylegan2_ocr_arch.py:26-40`.
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jax.Array:
    """Apply upfirdn to an NHWC tensor.

    Args:
      x: (N, H, W, C).
      kernel: (kh, kw) FIR filter, shared across channels.
      up/down: integer resampling factors (applied to both spatial dims).
      pad: (pad0, pad1) leading/trailing padding in the upsampled grid;
        negative values crop.

    Returns:
      (N, (H*up + pad0 + pad1 - kh)//down + 1, ..., C) tensor.
    """
    if x.ndim != 4:
        raise ValueError(f"upfirdn2d expects NHWC, got shape {x.shape}")
    c = x.shape[-1]
    p0, p1 = pad
    k = jnp.flip(jnp.asarray(kernel, dtype=x.dtype), (0, 1))
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(down, down),
        padding=((p0, p1 + up - 1), (p0, p1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn_upsample(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """UpFirDnUpsample — ref stylegan2_ocr_arch.py:43-67."""
    kernel = make_resample_kernel(kernel) * (factor ** 2)
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=factor, down=1,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def upfirdn_downsample(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """UpFirDnDownsample — ref stylegan2_ocr_arch.py:70-93."""
    kernel = make_resample_kernel(kernel)
    p = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=1, down=factor,
                     pad=((p + 1) // 2, p // 2))


def upfirdn_smooth(x: jax.Array, kernel: jax.Array, upsample_factor: int = 1,
                   downsample_factor: int = 1, kernel_size: int = 1) -> jax.Array:
    """UpFirDnSmooth — ref stylegan2_ocr_arch.py:96-131.

    The smoothing FIR applied around strided convs in StyleGAN2; `kernel_size`
    is the kernel size of the adjacent conv.
    """
    kernel = make_resample_kernel(kernel)
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor ** 2)
        p = kernel.shape[0] - upsample_factor - (kernel_size - 1)
        pad = ((p + 1) // 2 + upsample_factor - 1, p // 2 + 1)
    elif downsample_factor > 1:
        p = kernel.shape[0] - downsample_factor + (kernel_size - 1)
        pad = ((p + 1) // 2, p // 2)
    else:
        raise NotImplementedError("need upsample_factor>1 or downsample_factor>1")
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)
