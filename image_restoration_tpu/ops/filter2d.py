"""Per-sample 2D filtering + unsharp masking.

Replaces Car_Plate-Restoration/basicsr/utils/img_process_util.py
(`filter2D` :7-31, `usm_sharp`/`USMSharp` :34-83).

`filter2d` applies a DIFFERENT kernel to every image in the batch (the
degradation pipeline draws a random blur kernel per sample). TPU-native
formulation: fold the batch into the channel axis and run one depthwise conv
(`feature_group_count = N*C`) — a single XLA op, no per-sample Python loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def filter2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Correlate each batch image with its own 2D kernel (reflect padding).

    Args:
      x: (N, H, W, C).
      kernel: (N, kh, kw) per-sample kernels, or (kh, kw) shared.

    Matches reference filter2D (img_process_util.py:7-31): F.conv2d semantics
    (correlation, NO kernel flip), reflect pad of k//2.
    """
    n, h, w, c = x.shape
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (n,) + kernel.shape)
    kh, kw = kernel.shape[1], kernel.shape[2]
    pad = kh // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    hp, wp = h + 2 * pad, w + 2 * pad
    # (1, H, W, N*C) with channel index n*C + c
    xr = xp.transpose(1, 2, 0, 3).reshape(1, hp, wp, n * c)
    # (kh, kw, 1, N*C): repeat each sample kernel across its C channels
    wk = jnp.repeat(kernel.transpose(1, 2, 0), c, axis=-1)[:, :, None, :]
    out = jax.lax.conv_general_dilated(
        xr, wk.astype(x.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n * c)
    return out.reshape(h, w, n, c).transpose(2, 0, 1, 3)


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel-compatible 1D kernel (sigma<=0 → auto rule)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def usm_sharp(img: jax.Array, weight: float = 0.5, radius: int = 50,
              threshold: int = 10) -> jax.Array:
    """Unsharp masking, ref img_process_util.py:34-83. img: (N,H,W,C) in [0,1]."""
    if radius % 2 == 0:
        radius += 1
    k1 = gaussian_kernel1d(radius)
    k2 = jnp.asarray(np.outer(k1, k1), dtype=img.dtype)
    blur = filter2d(img, k2)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, k2)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img
