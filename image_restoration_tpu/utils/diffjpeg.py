"""Differentiable JPEG — TPU-native port of basicsr/utils/diffjpeg.py.

The whole codec is batched matmuls/einsums (8×8 DCT bases contract on the
MXU) + elementwise quantization, so it runs inside the jitted degradation
step with per-sample quality factors — replacing the reference's cv2
imencode round-trip that ran in dataloader worker processes.

Matches the reference numerically (same quant tables, 2×2 mean chroma
subsampling, nearest chroma upsampling, diff_round(x)=round(x)+(x-round)³).
Input NHWC RGB [0,1]; output same, clipped.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp

Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float32).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]],
                           dtype=np.float32).T

_DCT = np.zeros((8, 8, 8, 8), dtype=np.float32)
for _x, _y, _u, _v in itertools.product(range(8), repeat=4):
    _DCT[_x, _y, _u, _v] = (np.cos((2 * _x + 1) * _u * np.pi / 16) *
                            np.cos((2 * _y + 1) * _v * np.pi / 16))
_ALPHA = np.array([1.0 / np.sqrt(2)] + [1] * 7, dtype=np.float32)
_DCT_SCALE = np.outer(_ALPHA, _ALPHA) * 0.25

_RGB2YCBCR = np.array([[0.299, 0.587, 0.114],
                       [-0.168736, -0.331264, 0.5],
                       [0.5, -0.418688, -0.081312]], dtype=np.float32).T
_YCBCR2RGB = np.array([[1.0, 0.0, 1.402],
                       [1.0, -0.344136, -0.714136],
                       [1.0, 1.772, 0.0]], dtype=np.float32).T


def diff_round(x):
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality):
    """Scalar/array quality ∈ (0,100] → quant-table factor."""
    q = jnp.asarray(quality, jnp.float32)
    return jnp.where(q < 50, 5000.0 / q, 200.0 - q * 2.0) / 100.0


def _to_blocks(x):
    """(N, H, W) → (N, H/8·W/8, 8, 8)"""
    n, h, w = x.shape
    x = x.reshape(n, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, -1, 8, 8)


def _from_blocks(x, h, w):
    n = x.shape[0]
    x = x.reshape(n, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, h, w)


def _dct(blocks):
    t = jnp.asarray(_DCT, blocks.dtype)
    return jnp.asarray(_DCT_SCALE, blocks.dtype) * jnp.einsum(
        "nbxy,xyuv->nbuv", blocks - 128.0, t)


def _idct(blocks):
    # _DCT[x,y,u,v] couples spatial (x,y) to frequency (u,v); the inverse
    # contracts the frequency axes.
    t = jnp.asarray(_DCT, blocks.dtype)
    a = jnp.asarray(np.outer(_ALPHA, _ALPHA), blocks.dtype)
    return 0.25 * jnp.einsum("nbuv,xyuv->nbxy", blocks * a, t) + 128.0


def diff_jpeg(x: jax.Array, quality, differentiable: bool = True) -> jax.Array:
    """JPEG round-trip. x: (N,H,W,3) RGB [0,1]; quality: scalar or (N,)."""
    rounding = diff_round if differentiable else jnp.round
    n, h, w, _ = x.shape
    h_pad = (16 - h % 16) % 16
    w_pad = (16 - w % 16) % 16
    x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    factor = quality_to_factor(quality)
    factor = jnp.broadcast_to(jnp.atleast_1d(factor), (n,))
    f = factor[:, None, None, None]

    # compress
    img255 = x * 255.0
    ycbcr = img255 @ jnp.asarray(_RGB2YCBCR, x.dtype) + jnp.asarray(
        [0.0, 128.0, 128.0], x.dtype)
    y = ycbcr[..., 0]
    cb = ycbcr[..., 1].reshape(n, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))
    cr = ycbcr[..., 2].reshape(n, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))

    y_tab = jnp.asarray(Y_TABLE, x.dtype)
    c_tab = jnp.asarray(C_TABLE, x.dtype)
    yq = rounding(_dct(_to_blocks(y)) / (y_tab * f))
    cbq = rounding(_dct(_to_blocks(cb)) / (c_tab * f))
    crq = rounding(_dct(_to_blocks(cr)) / (c_tab * f))

    # decompress
    y2 = _from_blocks(_idct(yq * (y_tab * f)), hp, wp)
    cb2 = _from_blocks(_idct(cbq * (c_tab * f)), hp // 2, wp // 2)
    cr2 = _from_blocks(_idct(crq * (c_tab * f)), hp // 2, wp // 2)
    # nearest ×2 chroma upsampling
    cb2 = jnp.repeat(jnp.repeat(cb2, 2, axis=1), 2, axis=2)
    cr2 = jnp.repeat(jnp.repeat(cr2, 2, axis=1), 2, axis=2)

    ycbcr2 = jnp.stack([y2, cb2, cr2], axis=-1) + jnp.asarray(
        [0.0, -128.0, -128.0], x.dtype)
    rgb = ycbcr2 @ jnp.asarray(_YCBCR2RGB, x.dtype)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]
