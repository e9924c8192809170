"""Shared architecture building blocks (flax, NHWC).

TPU-native re-design of Car_Plate-Restoration/basicsr/archs/arch_util.py:
ResidualBlockNoBN (:59-87), pixel-shuffle Upsample (:90-109), flow_warp
(:112-143), resize_flow (:146-181), and the weight-init conventions
(default_init_weights :12-40). The DCNv2Pack equivalent lives in
deform_conv (gather-based bilinear sampling — no im2col CUDA kernel).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pixel_ops import pixel_shuffle

Dtype = Any


def kaiming_scaled(scale: float = 1.0, mode: str = "fan_in"):
    """Kaiming-normal init scaled by `scale` — the reference's
    default_init_weights(scale=0.1) convention for residual blocks."""
    base = jax.nn.initializers.variance_scaling(
        2.0 * scale * scale, mode, "normal")

    def init(key, shape, dtype=jnp.float32):
        # variance_scaling multiplies variance; reference scales the std by
        # `scale` after kaiming_normal → variance factor scale^2.
        return base(key, shape, dtype)

    return init


def conv_kaiming(features: int, kernel_size: int = 3, stride: int = 1,
                 scale: float = 1.0, use_bias: bool = True,
                 name: str | None = None, dtype: Dtype = None,
                 padding: int | None = None) -> nn.Conv:
    """3x3-style conv with torch-Conv2d-compatible geometry and kaiming init."""
    if padding is None:
        padding = kernel_size // 2
    return nn.Conv(
        features, (kernel_size, kernel_size), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias, name=name, dtype=dtype,
        kernel_init=kaiming_scaled(scale))


class ResidualBlockNoBN(nn.Module):
    """Residual block w/o BN: conv-relu-conv + identity, optional res_scale.

    Ref arch_util.py:59-87.
    """
    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv_kaiming(self.num_feat, 3, scale=0.1, name="conv1",
                           dtype=self.dtype)(x)
        out = jax.nn.relu(out)
        out = conv_kaiming(self.num_feat, 3, scale=0.1, name="conv2",
                           dtype=self.dtype)(out)
        return identity + out * self.res_scale


class PixelShuffleUpsample(nn.Module):
    """conv(c → c·s²) + pixel_shuffle stages for 2^n / 3 scales.

    Ref arch_util.py Upsample :90-109.
    """
    scale: int
    num_feat: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # power of 2
            for i in range(int(math.log2(scale))):
                x = conv_kaiming(4 * self.num_feat, 3, name=f"conv_{i}",
                                 dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = conv_kaiming(9 * self.num_feat, 3, name="conv_0",
                             dtype=self.dtype)(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"unsupported upsample scale {scale}")
        return x


def flow_warp(x: jax.Array, flow: jax.Array,
              interp_mode: str = "bilinear",
              padding_mode: str = "zeros") -> jax.Array:
    """Warp an NHWC image by optical flow (N, H, W, 2), torch grid_sample
    align_corners=True semantics. Ref arch_util.py:112-143.

    TPU-native: gather-free bilinear via one-hot matmuls is overkill here;
    we use vectorized gathers on the flattened spatial dim, which XLA lowers
    to efficient dynamic-slices.
    """
    n, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]

    x0 = jnp.floor(vx)
    y0 = jnp.floor(vy)
    wx = vx - x0
    wy = vy - y0

    def gather(yi, xi):
        inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(n, h * w, c)
        idx = yc * w + xc  # (n, h, w)
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, h * w, 1), axis=1).reshape(n, h, w, c)
        if padding_mode == "zeros":
            vals = vals * inside[..., None].astype(vals.dtype)
        # 'border': clamped coords already replicate the edge
        return vals

    if interp_mode == "nearest":
        return gather(jnp.round(vy), jnp.round(vx))
    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
            v10 * (1 - wx) * wy + v11 * wx * wy)


def resize_flow(flow: jax.Array, size_type: str, sizes: Sequence[float],
                interp_mode: str = "bilinear") -> jax.Array:
    """Resize a flow field and rescale its values. Ref arch_util.py:146-181."""
    from ..ops.resize import resize as _resize
    n, h, w, _ = flow.shape
    if size_type == "ratio":
        oh, ow = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == "shape":
        oh, ow = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(f"unknown size_type {size_type}")
    ratio_h, ratio_w = oh / h, ow / w
    out = _resize(flow, (oh, ow), interp_mode)
    return out * jnp.asarray([ratio_w, ratio_h], dtype=flow.dtype)


def make_layer(block_cls: Callable, num_blocks: int, name_prefix: str = "body",
               **kwargs):
    """List of `num_blocks` identical blocks named `{prefix}_{i}` —
    the import-friendly analog of ref make_layer (arch_util.py:43-56)."""
    return [block_cls(name=f"{name_prefix}_{i}", **kwargs)
            for i in range(num_blocks)]
