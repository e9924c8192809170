"""Shared architecture building blocks (flax, NHWC).

TPU-native re-design of Car_Plate-Restoration/basicsr/archs/arch_util.py:
ResidualBlockNoBN (:59-87), pixel-shuffle Upsample (:90-109), flow_warp
(:112-143), resize_flow (:146-181), and the weight-init conventions
(default_init_weights :12-40). The DCNv2Pack equivalent lives in
deform_conv (gather-based bilinear sampling — no im2col CUDA kernel).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

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
              padding_mode: str = "zeros",
              max_flow: Optional[int] = None,
              block: int = 16) -> jax.Array:
    """Warp an NHWC image by optical flow (N, H, W, 2), torch grid_sample
    align_corners=True semantics. Ref arch_util.py:112-143.

    Default: vectorized gathers on the flattened spatial dim. XLA lowers
    those to serial dynamic-slices on TPU (no hardware gather — the r4
    DCN study measured 33× off roofline), so `max_flow=R` selects the
    gather-free windowed path: flow clamps to ±R and the bilinear warp
    becomes two dense per-block contractions (vertical lerp on the MXU,
    horizontal on the VPU) — identical results wherever |flow| ≤ R.
    """
    if max_flow is not None:
        if interp_mode != "bilinear":
            raise NotImplementedError("windowed warp is bilinear-only")
        return _flow_warp_windowed(x, flow, padding_mode, int(max_flow),
                                   int(block))
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


def _flow_warp_windowed(x: jax.Array, flow: jax.Array, padding_mode: str,
                        R: int, bh: int) -> jax.Array:
    """Gather-free bilinear warp for |flow| ≤ R (see flow_warp).

    The single-tap special case of ops/deform_conv._mdc_windowed: tile
    the output into bh² blocks, slice each block's (bh+2R+2)² window
    from a zero-padded map, and factorize the bilinear sample into a
    row-lerp one-hot matmul (MXU, full-C rows) and a column-lerp
    reduce (VPU). lax.map over blocks bounds the intermediate."""
    n, h, w, c = x.shape
    bw = bh
    nbh = -(-h // bh)
    nbw = -(-w // bw)
    wh = bh + 2 * R + 2
    ww = bw + 2 * R + 2
    T = bh * bw
    dt = x.dtype

    border = padding_mode == "border"
    if border:
        # replicate-pad so clamped-to-edge samples read edge values
        xp = jnp.pad(x, ((0, 0), (R, nbh * bh + wh - R - h),
                         (R, nbw * bw + ww - R - w), (0, 0)), mode="edge")
    else:
        xp = jnp.pad(x, ((0, 0), (R, nbh * bh + wh - R - h),
                         (R, nbw * bw + ww - R - w), (0, 0)))
    fp = jnp.pad(flow, ((0, 0), (0, nbh * bh - h), (0, nbw * bw - w),
                        (0, 0)))

    oyl = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).reshape(T)
    oxl = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).reshape(T)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wh), 2)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ww), 2)
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)

    def one_block(b):
        by = b // nbw
        bx = b % nbw
        win = jax.lax.dynamic_slice(xp, (0, by * bh, bx * bw, 0),
                                    (n, wh, ww, c))
        fl = jax.lax.dynamic_slice(fp, (0, by * bh, bx * bw, 0),
                                   (n, bh, bw, 2)).reshape(n, T, 2)
        fl = jnp.clip(fl, -R, R).astype(jnp.float32)
        # window-local sampling positions (grid_sample: x+flow_x etc.)
        sy = oyl[None] + R + fl[..., 1]
        sx = oxl[None] + R + fl[..., 0]
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = (sy - y0)[..., None]
        fx = (sx - x0)[..., None]
        y0 = y0.astype(jnp.int32)[..., None]
        x0 = x0.astype(jnp.int32)[..., None]
        gy0 = by * bh - R  # global row of window row 0
        gx0 = bx * bw - R

        def sel(i0, f, grid, lo, hi):
            if border:  # border mode: edge replication, no zeroing
                v0, v1 = (1 - f), f
            else:
                v0 = jnp.where((i0 >= lo) & (i0 <= hi), 1 - f, 0)
                v1 = jnp.where((i0 + 1 >= lo) & (i0 + 1 <= hi), f, 0)
            return (jnp.where(grid == i0, v0, 0)
                    + jnp.where(grid == i0 + 1, v1, 0)).astype(dt)

        s_y = sel(y0, fy, rows_w, -gy0, h - 1 - gy0)   # (n, T, wh)
        s_x = sel(x0, fx, cols_w, -gx0, w - 1 - gx0)   # (n, T, ww)
        r1 = jnp.einsum("ntr,nrwc->ntwc", s_y, win, precision=prec,
                        preferred_element_type=jnp.float32)
        out = jnp.sum(r1 * s_x[..., None].astype(jnp.float32), axis=2)
        return out.astype(dt).reshape(n, bh, bw, c)

    blocks = jax.lax.map(one_block, jnp.arange(nbh * nbw))
    out = blocks.reshape(nbh, nbw, n, bh, bw, c)
    return jnp.transpose(out, (2, 0, 3, 1, 4, 5)).reshape(
        n, nbh * bh, nbw * bw, c)[:, :h, :w]


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
