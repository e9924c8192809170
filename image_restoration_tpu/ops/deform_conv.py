"""Modulated deformable convolution (DCNv2) — gather-based, TPU-native.

Replaces the reference's 1.7k-line CUDA im2col implementation
(Car_Plate-Restoration/basicsr/ops/dcn/src/deform_conv_cuda_kernel.cu,
wrapper ops/dcn/deform_conv.py:192,340): instead of a hand-written im2col
with learned offsets, we bilinear-gather the K sampling taps (vectorized
gathers XLA lowers to dynamic-slices) and contract the (K·Cin) axis with the
weights in ONE einsum on the MXU. Gradients come from jax.grad — no custom
backward.

Layouts: x (N,H,W,Cin); offset (N,Ho,Wo,2K) in torch channel order
(y0,x0,y1,x1,...) matching DCNv2Pack's conv_offset output
(archs/arch_util.py:204-227); mask (N,Ho,Wo,K); weight (kh,kw,Cin,Cout).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def modulated_deform_conv(x: jax.Array, offset: jax.Array,
                          mask: Optional[jax.Array], weight: jax.Array,
                          bias: Optional[jax.Array] = None, stride: int = 1,
                          padding: int = 1, dilation: int = 1,
                          deformable_groups: int = 1) -> jax.Array:
    if deformable_groups > 1:
        # split channels into G groups, each with its own offsets/mask
        g = deformable_groups
        n, h, w, cin = x.shape
        kh, kw, _, cout = weight.shape
        k = kh * kw
        xs = jnp.split(x, g, axis=-1)
        offs = jnp.split(offset.reshape(*offset.shape[:3], g, 2 * k), g, 3)
        masks = [None] * g if mask is None else \
            jnp.split(mask.reshape(*mask.shape[:3], g, k), g, 3)
        outs = []
        for gi in range(g):
            wg = weight[:, :, gi * (cin // g):(gi + 1) * (cin // g), :]
            mg = None if masks[gi] is None else masks[gi][..., 0, :]
            outs.append(modulated_deform_conv(
                xs[gi], offs[gi][..., 0, :], mg, wg, None, stride, padding,
                dilation, 1))
        out = sum(outs)
        if bias is not None:
            out = out + bias
        return out

    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling positions per output pixel and tap
    oy = jnp.arange(ho, dtype=x.dtype) * stride - padding
    ox = jnp.arange(wo, dtype=x.dtype) * stride - padding
    ky = jnp.arange(kh, dtype=x.dtype) * dilation
    kx = jnp.arange(kw, dtype=x.dtype) * dilation
    base_y = oy[:, None, None] + jnp.repeat(ky, kw)[None, None, :]  # (Ho,1,K)
    base_x = ox[None, :, None] + jnp.tile(kx, kh)[None, None, :]   # (1,Wo,K)

    off = offset.reshape(n, ho, wo, k, 2)
    sy = base_y[None] + off[..., 0]
    sx = base_x[None] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0

    flat = x.reshape(n, h * w, cin)

    def gather(yi, xi):
        inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(n, -1)  # (N, Ho*Wo*K)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(n, ho, wo, k, cin)
        return vals * inside[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    samples = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
               v10 * wy * (1 - wx) + v11 * wy * wx)  # (N,Ho,Wo,K,Cin)
    if mask is not None:
        samples = samples * mask[..., None]

    out = jnp.einsum("nhwkc,kco->nhwo", samples,
                     weight.reshape(k, cin, cout))
    if bias is not None:
        out = out + bias
    return out
