"""Modulated deformable convolution (DCNv2) — gather-based, TPU-native.

Replaces the reference's 1.7k-line CUDA im2col implementation
(Car_Plate-Restoration/basicsr/ops/dcn/src/deform_conv_cuda_kernel.cu,
wrapper ops/dcn/deform_conv.py:192,340): instead of a hand-written im2col
with learned offsets, we bilinear-gather the K sampling taps (vectorized
gathers XLA lowers to dynamic-slices) and contract the (K·Cin) axis with the
weights in ONE einsum on the MXU. Gradients come from jax.grad — no custom
backward.

TPU layout note: every materialized intermediate keeps the flattened
spatial axis (Ho·Wo, tens of thousands of elements) MINOR. The naive
NHWC·K im2col layout puts K=9 or Cin/groups=8 in the minor tiled dims,
which TPU (8,128)/(16,128) tile padding inflates 14–28× — enough to OOM
HBM on EDVR's (4,180,320) pyramid. With spatial minor, padding is
negligible and deformable groups are handled in ONE batched gather
instead of a per-group Python loop.

Layouts (API unchanged): x (N,H,W,Cin); offset (N,Ho,Wo,2K·G) in torch
channel order — per deformable group, tap t's (y,x) at channels
(2t, 2t+1) — matching DCNv2Pack's conv_offset output
(archs/arch_util.py:204-227); mask (N,Ho,Wo,K·G); weight (kh,kw,Cin,Cout).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def modulated_deform_conv(x: jax.Array, offset: jax.Array,
                          mask: Optional[jax.Array], weight: jax.Array,
                          bias: Optional[jax.Array] = None, stride: int = 1,
                          padding: int = 1, dilation: int = 1,
                          deformable_groups: int = 1) -> jax.Array:
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    g = deformable_groups
    if cin % g:
        raise ValueError(f"cin={cin} not divisible by groups={g}")
    cpg = cin // g
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    L = ho * wo

    # sampling positions, (n, g, k, ho, wo) — spatial minor throughout
    oy = jnp.arange(ho, dtype=x.dtype) * stride - padding
    ox = jnp.arange(wo, dtype=x.dtype) * stride - padding
    ky = jnp.repeat(jnp.arange(kh, dtype=x.dtype) * dilation, kw)  # (K,)
    kx = jnp.tile(jnp.arange(kw, dtype=x.dtype) * dilation, kh)
    base_y = ky[:, None, None] + oy[None, :, None]   # (K, Ho, 1)
    base_x = kx[:, None, None] + ox[None, None, :]   # (K, 1, Wo)

    off = offset.reshape(n, ho, wo, g, k, 2)
    off = jnp.transpose(off, (0, 3, 4, 5, 1, 2))     # (n, g, K, 2, Ho, Wo)
    sy = base_y[None, None] + off[:, :, :, 0]
    sx = base_x[None, None] + off[:, :, :, 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0).reshape(n, g, 1, k, L)
    wx = (sx - x0).reshape(n, g, 1, k, L)

    # feature map with channels split by group, spatial minor
    xt = jnp.transpose(x.reshape(n, h * w, g, cpg), (0, 2, 3, 1))

    def gather(yi, xi):
        inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(n, g, 1, k * L)
        vals = jnp.take_along_axis(xt, idx, axis=3)  # (n, g, cpg, K·L)
        vals = vals.reshape(n, g, cpg, k, L)
        return vals * inside.reshape(n, g, 1, k, L).astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    samples = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
               v10 * wy * (1 - wx) + v11 * wy * wx)  # (n, g, cpg, K, L)
    if mask is not None:
        m = jnp.transpose(mask.reshape(n, ho, wo, g, k), (0, 3, 4, 1, 2))
        samples = samples * m.reshape(n, g, 1, k, L)

    out = jnp.einsum("ngckl,kgco->nlo", samples,
                     weight.reshape(k, g, cpg, cout))
    out = out.reshape(n, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out
