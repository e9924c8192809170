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
                          deformable_groups: int = 1,
                          max_offset: Optional[int] = None,
                          block: int = 16) -> jax.Array:
    """max_offset=R selects the gather-free windowed path: offsets are
    clamped to ±R and the bilinear sampling becomes two dense matmuls
    over (block+2R+…)² local windows — identical results whenever every
    learned offset is within ±R (the r4 DCN study measured XLA's gather
    at 33× off the conv roofline on TPU; docs/assets/dcn_bench.json).
    None (default) = the exact unbounded gather path."""
    if max_offset is not None:
        return _mdc_windowed(x, offset, mask, weight, bias, stride,
                             padding, dilation, deformable_groups,
                             int(max_offset), block)
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


def _mdc_windowed(x: jax.Array, offset: jax.Array,
                  mask: Optional[jax.Array], weight: jax.Array,
                  bias: Optional[jax.Array], stride: int, padding: int,
                  dilation: int, g: int, R: int, bh: int) -> jax.Array:
    """Gather-free DCNv2: bounded offsets + windowed separable one-hot.

    XLA's arbitrary gather runs ~33× off the conv roofline on TPU
    (123.6 ms vs 3.7 ms at the EDVR L1 shape — dcn_bench.json), because
    the TPU has no hardware gather: every sampled row becomes a serial
    dynamic-slice. With offsets clamped to ±R, every sampling point of
    an output block lies inside a (bh+2R+(kh-1)·dil+2)² input window, so
    bilinear sampling factorizes into two DENSE contractions per block:

      rows:  S_y (T·K, wh) @ window (wh, ww·cpg)   — vertical lerp on
             the MXU (S_y carries (1-wy)/wy at rows y0/y1, zeroed
             outside the map — the exact op's per-corner mask),
      cols:  Σ_w S_x (T·K, ww) · R1 (T·K, ww, cpg)  — horizontal lerp
             on the VPU, with the DCNv2 modulation folded into S_x.

    Blocks are visited with lax.map (one (by,bx) tile per step keeps the
    R1 intermediate ~tens of MB instead of GBs); the tap contraction is
    the same MXU einsum as the exact path. Semantics match the exact op
    whenever |offset| ≤ R — EDVR's trained PCD offsets are a few pixels
    (ref basicsr/ops/dcn CUDA kernel has no bound; the bound is the
    price of the TPU-native form and is asserted in the goldens)."""
    if stride != 1:
        raise NotImplementedError("windowed DCN supports stride=1 only "
                                  "(EDVR/PCD shapes); use the exact path")
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    if cin % g:
        raise ValueError(f"cin={cin} not divisible by groups={g}")
    cpg = cin // g
    ho = h + 2 * padding - dilation * (kh - 1) - 1 + 1
    wo = w + 2 * padding - dilation * (kw - 1) - 1 + 1
    bw = bh
    nbh = -(-ho // bh)
    nbw = -(-wo // bw)
    wh = bh + 2 * R + (kh - 1) * dilation + 2
    ww = bw + 2 * R + (kw - 1) * dilation + 2
    T = bh * bw

    # zero-padded map: padded row index = global row + (padding + R);
    # block (by,bx)'s window then starts at exactly (by·bh, bx·bw)
    top = padding + R
    xp = jnp.pad(x, ((0, 0), (top, nbh * bh + wh - top - h),
                     (top, nbw * bw + ww - top - w), (0, 0)))
    # offset/mask padded to the block grid (garbage rows are sliced off)
    offp = jnp.pad(offset, ((0, 0), (0, nbh * bh - ho),
                            (0, nbw * bw - wo), (0, 0)))
    mp = None if mask is None else jnp.pad(
        mask, ((0, 0), (0, nbh * bh - ho), (0, nbw * bw - wo), (0, 0)))

    # per-tap kernel displacements and the in-window base position of
    # output (oy,ox,tap): local_base = o_local + k·dil + R (the window
    # origin b·bh - padding - R cancels the -padding of the base grid)
    ky = jnp.repeat(jnp.arange(kh) * dilation, kw)  # (K,)
    kx = jnp.tile(jnp.arange(kw) * dilation, kh)
    oyl = jnp.arange(bh)
    oxl = jnp.arange(bw)
    dt = x.dtype
    # (T, K) local base grids
    base_y = (oyl[:, None, None] + jnp.zeros((bw,), jnp.int32)[None, :,
                                                               None]
              + ky[None, None, :] + R).reshape(T, k)
    base_x = (jnp.zeros((bh,), jnp.int32)[:, None, None]
              + oxl[None, :, None] + kx[None, None, :] + R).reshape(T, k)

    wgt = weight.reshape(k, g, cpg, cout)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, wh), 3)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ww), 3)
    # TPU f32 matmuls are bf16-split by default (measured 3.4e-3 rel vs
    # the VPU-sampled exact path); HIGHEST restores f32 exactness. bf16
    # inputs need no override: bf16×bf16→f32 accumulation is exact.
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)

    def one_block(b):
        by = b // nbw
        bx = b % nbw
        win = jax.lax.dynamic_slice(
            xp, (0, by * bh, bx * bw, 0), (n, wh, ww, cin))
        win = win.reshape(n, wh, ww, g, cpg)
        off = jax.lax.dynamic_slice(
            offp, (0, by * bh, bx * bw, 0), (n, bh, bw, 2 * k * g))
        off = off.reshape(n, T, g, k, 2)
        # positions in f32 regardless of dt: bf16's 8-bit mantissa would
        # quantize the bilinear fraction to ~0.25 px at window row ~50
        off = jnp.clip(off, -R, R).astype(jnp.float32)
        # sampling positions, window-local, (n, g, T, K)
        sy = base_y[None, None] + jnp.transpose(off[..., 0], (0, 2, 1, 3))
        sx = base_x[None, None] + jnp.transpose(off[..., 1], (0, 2, 1, 3))
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = (sy - y0).reshape(n, g, T * k, 1)
        fx = (sx - x0).reshape(n, g, T * k, 1)
        y0 = y0.astype(jnp.int32).reshape(n, g, T * k, 1)
        x0 = x0.astype(jnp.int32).reshape(n, g, T * k, 1)
        # map-validity per corner row/col (the exact op's zero padding):
        # window-local r is globally valid iff it indexes a real row
        gy0 = by * bh - padding - R  # global row of window row 0
        gx0 = bx * bw - padding - R
        lo_y, hi_y = -gy0, h - 1 - gy0
        lo_x, hi_x = -gx0, w - 1 - gx0

        def sel(i0, f, grid, lo, hi):
            v0 = jnp.where((i0 >= lo) & (i0 <= hi), (1 - f), 0)
            v1 = jnp.where((i0 + 1 >= lo) & (i0 + 1 <= hi), f, 0)
            return (jnp.where(grid == i0, v0, 0)
                    + jnp.where(grid == i0 + 1, v1, 0)).astype(dt)

        s_y = sel(y0, fy, rows_w, lo_y, hi_y)      # (n, g, T·K, wh)
        s_x = sel(x0, fx, cols_w, lo_x, hi_x)      # (n, g, T·K, ww)
        if mp is not None:
            m = jax.lax.dynamic_slice(
                mp, (0, by * bh, bx * bw, 0), (n, bh, bw, k * g))
            m = jnp.transpose(m.reshape(n, T, g, k), (0, 2, 1, 3))
            s_x = s_x * m.reshape(n, g, T * k, 1)
        # vertical lerp on the MXU
        r1 = jnp.einsum("ngsr,ngrwc->ngswc", s_y,
                        jnp.transpose(win, (0, 3, 1, 2, 4)),
                        precision=prec,
                        preferred_element_type=jnp.float32)
        # horizontal lerp on the VPU
        samples = jnp.sum(r1 * s_x[..., None].astype(jnp.float32),
                          axis=3)                    # (n, g, T·K, cpg)
        samples = samples.astype(dt).reshape(n, g, T, k, cpg)
        out = jnp.einsum("ngtkc,kgco->nto", samples, wgt,
                         precision=prec,
                         preferred_element_type=jnp.float32).astype(dt)
        return out.reshape(n, bh, bw, cout)

    blocks = jax.lax.map(one_block, jnp.arange(nbh * nbw))
    out = blocks.reshape(nbh, nbw, n, bh, bw, cout)
    out = jnp.transpose(out, (2, 0, 3, 1, 4, 5)).reshape(
        n, nbh * bh, nbw * bw, cout)[:, :ho, :wo]
    if bias is not None:
        out = out + bias
    return out
