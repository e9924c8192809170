"""Widened (concat-absorbed) RRDB serving path.

The RRDBNet dense block (ref basicsr/archs/rrdbnet_arch.py:9-39) computes

    c_k = lrelu(conv_k(cat(x, c_1, ..., c_{k-1})))      k = 1..4
    x5  = conv_5(cat(x, c_1, ..., c_4))

Its five convs have output width 32 (conv5: 64) — the v5e MXU runs
C_out=32 3×3 convs at ~3-8 TFLOP/s (docs/PERFORMANCE.md channel-width
wall) because only a quarter of the 128 output lanes are live.

Re-association: a conv over a concat is the SUM of convs over the parts,
so every contribution from an already-known tensor can be batched into one
wide conv. Group the dense block's 15 weight slices by INPUT instead of by
output:

    stage1: x  → [pre1|pre2|pre3|pre4|pre5]   64→192   (all x-parts)
    stage2: c1 → [q2|q3|q4|q5]                32→160
    stage3: c2 → [q3|q4|q5]                   32→128
    stage4: c3 → [q4|q5]                      32→96
    stage5: c4 → [q5]                         32→64

    c_k = lrelu(sum of the k-th slices);  x5 = sum of the 5th slices.

FLOP count is IDENTICAL (26 624 channel-products per spatial position
either way — it is literally the same multiply set re-ordered), but every
conv now has ≥64 output channels and the five concats (which materialize
96/128/160/192-channel tensors in HBM) disappear. Numerics: bf16 sums are
re-associated, so results match the plain forward to bf16 rounding (exact
in f32 — unit-tested both ways).

`widen_rrdbnet_params` repacks standard RRDBNet params (23 identical
blocks stacked for lax.scan — 15 convs in the XLA program, not 345);
`widened_rrdbnet_forward` is the serving forward. Optional g-way
block-diagonal tile packing composes on top (pack g tiles on the channel
axis; weights become block-diagonal like ops/packed_inference.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .packed_inference import _block_diag, pack_batch, unpack_batch

_STAGE_OUT = (192, 160, 128, 96, 64)  # nf=64, gc=32


def _widen_rdb(rdb: Dict, nf: int, gc: int, dtype) -> Dict:
    """One RDB's 5 convs → 5 input-grouped stage weights."""
    ws = [rdb[f"conv{i}"]["kernel"].astype(dtype) for i in range(1, 6)]
    bs = [rdb[f"conv{i}"]["bias"].astype(dtype) for i in range(1, 6)]
    # stage s consumes input slice [x, c1..c4][s] of each later conv
    stages = {}
    # input channel ranges within conv_k's input concat:
    #   conv_k sees [x (nf), c1 (gc), ..., c_{k-1} (gc)]
    for s in range(5):          # s=0: x; s=1..4: c_s
        lo = nf + (s - 1) * gc if s > 0 else 0
        hi = lo + (gc if s > 0 else nf)
        # conv_{k+1} consumes input s iff k+1 > s, i.e. k = s..4
        stages[f"w{s}"] = jnp.concatenate(
            [ws[k][:, :, lo:hi, :] for k in range(s, 5)], axis=-1)
    # biases are added once: fold all five into stage1's output slices
    stages["b"] = jnp.concatenate(bs, axis=-1)  # (192,)
    return stages


def widen_rrdbnet_params(params: Dict, num_block: int, g: int = 1,
                         nf: int = 64, gc: int = 32,
                         dtype=jnp.bfloat16) -> Dict:
    """RRDBNet params → widened serving params (+ optional g-way packing).

    Head/tail convs are packed block-diagonally when g>1; the 23 body
    blocks are stacked on a leading axis for lax.scan.
    """
    out = {}

    def bd(layer):
        w = layer["kernel"].astype(dtype)
        b = layer["bias"].astype(dtype)
        if g > 1:
            w, b = _block_diag(w, g), jnp.tile(b, g)
        return w, b

    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        out[name] = bd(params[name])

    def widen_block(bi):
        block = {}
        for rdb in ("rdb1", "rdb2", "rdb3"):
            st = _widen_rdb(params[f"body_{bi}"][rdb], nf, gc, dtype)
            if g > 1:
                st = {k: (_block_diag(v, g) if k != "b" else
                          jnp.tile(v, g)) for k, v in st.items()}
            block[rdb] = st
        return block

    blocks = [widen_block(bi) for bi in range(num_block)]
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return out


def _conv(t, w, b=None):
    y = jax.lax.conv_general_dilated(
        t, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def _lrelu(t):
    return jnp.where(t >= 0, t, 0.2 * t)


def _slice_g(t, stage_widths, g, idx):
    """Slice packed stage output: per-group layout [s_idx..s_4] × g."""
    per = sum(stage_widths)
    lo = sum(stage_widths[:idx])
    w = stage_widths[idx]
    if g == 1:
        return t[..., lo:lo + w]
    return jnp.concatenate(
        [t[..., k * per + lo:k * per + lo + w] for k in range(g)], axis=-1)


def _widened_rdb_forward(x, st, nf, gc, g):
    """x: (N,H,W,g·nf) → same; the re-associated dense block."""
    # stage outputs hold slices for [c_{s+1}..c4, x5]
    widths = [
        [gc, gc, gc, gc, nf],   # stage1 (from x):   pre1..pre4, pre5
        [gc, gc, gc, nf],       # stage2 (from c1):  q2..q4, q5
        [gc, gc, nf],           # stage3 (from c2)
        [gc, nf],               # stage4 (from c3)
        [nf],                   # stage5 (from c4)
    ]
    a = _conv(x, st["w0"], st["b"])  # b pre-tiled for g>1 at pack time
    acc1 = _slice_g(a, widths[0], g, 0)
    c1 = _lrelu(acc1)
    b_ = _conv(c1, st["w1"])
    c2 = _lrelu(_slice_g(a, widths[0], g, 1) + _slice_g(b_, widths[1], g, 0))
    c_ = _conv(c2, st["w2"])
    c3 = _lrelu(_slice_g(a, widths[0], g, 2) + _slice_g(b_, widths[1], g, 1)
                + _slice_g(c_, widths[2], g, 0))
    d_ = _conv(c3, st["w3"])
    c4 = _lrelu(_slice_g(a, widths[0], g, 3) + _slice_g(b_, widths[1], g, 2)
                + _slice_g(c_, widths[2], g, 1)
                + _slice_g(d_, widths[3], g, 0))
    e_ = _conv(c4, st["w4"])
    x5 = (_slice_g(a, widths[0], g, 4) + _slice_g(b_, widths[1], g, 3)
          + _slice_g(c_, widths[2], g, 2) + _slice_g(d_, widths[3], g, 1)
          + e_)
    return x5 * 0.2 + x


def widened_rrdbnet_forward(wp: Dict, x: jax.Array, num_block: int,
                            scale: int = 4, g: int = 1, nf: int = 64,
                            gc: int = 32) -> jax.Array:
    """Exact RRDBNet x4 forward on the widened weights.

    x: (N,H,W,3), N divisible by g — g/nf/gc are STATIC ints and must
    match widen_rrdbnet_params (kept out of the params pytree so jit does
    not trace them). Matches archs/rrdbnet_arch.py to floating-point
    re-association (f32: exact; bf16: rounding-level).
    """
    assert scale == 4, "widened RRDBNet implements the x4 head"
    n = x.shape[0]
    assert n % g == 0, f"batch {n} must divide by pack factor {g}"
    dt = wp["conv_first"][0].dtype

    hp = (pack_batch(x, g) if g > 1 else x).astype(dt)
    feat = _conv(hp, *wp["conv_first"])
    body = feat

    def block_step(t0, blk):
        t = t0
        for rdb in ("rdb1", "rdb2", "rdb3"):
            t = _widened_rdb_forward(t, blk[rdb], nf, gc, g)
        return t * 0.2 + t0, None

    body, _ = jax.lax.scan(block_step, body, wp["blocks"])
    body = _conv(body, *wp["conv_body"])
    feat = feat + body

    def up2(t):
        nn_, hh, ww, cc = t.shape
        t = jnp.broadcast_to(t[:, :, None, :, None, :],
                             (nn_, hh, 2, ww, 2, cc))
        return t.reshape(nn_, hh * 2, ww * 2, cc)

    feat = _lrelu(_conv(up2(feat), *wp["conv_up1"]))
    feat = _lrelu(_conv(up2(feat), *wp["conv_up2"]))
    feat = _lrelu(_conv(feat, *wp["conv_hr"]))
    out = _conv(feat, *wp["conv_last"])
    return unpack_batch(out, g, 3) if g > 1 else out
