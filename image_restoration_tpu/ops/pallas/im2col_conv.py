"""Pallas TPU kernel: 3×3 conv via im2col-in-VMEM (full-K contraction).

Motivation (docs/PERFORMANCE.md RRDB ladder): the widened RRDB stages are
3×3 convs with C_in ∈ {32, 64}; this kernel materializes the im2col
matrix in VMEM (9 shifted slice-copies) and issues ONE matmul of
K = 9·C_in (288 or 576) per row-block, testing the hypothesis that the
stages are contraction-row starved.

MEASURED OUTCOME (r3, scripts/probe_pallas_conv.py — kept as a study
artifact, NOT wired into serving): 24.8 / 11.7 / 4.0 TFLOP/s on the
64→192 / 32→160 / 32→64 stages at 528² — no better than XLA's conv,
and a dot-only variant with inputs already VMEM-resident is equally
slow. The limiter is MXU output-width (N) starvation, which no K-side
re-association can fix; see the "Chip calibration + RRDB kernel study"
section of docs/PERFORMANCE.md for the full measurement table.

Numerics: bf16 inputs/weights, f32 accumulation (preferred_element_type),
bf16 output — the same contraction set as the XLA conv, re-associated.

Layout: x (N, H+2, W+2, Cin) pre-padded by the caller; weight
(3, 3, Cin, Cout) reshaped to (9·Cin, Cout) at call time. Row-blocked
grid: each program computes (bh, W, Cout) from a (bh+2, W+2, Cin) slab.

Reference parity target: basicsr/archs/rrdbnet_arch.py:9-39 dense-block
convs (via ops/rrdb_widened.py regrouping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, col_ref, *, bh: int, w: int, cin: int,
            cout: int):
    # build im2col: (bh*w, 9*cin) from the (1, bh+2, w+2, cin) slab
    for dy in range(3):
        for dx in range(3):
            sl = x_ref[0, dy:dy + bh, dx:dx + w, :].reshape(bh * w, cin)
            col_ref[:, (dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin] = sl
    acc = jnp.dot(col_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(1, bh, w, cout)


@functools.partial(jax.jit,
                   static_argnames=("bh", "interpret", "out_dtype"))
def conv3x3_im2col(x_padded: jax.Array, weight: jax.Array, bh: int = 8,
                   out_dtype=jnp.bfloat16,
                   interpret: bool = False) -> jax.Array:
    """3×3 stride-1 conv over a pre-padded NHWC input, full-K im2col.

    Args:
      x_padded: (N, H+2, W+2, Cin) — 1-pixel pad applied by the caller.
      weight: (3, 3, Cin, Cout).
      bh: output rows per grid step. H must divide by bh.

    Returns (N, H, W, Cout) in out_dtype.
    """
    n, hp, wp, cin = x_padded.shape
    h, w = hp - 2, wp - 2
    cout = weight.shape[-1]
    assert h % bh == 0, f"H={h} must divide by bh={bh}"
    nb = h // bh
    # overlapped row slabs (overlapping windows are not expressible as
    # BlockSpec index maps, which step in whole-block units)
    xb = jnp.stack([jax.lax.dynamic_slice(
        x_padded, (0, i * bh, 0, 0), (n, bh + 2, wp, cin))
        for i in range(nb)], axis=1)  # (N, nb, bh+2, wp, cin)
    xb = xb.reshape(n * nb, bh + 2, wp, cin)
    wmat = weight.reshape(9 * cin, cout)
    kern = functools.partial(_kernel, bh=bh, w=w, cin=cin, cout=cout)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n * nb, bh, w, cout), out_dtype),
        grid=(n * nb,),
        in_specs=[
            pl.BlockSpec((1, bh + 2, wp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bh * w, 9 * cin), x_padded.dtype)],
        interpret=interpret,
    )(xb, wmat)
    return out.reshape(n, h, w, cout)
