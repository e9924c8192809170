"""Pallas TPU kernel: int8 3×3 conv with fused requantization epilogue.

One fused pass per layer: 9 shifted int8×int8→int32 MXU matmuls over a
row-block in VMEM, then dequant → bias → PReLU → requantize to int8, all
before leaving VMEM. Exact vs the XLA formulation (integer-identical) and
~2× faster at single-layer granularity on v5e (71 vs 35 TOPS measured —
useful for latency-sensitive single-image serving; for long conv CHAINS
XLA's cross-layer pipelining already reaches ~83% of the int8 roofline,
see bench.py notes).

Layout: x (H+2, W+2, C) int8 pre-padded; weights (3, 3, C, C) int8;
epilogue params per output channel in f32 (Mosaic lacks bf16 compares).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, deq_ref, b_ref, a_ref, so_ref, o_ref, *,
            bh: int, w: int, c: int):
    acc = jnp.zeros((bh * w, c), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
            acc = acc + jnp.dot(xs, w_ref[dy, dx],
                                preferred_element_type=jnp.int32)
    hf = acc.astype(jnp.float32) * deq_ref[0] + b_ref[0]
    hf = jnp.where(hf >= 0, hf, hf * a_ref[0])
    q = jnp.clip(jnp.round(hf * (127.0 / so_ref[0, 0])), -127,
                 127).astype(jnp.int8)
    o_ref[...] = q.reshape(bh, w, c)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def int8_conv3x3_requant(x_padded: jax.Array, weight: jax.Array,
                         deq: jax.Array, bias: jax.Array, alpha: jax.Array,
                         s_out: jax.Array, bh: int = 8,
                         interpret: bool = False) -> jax.Array:
    """Fused int8 conv layer.

    Args:
      x_padded: (H+2, W+2, C) int8 (1-pixel zero pad applied by caller).
      weight: (3, 3, C, C) int8.
      deq/bias/alpha: (C,) f32 dequant scale, bias, PReLU slope.
      s_out: scalar f32 output activation scale.
      bh: rows per grid step (VMEM block height).

    Returns (H, W, C) int8.
    """
    hp, wp, c = x_padded.shape
    h, w = hp - 2, wp - 2
    assert h % bh == 0, f"H={h} must divide by bh={bh}"
    nb = h // bh
    # materialize overlapped row blocks (overlapping windows are not
    # expressible in BlockSpec index maps, which step in block units)
    xb = jnp.stack([jax.lax.dynamic_slice(
        x_padded, (i * bh, 0, 0), (bh + 2, wp, c)) for i in range(nb)])
    kern = functools.partial(_kernel, bh=bh, w=w, c=c)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.int8),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bh + 2, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bh, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xb, weight, deq.reshape(1, c), bias.reshape(1, c),
      alpha.reshape(1, c), s_out.reshape(1, 1))
