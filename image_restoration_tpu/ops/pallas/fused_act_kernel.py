"""Pallas TPU kernel: fused bias + LeakyReLU × scale epilogue.

The Pallas counterpart of `ops.fused_act.fused_leaky_relu` (reference CUDA
kernel: Car_Plate-Restoration/basicsr/ops/fused_act/src/fused_bias_act_kernel.cu).
Pure VPU elementwise work, tiled over rows of a channel-last 2D view so every
block is a well-aligned (block_m, C) VMEM tile.

Used explicitly on the serving path where we want the epilogue guaranteed
fused with the producing conv's output copy; under normal jit the jnp
formulation fuses equivalently, so this kernel is opt-in.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, b_ref, o_ref, *, negative_slope: float, scale: float):
    x = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, x * negative_slope) * scale


@functools.partial(jax.jit, static_argnames=("negative_slope", "scale",
                                             "block_m", "interpret"))
def fused_bias_lrelu_pallas(x: jax.Array, bias: jax.Array,
                            negative_slope: float = 0.2,
                            scale: float = math.sqrt(2.0),
                            block_m: int = 256,
                            interpret: bool = False) -> jax.Array:
    """x: (..., C) channel-last; bias: (C,). Returns scale*lrelu(x+bias)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    m = math.prod(orig_shape[:-1]) if len(orig_shape) > 1 else 1
    x2 = x.reshape(m, c)
    # pad rows to a block multiple; pallas masks the remainder block itself
    grid = (pl.cdiv(m, block_m),)
    out = pl.pallas_call(
        functools.partial(_kernel, negative_slope=negative_slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, bias.reshape(1, c).astype(x.dtype))
    return out.reshape(orig_shape)
