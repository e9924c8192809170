"""Fused bias + LeakyReLU × scale.

TPU-native replacement for the reference fused_bias_act CUDA kernel
(Car_Plate-Restoration/basicsr/ops/fused_act/src/fused_bias_act_kernel.cu,
wrapper basicsr/ops/fused_act/fused_act.py:94): computes
``scale * leaky_relu(x + bias)``.

On TPU this is a pure VPU elementwise chain; under jit XLA fuses it into the
epilogue of the producing conv/matmul automatically, so the default path is
plain jnp. The hand-written double-backward of the reference is unnecessary —
`jax.grad` differentiates the closed form. A Pallas kernel variant exists in
`ops/pallas/fused_act_kernel.py` for the explicitly-fused conv epilogue path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fused_leaky_relu(x: jax.Array, bias: jax.Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jax.Array:
    """scale * leaky_relu(x + bias); bias broadcasts over the channel axis.

    Layout: channel-last (NHWC / N...C). Matches reference semantics at
    fused_act.py:81-95 (their layout is NCHW; ours is TPU-native NHWC).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(
        scale, dtype=x.dtype)


def scaled_leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """ScaledLeakyReLU — ref stylegan2_ocr_arch.py:593-606: lrelu(x)*sqrt(2)."""
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(
        math.sqrt(2.0), dtype=x.dtype)
