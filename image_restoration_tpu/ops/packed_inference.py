"""Channel-packed inference fast path for narrow-channel conv nets.

v5e measurement (see bench.py): dense 3×3 convs at C=128 sustain
~171 TFLOP/s (87% of bf16 peak) while C=64 convs cap near ~68 — the 64
output channels fill only half the 128-lane MXU. Packing TWO tiles into the
channel axis with BLOCK-DIAGONAL weights doubles the arithmetic (half of it
multiplying structural zeros) but raises useful throughput ~1.3×:

    conv(x_pair, diag(W, W)) == [conv(x1, W); conv(x2, W)]   (exact)

`pack_srvgg_params` precomputes the packed weights for SRVGGNetCompact;
`packed_srvgg_forward` is the fused serving forward (the bench headline
path). Works for any even tile batch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .pixel_ops import pixel_shuffle


def _block_diag2(w: jax.Array) -> jax.Array:
    """(kh,kw,I,O) → (kh,kw,2I,2O) block-diagonal."""
    kh, kw, i, o = w.shape
    z = jnp.zeros((kh, kw, i, o), w.dtype)
    top = jnp.concatenate([w, z], axis=3)
    bot = jnp.concatenate([z, w], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def pack_srvgg_params(params: Dict, num_conv: int,
                      dtype=jnp.bfloat16) -> Dict:
    """Precompute packed weights from SRVGGNetCompact params."""
    packed = {}
    for i in range(num_conv + 1):
        layer = params[f"body_{i}"]
        packed[f"w_{i}"] = _block_diag2(layer["kernel"].astype(dtype))
        packed[f"b_{i}"] = jnp.tile(layer["bias"].astype(dtype), 2)
        alpha = params[f"prelu_{i}"].astype(dtype)
        packed[f"a_{i}"] = jnp.tile(alpha, 2)
    last = params["conv_last"]
    packed["w_last"] = _block_diag2(last["kernel"].astype(dtype))
    packed["b_last"] = jnp.tile(last["bias"].astype(dtype), 2)
    return packed


def packed_srvgg_forward(packed: Dict, x: jax.Array, num_conv: int,
                         upscale: int = 4) -> jax.Array:
    """x: (N, H, W, 3) with N even → (N, H·s, W·s, 3).

    Matches SRVGGNetCompact.__call__ (archs/srvgg_arch.py) exactly; pairs
    of batch entries ride the channel axis through the conv stack.
    """
    n, h, w, c = x.shape
    assert n % 2 == 0, "packed inference needs an even tile batch"
    dn = ("NHWC", "HWIO", "NHWC")
    half = n // 2
    hp = jnp.concatenate([x[:half], x[half:]], axis=-1).astype(
        packed["w_0"].dtype)

    for i in range(num_conv + 1):
        hp = jax.lax.conv_general_dilated(
            hp, packed[f"w_{i}"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn) + packed[f"b_{i}"]
        hp = jnp.where(hp >= 0, hp, hp * packed[f"a_{i}"])
    hp = jax.lax.conv_general_dilated(
        hp, packed["w_last"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn) + packed["b_last"]

    oc = 3 * upscale ** 2
    out = jnp.concatenate([hp[..., :oc], hp[..., oc:]], axis=0)
    out = pixel_shuffle(out, upscale)
    r = upscale
    base = jnp.broadcast_to(x[:, :, None, :, None, :],
                            (n, h, r, w, r, c)).reshape(n, h * r, w * r, c)
    return out + base.astype(out.dtype)
