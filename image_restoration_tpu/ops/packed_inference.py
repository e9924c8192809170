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


def _block_diag(w: jax.Array, g: int) -> jax.Array:
    """(kh,kw,I,O) → (kh,kw,gI,gO) block-diagonal with g copies."""
    kh, kw, i, o = w.shape
    out = jnp.zeros((kh, kw, g * i, g * o), w.dtype)
    for k in range(g):
        out = out.at[:, :, k * i:(k + 1) * i, k * o:(k + 1) * o].set(w)
    return out


def _block_diag2(w: jax.Array) -> jax.Array:
    return _block_diag(w, 2)


def pack_batch(x: jax.Array, g: int) -> jax.Array:
    """(N,H,W,C) → (N/g,H,W,gC): ride g batch entries on the channel axis."""
    n = x.shape[0]
    return jnp.concatenate([x[i * n // g:(i + 1) * n // g]
                            for i in range(g)], axis=-1)


def unpack_batch(x: jax.Array, g: int, c: int) -> jax.Array:
    return jnp.concatenate([x[..., i * c:(i + 1) * c] for i in range(g)],
                           axis=0)


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
    # nearest-upsample base added PRE-shuffle (exact: channel c0*r²+(a,b)
    # lands at subpixel (a,b) channel c0) — see quantized_inference.py.
    out = out + jnp.repeat(x, upscale * upscale, axis=-1).astype(out.dtype)
    return pixel_shuffle(out, upscale)


# ------------------------------------------------------------- RRDBNet


def pack_rrdbnet_params(params: Dict, num_block: int, g: int = 4,
                        dtype=jnp.bfloat16) -> Dict:
    """Pack RRDBNet (ESRGAN) weights g-way.

    RRDB growth convs output only 32 channels — ~8 TFLOP/s under XLA on
    v5e; g=4 packing gives them 128 output channels.
    """
    packed = {}

    def bd(layer_params):
        return (_block_diag(layer_params["kernel"].astype(dtype), g),
                jnp.tile(layer_params["bias"].astype(dtype), g))

    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        packed[name] = bd(params[name])
    # the 23 body blocks are structurally identical: stack each of the 15
    # per-block conv weights on a leading axis so the forward can lax.scan
    # over blocks — the graph holds 15 convs instead of 345 (23x smaller
    # XLA program; compile time and program size stop scaling with depth)
    for rdb in ("rdb1", "rdb2", "rdb3"):
        for ci in range(1, 6):
            ws, bs = zip(*(bd(params[f"body_{bi}"][rdb][f"conv{ci}"])
                           for bi in range(num_block)))
            packed[f"blocks.{rdb}.conv{ci}"] = (jnp.stack(ws), jnp.stack(bs))
    return packed


def packed_rrdbnet_forward(packed: Dict, x: jax.Array, num_block: int,
                           scale: int = 4, g: int = 4) -> jax.Array:
    """Exact RRDBNet forward (archs/rrdbnet_arch.py) with g-packed tiles.

    Only the ×4 head is implemented (the ×1/×2 pixel_unshuffle input path
    uses the plain forward). `g` must match pack_rrdbnet_params and is a
    STATIC python int (not stored in the params pytree).
    """
    assert scale == 4, "packed RRDBNet supports the x4 head"
    n, h, w, c = x.shape
    assert n % g == 0, f"batch {n} must divide by pack factor {g}"
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(t, name):
        wgt, b = packed[name]
        return jax.lax.conv_general_dilated(
            t, wgt, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b

    def lrelu(t):
        return jnp.where(t >= 0, t, 0.2 * t)

    hp = pack_batch(x, g).astype(packed["conv_first"][0].dtype)
    feat = conv(hp, "conv_first")
    body = feat
    nf = feat.shape[-1] // g  # 64

    def cat(parts):
        # concat per packed group so block-diag weights line up
        chunks = []
        for k in range(g):
            for p, pc in parts:
                chunks.append(p[..., k * pc:(k + 1) * pc])
        return jnp.concatenate(chunks, axis=-1)

    def conv_w(t, wb):
        wgt, b = wb
        return jax.lax.conv_general_dilated(
            t, wgt, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b

    stacked = {k: packed[k] for k in packed if k.startswith("blocks.")}

    def block_step(t0, bp):
        t = t0
        for rdb in ("rdb1", "rdb2", "rdb3"):
            feats = [(t, nf)]
            for ci in range(1, 5):
                xcat = cat(feats) if len(feats) > 1 else t
                y = lrelu(conv_w(xcat, bp[f"blocks.{rdb}.conv{ci}"]))
                feats.append((y, y.shape[-1] // g))
            y5 = conv_w(cat(feats), bp[f"blocks.{rdb}.conv5"])
            t = y5 * 0.2 + t
        return t * 0.2 + t0, None

    body, _ = jax.lax.scan(block_step, body, stacked)
    body = conv(body, "conv_body")
    feat = feat + body

    def up2(t):
        nn_, hh, ww, cc = t.shape
        t = jnp.broadcast_to(t[:, :, None, :, None, :],
                             (nn_, hh, 2, ww, 2, cc))
        return t.reshape(nn_, hh * 2, ww * 2, cc)

    feat = lrelu(conv(up2(feat), "conv_up1"))
    feat = lrelu(conv(up2(feat), "conv_up2"))
    feat = lrelu(conv(feat, "conv_hr"))
    out = conv(feat, "conv_last")
    return unpack_batch(out, g, 3)
