"""int8 PTQ serving for RRDBNet via the widened dense-block form.

Generalizes ops/quantized_inference.py (SRVGG) to the ESRGAN generator —
the TPU analog of serving the reference's RRDBNet through a reduced-
precision TensorRT engine. The widened re-association
(ops/rrdb_widened.py) is the right substrate for int8: every conv has
≥64 output channels AND the requant scales can be folded per-slice.

Scheme (body only; the 6 head/tail convs are ~3% of FLOPs and stay bf16):
  * weights: per-OUTPUT-CHANNEL symmetric int8
  * activations: per-tensor scales from calibration — the RDB input t and
    c1..c4, i.e. 5 scales per RDB, (23 blocks × 3 RDBs × 5) total,
    stacked on the lax.scan block axis
  * folding: stage-s conv output slices feed different consumers — the
    c_j-slice (j>s) is eventually requantized by 127/s_{c_j}, the
    x5-slice is scaled by the 0.2 residual factor. Both are POSITIVE
    per-channel constants, so they fold into the per-channel dequant
    vector (LeakyReLU commutes with positive scales, exactly the SRVGG
    requant-folding trick). The epilogue per stage is then a single
    bf16 multiply-add + LeakyReLU + round.
  * accumulation int32; inter-stage activations int8; the RDB residual
    (x5·0.2 + t) and the block carry stay bf16.

Quality is gated by the caller (bench) with a PSNR-vs-bf16 check on real
image content, as for SRVGG.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from .rrdb_widened import _conv, _lrelu, _widen_rdb

_GC, _NF = 32, 64
# stage output slice widths (gc..., nf) per stage s
_WIDTHS = [[_GC] * 4 + [_NF], [_GC] * 3 + [_NF], [_GC] * 2 + [_NF],
           [_GC, _NF], [_NF]]


def calibrate_rrdb_act_scales(params: Dict, x: jax.Array,
                              num_block: int) -> jax.Array:
    """(num_block, 3, 5) |activation| maxima: [t, c1, c2, c3, c4] per RDB.

    Runs the plain f32 RDB math (jit-friendly; callers device_get)."""
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(t, lp):
        return jax.lax.conv_general_dilated(
            t, lp["kernel"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn) + lp["bias"]

    feat = conv(x, params["conv_first"])
    body = feat
    scales = []
    for bi in range(num_block):
        t0 = body
        t = t0
        for ri, rdb in enumerate(("rdb1", "rdb2", "rdb3")):
            p = params[f"body_{bi}"][rdb]
            feats = [t]
            row = [jnp.max(jnp.abs(t))]
            for ci in range(1, 5):
                c = _lrelu(conv(jnp.concatenate(feats, -1), p[f"conv{ci}"]))
                row.append(jnp.max(jnp.abs(c)))
                feats.append(c)
            x5 = conv(jnp.concatenate(feats, -1), p["conv5"])
            t = x5 * 0.2 + t
            scales.append(jnp.stack(row))
        body = t * 0.2 + t0
    return jnp.stack(scales).reshape(num_block, 3, 5)


def _quant_stage(w, s_in, fold):
    """int8 per-out-channel weights + folded dequant vector.

    fold: per-output-channel positive factors (127/s_c for requantized
    slices, 0.2 for the x5 slice)."""
    w = np.asarray(w, np.float32)
    w_scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
    deq = (s_in / 127.0) * w_scale * fold
    return jnp.asarray(w_q), jnp.asarray(deq, jnp.bfloat16)


def quantize_rrdb_params(params: Dict, act_scales: np.ndarray,
                         num_block: int) -> Dict:
    """Widened+quantized serving params; body stacked for lax.scan."""
    act_scales = np.asarray(act_scales, np.float32)
    q: Dict = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        q[name] = (jnp.asarray(params[name]["kernel"], jnp.bfloat16),
                   jnp.asarray(params[name]["bias"], jnp.bfloat16))

    def fold_vec(s, scales_row):
        """Per-channel fold factors for stage s's output slices."""
        parts = []
        widths = _WIDTHS[s]
        # slices feed c_{s+1}..c_4 then x5
        for j, wdt in enumerate(widths[:-1]):
            target_c = s + 1 + j          # c index this slice feeds
            parts.append(np.full(wdt, 127.0 / scales_row[target_c]))
        parts.append(np.full(widths[-1], 0.2))  # x5 slice: residual scale
        return np.concatenate(parts)

    blocks = []
    for bi in range(num_block):
        blk = {}
        for ri, rdb in enumerate(("rdb1", "rdb2", "rdb3")):
            row = act_scales[bi, ri]      # [s_t, s_c1..s_c4]
            st = _widen_rdb(params[f"body_{bi}"][rdb], _NF, _GC,
                            np.float32)
            sd = {}
            for s in range(5):
                w_q, deq = _quant_stage(st[f"w{s}"], row[s], fold_vec(s, row))
                sd[f"w{s}"], sd[f"deq{s}"] = w_q, deq
            # bias: added once via stage1's epilogue → same per-slice fold
            b = np.asarray(st["b"], np.float32) * fold_vec(0, row)
            sd["b"] = jnp.asarray(b, jnp.bfloat16)
            # input quantization factor 127/s_t for the block input only:
            # c1..c4 are already carried at their 127/s_c scale by the
            # per-slice fold, so only the scalar for t is needed
            sd["rin_t"] = jnp.asarray(127.0 / row[0], jnp.bfloat16)
            blk[rdb] = sd
        blocks.append(blk)
    q["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return q


def _to_int8(t, r):
    return jnp.clip(jnp.round(t.astype(jnp.bfloat16) * r), -127,
                    127).astype(jnp.int8)


def _conv_i8(t, w):
    return jax.lax.conv_general_dilated(
        t, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _sl(t, widths, idx):
    lo = sum(widths[:idx])
    return t[..., lo:lo + widths[idx]]


def _quant_rdb(t, sd):
    """t: bf16 (N,H,W,64) → bf16; the int8 widened dense block."""
    a = _conv_i8(_to_int8(t, sd["rin_t"]), sd["w0"])
    a = a.astype(jnp.bfloat16) * sd["deq0"] + sd["b"]
    # c1 (scaled by 127/s_c1 already — fold carried it)
    c1 = _lrelu(_sl(a, _WIDTHS[0], 0))
    b_ = _conv_i8(_to_int8(c1, jnp.bfloat16(1.0)), sd["w1"])
    b_ = b_.astype(jnp.bfloat16) * sd["deq1"]
    c2 = _lrelu(_sl(a, _WIDTHS[0], 1) + _sl(b_, _WIDTHS[1], 0))
    c_ = _conv_i8(_to_int8(c2, jnp.bfloat16(1.0)), sd["w2"])
    c_ = c_.astype(jnp.bfloat16) * sd["deq2"]
    c3 = _lrelu(_sl(a, _WIDTHS[0], 2) + _sl(b_, _WIDTHS[1], 1)
                + _sl(c_, _WIDTHS[2], 0))
    d_ = _conv_i8(_to_int8(c3, jnp.bfloat16(1.0)), sd["w3"])
    d_ = d_.astype(jnp.bfloat16) * sd["deq3"]
    c4 = _lrelu(_sl(a, _WIDTHS[0], 3) + _sl(b_, _WIDTHS[1], 2)
                + _sl(c_, _WIDTHS[2], 1) + _sl(d_, _WIDTHS[3], 0))
    e_ = _conv_i8(_to_int8(c4, jnp.bfloat16(1.0)), sd["w4"])
    e_ = e_.astype(jnp.bfloat16) * sd["deq4"]
    x5 = (_sl(a, _WIDTHS[0], 4) + _sl(b_, _WIDTHS[1], 3)
          + _sl(c_, _WIDTHS[2], 2) + _sl(d_, _WIDTHS[3], 1) + e_)
    # x5 slices carry the 0.2 fold already
    return x5 + t


def quantized_rrdb_forward(q: Dict, x: jax.Array, num_block: int,
                           scale: int = 4) -> jax.Array:
    """x: (N,H,W,3) float [0,1] → bf16 (N,4H,4W,3). x4 head only."""
    assert scale == 4
    x = x.astype(jnp.bfloat16)
    feat = _conv(x, *q["conv_first"])
    body = feat

    def block_step(t0, blk):
        t = t0
        for rdb in ("rdb1", "rdb2", "rdb3"):
            t = _quant_rdb(t, blk[rdb])
        return t * jnp.bfloat16(0.2) + t0, None

    body, _ = jax.lax.scan(block_step, body, q["blocks"])
    body = _conv(body, *q["conv_body"])
    feat = feat + body

    def up2(t):
        n, h, w, c = t.shape
        t = jnp.broadcast_to(t[:, :, None, :, None, :], (n, h, 2, w, 2, c))
        return t.reshape(n, h * 2, w * 2, c)

    feat = _lrelu(_conv(up2(feat), *q["conv_up1"]))
    feat = _lrelu(_conv(up2(feat), *q["conv_up2"]))
    feat = _lrelu(_conv(feat, *q["conv_hr"]))
    return _conv(feat, *q["conv_last"])
