"""int8 post-training-quantized serving path (SRVGG).

The reference serves through TensorRT with reduced precision
(Plate_Detect/docs/TRT.md: fp16 engines; TRT int8 is the standard
production step). The TPU analog: v5e's int8 MXU path measures ~283 TOPS
vs ~171 TFLOP/s bf16 on this chip. This module implements calibrated
symmetric PTQ for SRVGGNetCompact, composed with the block-diagonal channel
packing (ops/packed_inference.py):

  * weights: per-OUTPUT-CHANNEL symmetric int8 scales
  * activations: per-LAYER symmetric scales from a calibration batch
  * accumulation in int32; requantization fused into the PReLU epilogue
    (one f32 VPU pass per layer)

Quality: PSNR(int8, bf16) is reported by the bench; typical PTQ cost for
compact SR nets is a few tenths of a dB.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from .pixel_ops import pixel_shuffle
from .packed_inference import _block_diag


def calibrate_srvgg_act_scales(params: Dict, x: jax.Array,
                               num_conv: int) -> List[float]:
    """Per-layer |activation| maxima from a calibration batch (plain fp32
    forward, host side). Returns num_conv+3 scales: one per conv input,
    plus the |conv_last output| max (the residual-output scale used to
    serve conv_last with an int8 sink — see quantized_srvgg_forward)."""
    dn = ("NHWC", "HWIO", "NHWC")
    scales = []
    h = x
    for i in range(num_conv + 1):
        scales.append(jnp.max(jnp.abs(h)))
        layer = params[f"body_{i}"]
        h = jax.lax.conv_general_dilated(
            h, layer["kernel"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn) + layer["bias"]
        alpha = params[f"prelu_{i}"]
        h = jnp.where(h >= 0, h, h * alpha)
    scales.append(jnp.max(jnp.abs(h)))
    out = jax.lax.conv_general_dilated(
        h, params["conv_last"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn) + params["conv_last"]["bias"]
    scales.append(jnp.max(jnp.abs(out)))
    return jnp.stack(scales)  # jit-friendly; callers floatify


def quantize_srvgg_params(params: Dict, act_scales: List[float],
                          num_conv: int, pack: int = 2) -> Dict:
    """int8 weights (per-out-channel) + f32 requant vectors, packed
    `pack`-way block-diagonally."""
    q: Dict = {}

    def quant_layer(kernel, bias, s_in, idx_name):
        w = np.asarray(kernel, np.float32)
        w_scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0 + 1e-12  # per out-ch
        w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        wq = _block_diag(jnp.asarray(w_q), pack)
        # dequant factor: acc_int32 * (s_in/127 * w_scale) + bias
        deq = (s_in / 127.0) * w_scale
        q[f"w_{idx_name}"] = wq
        # epilogue math in bf16: quantization noise dominates bf16 rounding,
        # and the f32 epilogue was ~20% of the layer time on v5e
        q[f"deq_{idx_name}"] = jnp.tile(jnp.asarray(deq, jnp.bfloat16), pack)
        q[f"b_{idx_name}"] = jnp.tile(
            jnp.asarray(np.asarray(bias, np.float32), jnp.bfloat16), pack)

    for i in range(num_conv + 1):
        layer = params[f"body_{i}"]
        quant_layer(layer["kernel"], layer["bias"], act_scales[i], str(i))
        q[f"a_{i}"] = jnp.tile(
            jnp.asarray(np.asarray(params[f"prelu_{i}"], np.float32),
                        jnp.bfloat16), pack)
        # fold the requant scale 127/s_out INTO the dequant constants:
        # PReLU commutes with a positive scale, so
        #   round(PReLU(acc·deq + b)·127/s_out)
        # = round(PReLU(acc·(deq·127/s_out) + b·127/s_out))
        # — one fewer full-tensor multiply per layer on the VPU.
        r = 127.0 / float(act_scales[i + 1])
        q[f"deq_{i}"] = (q[f"deq_{i}"].astype(jnp.float32) * r).astype(
            jnp.bfloat16)
        q[f"b_{i}"] = (q[f"b_{i}"].astype(jnp.float32) * r).astype(
            jnp.bfloat16)
    quant_layer(params["conv_last"]["kernel"], params["conv_last"]["bias"],
                act_scales[num_conv + 1], "last")
    # conv_last also serves an int8 SINK (body-layer shape): folding the
    # output requant 127/s_out into deq/b lets XLA pipeline conv_last like
    # a body layer (bf16/int32 sinks measured +2.3 ms on v5e); the tail
    # dequantizes with inv_last fused into the pixel-shuffle pass. The
    # output-residual quantization costs ~50 dB — far above the gate.
    if len(act_scales) > num_conv + 2:
        s_out = float(act_scales[num_conv + 2]) + 1e-12
        r = 127.0 / s_out
        q["deq_last"] = (q["deq_last"].astype(jnp.float32) * r).astype(
            jnp.bfloat16)
        q["b_last"] = (q["b_last"].astype(jnp.float32) * r).astype(
            jnp.bfloat16)
        q["inv_last"] = jnp.bfloat16(s_out / 127.0)
    q["s_in_0"] = jnp.float32(act_scales[0])
    return q


def quantized_srvgg_forward(q: Dict, x: jax.Array, num_conv: int,
                            upscale: int = 4, pack: int = 2,
                            crop_halo: int = 0) -> jax.Array:
    """x: (N,H,W,3) float [0,1], N divisible by `pack` → bf16 output.

    crop_halo > 1: the input carries a `crop_halo`-pixel tile halo whose
    OUTPUT is discarded by the tiler anyway — crop to halo-1 before
    conv_last (1 px of context keeps the interior exact under SAME
    padding) and drop the ring before the pixel-shuffle tail, so conv_last
    + pixel-shuffle + the residual upsample + the HBM output write all run
    at the tile size, not the haloed size. Output: (N, tile·r, tile·r, 3).
    """
    n, h, w, c = x.shape
    dn = ("NHWC", "HWIO", "NHWC")
    hp = jnp.concatenate([x[i * n // pack:(i + 1) * n // pack]
                          for i in range(pack)], axis=-1)

    def to_int8(t, scale):
        return jnp.clip(jnp.round(t * (jnp.bfloat16(127.0) / scale)), -127,
                        127).astype(jnp.int8)

    hq = to_int8(hp.astype(jnp.float32), q["s_in_0"]).astype(jnp.int8)
    for i in range(num_conv + 1):
        acc = jax.lax.conv_general_dilated(
            hq, q[f"w_{i}"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        # deq/b carry the folded 127/s_out requant scale; PReLU is
        # positive-scale invariant so alpha is applied in the scaled domain
        hf = acc.astype(jnp.bfloat16) * q[f"deq_{i}"] + q[f"b_{i}"]
        hf = jnp.where(hf >= 0, hf, hf * q[f"a_{i}"])
        hq = jnp.clip(jnp.round(hf), -127, 127).astype(jnp.int8)
    if crop_halo > 1:
        k = crop_halo - 1
        hq = hq[:, k:-k, k:-k, :]
        x = x[:, crop_halo:-crop_halo, crop_halo:-crop_halo, :]
        h, w = x.shape[1], x.shape[2]
    acc = jax.lax.conv_general_dilated(
        hq, q["w_last"], (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.bfloat16) * q["deq_last"] + q["b_last"]
    inv_last = q.get("inv_last")
    if inv_last is not None:
        # int8 sink (see quantize_srvgg_params): conv_last pipelines like
        # a body layer; the tail pass dequantizes below.
        out = jnp.clip(jnp.round(out), -127, 127).astype(jnp.int8)
    if crop_halo > 1:
        out = out[:, 1:-1, 1:-1, :]

    oc = 3 * upscale ** 2
    out = jnp.concatenate([out[..., i * oc:(i + 1) * oc]
                           for i in range(pack)], axis=0)
    if inv_last is not None:
        out = out.astype(jnp.bfloat16) * inv_last
    # nearest-upsample base added PRE-shuffle: channel c0*r²+(a,b) of the
    # un-shuffled tensor lands at subpixel (a,b) channel c0, so repeating
    # each input channel r² times is exactly the NN-upsampled base — the
    # add runs at 48-lane efficiency and the shuffle becomes the last op.
    out = out + jnp.repeat(x, upscale * upscale, axis=-1).astype(jnp.bfloat16)
    # serve in bf16: the 4×-upscaled output is the single biggest HBM
    # write; serving casts to uint8 anyway
    return pixel_shuffle(out, upscale)
