"""Quantization-aware training (QAT) for the int8 SRVGG serving path.

Framework extension (no reference analog — the reference's TensorRT
serving is PTQ-only): trains SRVGGNetCompact against the EXACT int8
deployment arithmetic of ``ops/quantized_inference.py`` so the weights
adapt to quantization noise instead of merely surviving it.

The fake-quant forward mirrors the served graph point-for-point:

  * input quantized with scale s_0;
  * every body conv runs per-OUTPUT-CHANNEL symmetric int8 weights
    (straight-through estimator), bias + PReLU in float, then requant
    with scale s_{i+1} — the same points the serving path folds its
    127/s_out requant into;
  * conv_last is an int8 SINK: its residual output is quantized with
    s_last (serving's ``inv_last`` tail);
  * the nearest-upsample base add + pixel shuffle stay float, as served.

Activation scales are EMA-tracked |max| statistics carried in the train
state (``state["qscale"]``) and exported directly into
``quantize_srvgg_params`` — the QAT analog of the PTQ calibration batch.
Until a scale has been observed it falls back to the current batch's
dynamic max, so step 0 is well-defined without a calibration pass.

Deployment: ``export_int8(params, qscale, num_conv)`` produces the same
pytree the serving/engine paths consume (`quantized_srvgg_forward`,
``scripts/export_restorer.py --quant int8``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .pixel_ops import pixel_shuffle
from .quantized_inference import quantize_srvgg_params


def _ste(x, q):
    """Straight-through estimator: forward q, gradient of identity."""
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 fake-quant with a per-tensor scale (|max| domain).

    Falls back to the tensor's own dynamic |max| while ``scale`` is
    still zero (un-initialized EMA).

    The straight-through gradient is GATED to the pass band: elements
    clipped to ±127·s forward the saturated value and receive zero
    gradient (torch FakeQuantize / TF FakeQuantWithMinMaxVars
    semantics) — an identity gradient there would push weights in
    directions with no forward effect and destabilize QAT whenever a
    batch max exceeds the EMA-tracked scale.
    """
    dyn = jax.lax.stop_gradient(jnp.max(jnp.abs(x))) + 1e-12
    s = jnp.where(scale > 0, scale, dyn) / 127.0
    q = jnp.clip(jnp.round(x / s), -127, 127) * s
    in_band = jnp.abs(x) <= 127.0 * s
    return jnp.where(in_band, _ste(x, q), jax.lax.stop_gradient(q))


def fake_quant_weight(w: jax.Array, qmax: int = 127) -> jax.Array:
    """Per-output-channel symmetric fake-quant (HWIO kernel), matching
    quantize_srvgg_params' weight scheme at qmax=127 (int8). qmax=7
    trains 4-bit weights — the sub-8-bit regime where plain PTQ
    collapses and QAT has to earn its keep."""
    w_scale = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / qmax
    w_scale = jax.lax.stop_gradient(w_scale) + 1e-12
    q = jnp.clip(jnp.round(w / w_scale), -qmax, qmax) * w_scale
    return _ste(w, q)


def qat_srvgg_forward(params: Dict, x: jax.Array, qscale: jax.Array,
                      num_conv: int, upscale: int = 4,
                      weight_qmax: int = 127
                      ) -> Tuple[jax.Array, jax.Array]:
    """Fake-quant SRVGG forward.

    Args:
      params: the flax param tree (body_{i}/prelu_{i}/conv_last).
      x: (N,H,W,3) float input in [0,1].
      qscale: (num_conv+3,) tracked activation |max| scales — the same
        indexing as ``calibrate_srvgg_act_scales`` (input of each conv,
        input of conv_last, output of conv_last).
      num_conv: body conv count (SRVGGNetCompact.num_conv).
      weight_qmax: weight quantization ceiling (127 = int8 serving twin;
        7 = w4a8).

    Returns:
      (output, batch_maxima) — batch_maxima has qscale's shape and
      carries this batch's |max| at each quantization point, for the
      EMA update (already stop_gradient'd).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    qscale = jax.lax.stop_gradient(qscale)
    maxima = []
    h = x
    for i in range(num_conv + 1):
        maxima.append(jnp.max(jnp.abs(h)))
        h = fake_quant_act(h, qscale[i])
        layer = params[f"body_{i}"]
        h = jax.lax.conv_general_dilated(
            h, fake_quant_weight(layer["kernel"], weight_qmax), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn) + layer["bias"]
        alpha = params[f"prelu_{i}"]
        h = jnp.where(h >= 0, h, h * alpha)
    maxima.append(jnp.max(jnp.abs(h)))
    h = fake_quant_act(h, qscale[num_conv + 1])
    out = jax.lax.conv_general_dilated(
        h, fake_quant_weight(params["conv_last"]["kernel"], weight_qmax),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn) + params["conv_last"]["bias"]
    maxima.append(jnp.max(jnp.abs(out)))
    # int8 sink: serving quantizes the residual output with s_last and
    # dequantizes in the pixel-shuffle tail (quantized_inference.py:151-163)
    out = fake_quant_act(out, qscale[num_conv + 2])
    out = pixel_shuffle(out, upscale)
    n, hh, ww, c = x.shape
    r = upscale
    base = jnp.broadcast_to(x[:, :, None, :, None, :],
                            (n, hh, r, ww, r, c)).reshape(
                                n, hh * r, ww * r, c)
    batch_max = jax.lax.stop_gradient(jnp.stack(maxima))
    return out + base, batch_max


def update_qscale(qscale: jax.Array, batch_max: jax.Array,
                  decay: float = 0.99) -> jax.Array:
    """EMA of activation maxima; adopts the batch max outright while the
    tracked value is still zero (first observation)."""
    ema = decay * qscale + (1.0 - decay) * batch_max
    return jnp.where(qscale > 0, ema, batch_max)


def export_int8(params: Dict, qscale, num_conv: int, pack: int = 2) -> Dict:
    """QAT state -> the serving pytree `quantized_srvgg_forward` consumes
    (identical to the PTQ export, with the trained EMA scales standing in
    for the calibration batch)."""
    import numpy as np
    scales = [float(s) for s in np.asarray(qscale)]
    if min(scales) <= 0.0:
        raise ValueError(
            f"qscale contains untrained (<= 0) activation scales "
            f"{scales}: run at least one optimize_parameters step with "
            "train.quant_opt before exporting (the EMA scales are only "
            "observed during training)")
    return quantize_srvgg_params(params, scales, num_conv, pack=pack)
