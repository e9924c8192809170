#!/usr/bin/env python
"""Benchmark: 512² x4-SR tiles/sec/chip (BASELINE.json headline metric).

Runs SRVGGNetCompact (realesr-general config: 64 feat, 32 convs, x4) in bf16
over batched 512²(+halo) tiles on the real TPU chip — the tiled-inference hot
path. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}
Baseline: 200 tiles/sec/chip (BASELINE.md north star).

Timing methodology: the axon tunnel has ~40-500 ms per-dispatch RPC latency,
so wall-clock around single jit calls measures the tunnel, not the chip. We
time an ON-CHIP lax.scan of `ITERS` data-dependent forwards inside one jit
and fetch a scalar — this is what a production serving loop (resident on the
host attached to the TPU) would sustain.

Extra diagnostics (RRDBNet tiles/sec, GFPGAN imgs/sec) go to stderr.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.archs import build_network

BASELINE_TILES_PER_SEC = 200.0
HALO = 16
TILE = 512
ITERS = 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def onchip_ms(apply_fn, params, x, iters=ITERS):
    """ms per forward, measured as an on-chip scan with data dependency.

    params/x are jit ARGUMENTS (not closure constants) — the axon remote
    compiler rejects requests with hundreds of MB of inline constants.
    """

    @jax.jit
    def loop(params, x):
        def step(carry, _):
            y = apply_fn(params, x + carry)
            return jnp.mean(y).astype(x.dtype), None

        c, _ = jax.lax.scan(step, jnp.zeros((), x.dtype), None,
                            length=iters)
        return c

    float(loop(params, x))  # compile + first run
    t0 = time.perf_counter()
    s = float(loop(params, x))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    size = TILE + 2 * HALO  # halo-padded tile as served by tiled_apply
    log(f"devices: {jax.devices()}")

    # ---- headline: SRVGG realesr-general x4, bf16, batched tiles.
    #
    # Perf notes (measured on this chip):
    #  * conv 64→64 fills only half the 128-lane MXU → ~68 TFLOP/s cap;
    #    dense C=128 convs sustain ~171 TFLOP/s (87% of bf16 peak)
    #  * 2×2 space-to-depth (full 256-ch shapes) loses: 4× FLOP overhead
    #  * grouped conv (feature_group_count=2) lowers poorly (~31 TFLOP/s)
    #  * channel-PACKING two tiles with block-diagonal weights is exact and
    #    measured ~1.3× (ops/packed_inference.py) → the headline path
    NUM_CONV = 32
    net = build_network(dict(type="SRVGGNetCompact", num_feat=64,
                             num_conv=NUM_CONV, upscale=4,
                             dtype=jnp.bfloat16))
    from image_restoration_tpu.ops.packed_inference import (
        pack_srvgg_params, packed_srvgg_forward)

    x1 = jnp.asarray(rng.random((1, size, size, 3), np.float32),
                     jnp.bfloat16)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x1)
    packed = pack_srvgg_params(variables["params"], NUM_CONV)

    def apply_packed(p, x):
        return packed_srvgg_forward(p, x, NUM_CONV, 4)

    # int8 PTQ mode (the TPU analog of the reference's reduced-precision
    # TensorRT serving, Plate_Detect/docs/TRT.md): per-out-channel weight
    # scales + calibrated per-layer activation scales, composed with the
    # channel packing. Quality vs bf16 is logged below.
    from image_restoration_tpu.ops.quantized_inference import (
        calibrate_srvgg_act_scales, quantize_srvgg_params,
        quantized_srvgg_forward)
    calib = jnp.asarray(rng.random((2, 128, 128, 3), np.float32))
    scales = jax.device_get(jax.jit(
        lambda p, x: calibrate_srvgg_act_scales(p, x, NUM_CONV))(
        jax.tree.map(lambda a: a.astype(jnp.float32),
                     variables["params"]), calib))
    qparams = quantize_srvgg_params(
        jax.device_get(variables["params"]), [float(s) for s in scales],
        NUM_CONV, pack=2)

    def apply_int8(p, x):
        return quantized_srvgg_forward(p, x.astype(jnp.float32), NUM_CONV,
                                       4, pack=2)

    best, best_bs, best_mode = 0.0, 1, "plain"
    for mode, apply_fn, p in (("packed2-bf16", apply_packed, packed),
                              ("packed2-int8", apply_int8, qparams)):
        for bs in (8,):
            x = jnp.asarray(rng.random((bs, size, size, 3), np.float32),
                            jnp.bfloat16)
            try:
                ms = onchip_ms(apply_fn, p, x)
            except Exception as e:
                log(f"SRVGG {mode} failed: {e}")
                continue
            tps = bs / (ms / 1e3)
            log(f"SRVGG x4 {size}² {mode} bs={bs}: {ms:.2f} ms → "
                f"{tps:.1f} tiles/s")
            if tps > best:
                best, best_bs, best_mode = tps, bs, mode

    # int8 quality vs bf16 on one tile batch (smaller size: avoid big fetch)
    try:
        xs = jnp.asarray(rng.random((2, 128, 128, 3), np.float32))
        ref_out = np.asarray(jax.jit(apply_packed)(
            packed, xs.astype(jnp.bfloat16))).astype(np.float32)
        q_out = np.asarray(jax.jit(apply_int8)(qparams, xs))
        mse = float(np.mean((ref_out - q_out) ** 2))
        span = float(ref_out.max() - ref_out.min()) or 1.0
        log(f"int8 PTQ vs bf16 PSNR: "
            f"{10 * np.log10(span ** 2 / max(mse, 1e-12)):.1f} dB")
    except Exception as e:
        log(f"int8 quality check failed: {e}")

    result = {
        "metric": f"SRVGG-general x4 {TILE}²+{HALO}halo tiles/sec/chip "
                  f"(bs={best_bs}, {best_mode}, on-chip)",
        "value": round(best, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(best / BASELINE_TILES_PER_SEC, 3),
    }
    print(json.dumps(result), flush=True)


    # ---- diagnostics (after the headline JSON: a timeout here must
    # not lose the result)
    # (packed-g RRDBNet exists in ops/packed_inference.py and is exact, but
    # its 345-conv packed graph exceeds the axon remote-compile budget at
    # 544²; the diagnostic measures the plain forward.)
    try:
        rrdb = build_network(dict(type="RRDBNet", scale=4, num_feat=64,
                                  num_block=23, dtype=jnp.bfloat16))
        xr = jnp.asarray(rng.random((1, size, size, 3), np.float32),
                         jnp.bfloat16)
        vr = jax.jit(rrdb.init)(jax.random.PRNGKey(0), xr)
        ms = onchip_ms(lambda p, x: rrdb.apply({"params": p}, x),
                       vr["params"], xr, iters=3)
        log(f"RRDBNet-23 x4 {size}² bf16 bs=1: {ms:.1f} ms → "
            f"{1e3 / ms:.1f} tiles/s")
    except Exception as e:  # diagnostics must not break the headline
        log(f"RRDBNet diag failed: {e}")

    try:
        gfp = build_network(dict(type="GFPGANv1OCR", input_width=256,
                                 input_height=256, num_style_feat=256,
                                 channel_multiplier=0.5, num_mlp=4,
                                 input_is_latent=True, different_w=True,
                                 narrow=1, sft_half=True,
                                 dtype=jnp.bfloat16))
        xg = jnp.asarray(rng.random((4, 256, 256, 3), np.float32),
                         jnp.bfloat16)
        vg = jax.jit(lambda k, x: gfp.init(k, x, randomize_noise=False))(
            jax.random.PRNGKey(0), xg)
        ms = onchip_ms(
            lambda p, x: gfp.apply({"params": p}, x,
                                   randomize_noise=False)[0],
            vg["params"], xg, iters=5)
        log(f"GFPGANv1OCR 256² bf16 bs=4: {ms:.1f} ms → "
            f"{4e3 / ms:.1f} imgs/s")
    except Exception as e:
        log(f"GFPGAN diag failed: {e}")



if __name__ == "__main__":
    main()
