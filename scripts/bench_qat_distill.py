#!/usr/bin/env python
"""Serving-aware trainers on the real chip: QAT and distillation.

Round-3 sessions added two trainers that close the loop between training
and the measured serving paths (both framework extensions — the
reference's TensorRT serving is PTQ-only and it ships no distillation):

  * QAT (train.quant_opt, ops/qat.py): SRVGG trains against the
    fake-quant twin of the int8 serving graph that produces the headline
    tiles/s number.
  * DistillModel: frozen RRDB-23 teacher -> SRVGG student — the serving
    strategy the measured RRDB kernel study concluded with
    (docs/PERFORMANCE.md).

This measures, on-chip (per bench.py conventions: lax.scan step loops,
everything a jit ARGUMENT, min over repeats):

  1. qat_step   — QAT train-step cost vs the float step at the same
                  f32 config (SRVGG 64f/32c x4, gt 256², on-device
                  second-order degradation): the price of training the
                  serving graph's twin.
  2. qat_vs_ptq — the payoff: from the SAME init and data stream, train
                  float+PTQ vs QAT for a few hundred iters on real
                  test_images crops; compare the SERVED int8 model's
                  PSNR on a held-out degraded val batch.
  3. distill_step — production-shape distillation step cost (RRDB-23
                  bf16 teacher forward inside the student's step),
                  imgs/s vs the plain L1 step.

Writes docs/assets/qat_distill_bench.json (real-TPU runs only; --tiny is
the forced-CPU structural sanity mode). bench.py echoes the artifact and
runs this as a queued job once the headline is out.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import guard_backend, log
from bench_train import (REPEATS, build_sr_trainer, real_crops,
                         sr_scan_loop, time_loop)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")


def _span_psnr(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    span = max(ref.max() - ref.min(), 1e-9)
    mse = float(np.mean((ref - got) ** 2))
    return 10 * np.log10(span ** 2 / max(mse, 1e-20))


def bench_qat_step(bs=16, iters=16, num_feat=64, num_conv=32, gt_hw=256):
    """QAT vs float train-step cost, same f32 config (the fake-quant twin
    emulates int8 arithmetic in f32, so f32-vs-f32 isolates its price)."""
    rng_np = np.random.default_rng(0)
    pool = jnp.asarray(real_crops(gt_hw, bs * 2, rng_np), jnp.float32)
    rows = []
    for quant in (False, True):
        model = build_sr_trainer(bs, dtype=None, gt_hw=gt_hw,
                                 num_feat=num_feat, num_conv=num_conv,
                                 quant=quant)
        run = sr_scan_loop(model, iters)
        sec, _ = time_loop(run, model.state, pool, jax.random.PRNGKey(0),
                           bs, iters)
        rows.append({"mode": "qat" if quant else "float", "bs": bs,
                     "ms_per_step": round(sec * 1e3, 2),
                     "imgs_per_sec": round(bs / sec, 1)})
        log(f"SR L1 step ({'QAT fake-quant' if quant else 'float f32'}) "
            f"bs={bs}: {sec * 1e3:.1f} ms/step = {bs / sec:.1f} imgs/s")
        del model
    overhead = rows[1]["ms_per_step"] / rows[0]["ms_per_step"] - 1.0
    log(f"QAT step overhead: {overhead * 100:.1f}%")
    return {"config": f"SRVGG {num_feat}f/{num_conv}c x4 f32, gt "
                      f"{gt_hw}², on-device 2nd-order degradation",
            "rows": rows, "overhead_pct": round(overhead * 100, 1)}


def bench_qat_vs_ptq(total_iters=600, chunk=100, bs=8, num_feat=64,
                     num_conv=32, gt_hw=256, scale=4, seed=0):
    """Same init, same data stream: float-then-PTQ vs QAT; judge the
    SERVED int8 model on a held-out degraded val batch (real content)."""
    from image_restoration_tpu.ops.qat import export_int8
    from image_restoration_tpu.ops.quantized_inference import (
        calibrate_srvgg_act_scales, quantize_srvgg_params,
        quantized_srvgg_forward)

    rng_np = np.random.default_rng(seed)
    pool = jnp.asarray(real_crops(gt_hw, 64 if total_iters > 100 else 8,
                                  rng_np), jnp.float32)
    val_np = real_crops(gt_hw, 8 if total_iters > 100 else 2,
                        np.random.default_rng(seed + 7))
    val_imgs = jnp.asarray(val_np, jnp.float32)
    val_key = jax.random.PRNGKey(123)

    def train(quant):
        model = build_sr_trainer(bs, dtype=None, gt_hw=gt_hw,
                                 num_feat=num_feat, num_conv=num_conv,
                                 quant=quant, lr=1e-3)
        run = sr_scan_loop(model, chunk)
        state = model.state
        rng = jax.random.PRNGKey(seed + 1)  # same stream for both arms
        done = 0
        while done < total_iters:
            rng, sub = jax.random.split(rng)
            out = run(state, pool, sub, bs)
            state = out[0]
            losses = np.asarray(out[1])
            assert np.all(np.isfinite(losses)), f"non-finite at {done}"
            done += chunk
            log(f"  {'qat' if quant else 'float'} iter {done}: "
                f"loss {losses.mean():.4f}")
        return model, state

    # held-out degraded val pair, ONE fixed degradation (jit args only —
    # see docs/TRAINING.md on the axon constant-embedding miscompile)
    probe_model = build_sr_trainer(bs, dtype=None, gt_hw=gt_hw,
                                   num_feat=num_feat, num_conv=num_conv)
    lq_val, gt_val = jax.jit(probe_model.degrade_fn)(val_key, val_imgs)
    lq_val = jax.block_until_ready(lq_val)
    net = probe_model.net_g
    del probe_model

    @jax.jit
    def float_out(params, lq):
        out = net.apply({"params": params}, lq)
        return out[0] if isinstance(out, tuple) else out

    @jax.jit
    def int8_out(q, lq):
        return quantized_srvgg_forward(q, lq, num_conv, upscale=scale,
                                       pack=2)

    def psnr_vs_gt(out):
        out = np.clip(np.asarray(out, np.float32), 0, 1)
        return _span_psnr(np.asarray(gt_val, np.float32), out)

    result = {"iters": total_iters, "bs": bs,
              "config": f"SRVGG {num_feat}f/{num_conv}c x{scale}, real "
                        "test_images crops, same init + data stream",
              "val": "held-out crops, one fixed 2nd-order degradation"}

    # arm 1: float training + PTQ (calibration = a degraded train batch)
    t0 = time.perf_counter()
    model_f, state_f = train(quant=False)
    calib_lq, _ = jax.jit(model_f.degrade_fn)(jax.random.PRNGKey(99),
                                              pool[:4])
    ema_f = jax.device_get(state_f["ema_g"])
    scales = jax.device_get(jax.jit(
        lambda p, x: calibrate_srvgg_act_scales(p, x, num_conv))(
        state_f["ema_g"], calib_lq))
    q_ptq = quantize_srvgg_params(ema_f, [float(s) for s in scales],
                                  num_conv, pack=2)
    result["float_psnr"] = round(psnr_vs_gt(
        float_out(state_f["ema_g"], lq_val)), 3)
    result["ptq_int8_psnr"] = round(psnr_vs_gt(int8_out(q_ptq, lq_val)), 3)
    result["float_arm_wall_s"] = round(time.perf_counter() - t0, 1)
    del model_f, state_f

    # arm 2: QAT (same init/seed/data) -> export with the LEARNED scales
    t0 = time.perf_counter()
    model_q, state_q = train(quant=True)
    q_qat = export_int8(jax.device_get(state_q["ema_g"]),
                        jax.device_get(state_q["qscale"]), num_conv,
                        pack=2)
    result["qat_int8_psnr"] = round(psnr_vs_gt(int8_out(q_qat, lq_val)), 3)
    result["qat_float_psnr"] = round(psnr_vs_gt(
        float_out(state_q["ema_g"], lq_val)), 3)
    result["qat_arm_wall_s"] = round(time.perf_counter() - t0, 1)
    result["qat_minus_ptq_db"] = round(
        result["qat_int8_psnr"] - result["ptq_int8_psnr"], 3)
    log(f"served int8 val PSNR: PTQ {result['ptq_int8_psnr']} dB vs QAT "
        f"{result['qat_int8_psnr']} dB (float arm {result['float_psnr']} "
        f"dB) — QAT-PTQ = {result['qat_minus_ptq_db']} dB")
    return result


def bench_w4a8(total_iters=600, chunk=100, bs=8, num_feat=64, num_conv=32,
               gt_hw=256, scale=4, seed=0, weight_bits=4):
    """The regime QAT exists for: sub-8-bit weights, where plain PTQ
    degrades. Same init + data stream: float training then `weight_bits`
    weight PTQ vs QAT at the same width; both judged through the EXACT
    fake-quant serving twin (ops/qat.py qat_srvgg_forward, per-channel
    symmetric — the arithmetic such a deployment would run) on a held-out
    degraded val batch. Complements bench_qat_vs_ptq, which measured int8
    where PTQ already suffices (r3: −0.023 dB). Chip-measured r4: even
    w4a8 PTQ holds within 0.02 dB of float on this net, so the collapse
    regime is probed at 2-bit (ternary per-channel) weights."""
    from image_restoration_tpu.ops.qat import qat_srvgg_forward
    from image_restoration_tpu.ops.quantized_inference import (
        calibrate_srvgg_act_scales)

    qmax = 2 ** (weight_bits - 1) - 1
    tag = f"qat{weight_bits}"
    rng_np = np.random.default_rng(seed)
    pool = jnp.asarray(real_crops(gt_hw, 64 if total_iters > 100 else 8,
                                  rng_np), jnp.float32)
    val_imgs = jnp.asarray(real_crops(gt_hw, 8 if total_iters > 100 else 2,
                                      np.random.default_rng(seed + 7)),
                           jnp.float32)
    val_key = jax.random.PRNGKey(123)

    def train(quant):
        model = build_sr_trainer(bs, dtype=None, gt_hw=gt_hw,
                                 num_feat=num_feat, num_conv=num_conv,
                                 quant=quant, lr=1e-3,
                                 weight_bits=weight_bits)
        run = sr_scan_loop(model, chunk)
        state = model.state
        rng = jax.random.PRNGKey(seed + 1)  # same stream for both arms
        done = 0
        while done < total_iters:
            rng, sub = jax.random.split(rng)
            out = run(state, pool, sub, bs)
            state = out[0]
            losses = np.asarray(out[1])
            assert np.all(np.isfinite(losses)), f"non-finite at {done}"
            done += chunk
            log(f"  {tag if quant else 'float'} iter {done}: "
                f"loss {losses.mean():.4f}")
        return model, state

    probe = build_sr_trainer(bs, dtype=None, gt_hw=gt_hw,
                             num_feat=num_feat, num_conv=num_conv)
    lq_val, gt_val = jax.jit(probe.degrade_fn)(val_key, val_imgs)
    lq_val = jax.block_until_ready(lq_val)
    degrade_fn = probe.degrade_fn
    net = probe.net_g
    del probe

    @jax.jit
    def w4a8_out(params, qscale, lq):
        out, _ = qat_srvgg_forward(params, lq, qscale, num_conv,
                                   upscale=scale, weight_qmax=qmax)
        return out

    @jax.jit
    def float_out(params, lq):
        out = net.apply({"params": params}, lq)
        return out[0] if isinstance(out, tuple) else out

    def psnr_vs_gt(out):
        out = np.clip(np.asarray(out, np.float32), 0, 1)
        return _span_psnr(np.asarray(gt_val, np.float32), out)

    result = {"iters": total_iters, "bs": bs,
              "config": f"SRVGG {num_feat}f/{num_conv}c x{scale} "
                        f"w{weight_bits}a8 (weight_qmax={qmax} "
                        "per-channel), real test_images crops, same "
                        "init + data stream",
              "val": "held-out crops, one fixed 2nd-order degradation, "
                     f"judged through the exact w{weight_bits}a8 "
                     "fake-quant twin"}

    # arm 1: float training, then 4-bit weight PTQ (calibrated act scales)
    t0 = time.perf_counter()
    model_f, state_f = train(quant=False)
    calib_lq, _ = jax.jit(model_f.degrade_fn)(jax.random.PRNGKey(99),
                                              pool[:4])
    scales = jnp.asarray(jax.device_get(jax.jit(
        lambda p, x: calibrate_srvgg_act_scales(p, x, num_conv))(
        state_f["ema_g"], calib_lq)), jnp.float32)
    result["float_psnr"] = round(psnr_vs_gt(
        float_out(state_f["ema_g"], lq_val)), 3)
    result["ptq_w4a8_psnr"] = round(psnr_vs_gt(
        w4a8_out(state_f["ema_g"], scales, lq_val)), 3)
    result["float_arm_wall_s"] = round(time.perf_counter() - t0, 1)
    del model_f, state_f

    # arm 2: 4-bit QAT (same init/seed/data), judged with its EMA scales
    t0 = time.perf_counter()
    model_q, state_q = train(quant=True)
    result["qat_w4a8_psnr"] = round(psnr_vs_gt(
        w4a8_out(state_q["ema_g"], state_q["qscale"], lq_val)), 3)
    result["qat_arm_wall_s"] = round(time.perf_counter() - t0, 1)
    result["qat_minus_ptq_db"] = round(
        result["qat_w4a8_psnr"] - result["ptq_w4a8_psnr"], 3)
    log(f"w{weight_bits}a8 val PSNR: PTQ {result['ptq_w4a8_psnr']} dB vs QAT "
        f"{result['qat_w4a8_psnr']} dB (float {result['float_psnr']} dB) "
        f"— QAT-PTQ = {result['qat_minus_ptq_db']:+} dB")
    del model_q, state_q
    return result


def bench_distill_step(batch_sizes=(8, 16), iters=8, num_feat=64,
                       num_conv=32, teacher_blocks=23, gt_hw=256, scale=4):
    """Production-shape distillation step: RRDB-23 bf16 teacher forward
    inside the SRVGG student's jitted step (configs/
    train_distill_rrdb_to_srvgg.yml shape). Random teacher weights —
    step COST is weight-independent; semantics are CPU-tested."""
    from image_restoration_tpu.models import build_model
    from image_restoration_tpu.data.pipelines import (
        RealESRGANDegradationConfig, make_realesrgan_degradation)

    rows = []
    rng_np = np.random.default_rng(0)
    for bs in batch_sizes:
        opt = {
            "is_train": True, "manual_seed": 0, "num_devices": 1,
            "scale": scale, "gt_size": gt_hw,
            "path": {"models": "/tmp/bench_train/models"},
            "logger": {},
            "model_type": "DistillModel",
            "network_g": dict(type="SRVGGNetCompact", num_feat=num_feat,
                              num_conv=num_conv, upscale=scale),
            "network_t": dict(type="RRDBNet", scale=scale, num_feat=64,
                              num_block=teacher_blocks,
                              dtype="bf16" if teacher_blocks > 1 else None),
            "train": {
                "optim_g": {"type": "Adam", "lr": 2e-4},
                "scheduler": {"type": "MultiStepLR",
                              "milestones": [400000], "gamma": 0.5},
                "total_iter": 400000, "ema_decay": 0.999,
                "allow_random_teacher": True,
                "distill_opt": {"type": "L1Loss", "loss_weight": 1.0},
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            },
        }
        model = build_model(opt)
        model.set_degradation_pipeline(make_realesrgan_degradation(
            RealESRGANDegradationConfig(scale=scale)))
        run = sr_scan_loop(model, iters)
        pool = jnp.asarray(real_crops(gt_hw, bs * 2, rng_np), jnp.float32)
        try:
            sec, _ = time_loop(run, model.state, pool,
                               jax.random.PRNGKey(0), bs, iters)
        except Exception as e:
            log(f"distill bs={bs} failed: {type(e).__name__}: {e}")
            continue
        rows.append({"bs": bs, "ms_per_step": round(sec * 1e3, 2),
                     "imgs_per_sec": round(bs / sec, 1)})
        log(f"Distill step (RRDB-{teacher_blocks} bf16 teacher -> SRVGG "
            f"student) bs={bs}: {sec * 1e3:.1f} ms/step = "
            f"{bs / sec:.1f} imgs/s")
        del model
    return {"config": f"RRDB-{teacher_blocks} bf16 teacher fwd + SRVGG "
                      f"{num_feat}f/{num_conv}c student step, gt {gt_hw}²",
            "rows": rows}


def main():
    tiny = "--tiny" in sys.argv  # CPU structural sanity before any chip run
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    guard_backend()
    log(f"devices: {jax.devices()}")
    path = os.path.join(ASSETS, "qat_distill_bench.json")
    # incremental: keep already-measured sections (qat_step etc. cost
    # ~15 chip-min); only compute what the artifact still lacks
    out = {}
    if not tiny and os.path.isfile(path):
        try:
            out = json.load(open(path))
        except Exception:
            out = {}
    out["date"] = time.strftime("%Y-%m-%d")
    out.setdefault("timing",
                   f"on-chip lax.scan step loops, min of {REPEATS} runs")
    if tiny:
        out["qat_step"] = bench_qat_step(bs=2, iters=2, num_feat=8,
                                         num_conv=2, gt_hw=64)
        out["qat_vs_ptq"] = bench_qat_vs_ptq(total_iters=40, chunk=20,
                                             bs=2, num_feat=8, num_conv=2,
                                             gt_hw=64)
        out["qat4_vs_ptq4"] = bench_w4a8(total_iters=40, chunk=20, bs=2,
                                         num_feat=8, num_conv=2, gt_hw=64)
        out["qat2_vs_ptq2"] = bench_w4a8(total_iters=40, chunk=20, bs=2,
                                         num_feat=8, num_conv=2, gt_hw=64,
                                         weight_bits=2)
        out["distill_step"] = bench_distill_step(
            batch_sizes=(2,), iters=2, num_feat=8, num_conv=2,
            teacher_blocks=1, gt_hw=64)
    else:
        if "qat_step" not in out:
            out["qat_step"] = bench_qat_step()
        if "qat_vs_ptq" not in out:
            out["qat_vs_ptq"] = bench_qat_vs_ptq()
        if "qat4_vs_ptq4" not in out:
            out["qat4_vs_ptq4"] = bench_w4a8()
        if "qat2_vs_ptq2" not in out:
            out["qat2_vs_ptq2"] = bench_w4a8(weight_bits=2)
        if "distill_step" not in out:
            out["distill_step"] = bench_distill_step()
    if tiny or jax.devices()[0].platform != "tpu":
        log("tiny/off-TPU sanity only — NOT writing qat_distill_bench.json")
        print(json.dumps({"ok": True, "tiny": True}), flush=True)
        return
    os.makedirs(ASSETS, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps({"metric": "qat_minus_ptq_db",
                      "w4a8": out["qat4_vs_ptq4"]["qat_minus_ptq_db"],
                      "w2a8": out["qat2_vs_ptq2"]["qat_minus_ptq_db"],
                      "unit": "dB_val"}), flush=True)


if __name__ == "__main__":
    main()
