#!/usr/bin/env python
"""RRDBNet-23 x4 serving ladder at the 528² tile size (BASELINE config #1).

Round-2 state: plain bf16 1.8 tiles/s; g=4 block-diag packing ≈ parity
(1.51) — the named wall is the 64→32 growth convs (~3-8 TFLOP/s, quarter
of the MXU's 128 output lanes live). This script measures the attack
ladder the round-2 verdict prescribed:

  1. plain bf16 (baseline)
  2. packed g=4 block-diagonal (r2 formulation, for reference)
  3. WIDENED concat-absorbed form (ops/rrdb_widened.py — FLOP-identical
     re-association; convs become 64→192 and 32→{160,128,96,64})
  4. widened + g=2 / g=4 tile packing (fills the K=32 contraction too)
  5. int8 PTQ on the widened form (ops/rrdb_quant.py) with PSNR gate

Roofline: RRDB-23 at 528² is ~9.2 TFLOP/tile — the bf16
speed-of-light on one v5e chip (197 TFLOP/s) is ~21 tiles/s, 171 TFLOP/s
(measured dense-conv rate) gives ~18.5. Numbers land in
docs/assets/rrdb_ladder.json; docs/PERFORMANCE.md carries the table.

Timing: on-chip lax.scan (see bench.py onchip_ms).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import onchip_ms, real_tiles
from image_restoration_tpu.archs import build_network

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")
NUM_BLOCK = 23
SIZE = 528  # 512 + 2*8 halo, the served tile


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(modes=None, bss=(1, 4)):
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}")
    net = build_network(dict(type="RRDBNet", scale=4, num_feat=64,
                             num_block=NUM_BLOCK, dtype=jnp.bfloat16))
    x1 = jnp.asarray(rng.random((1, SIZE, SIZE, 3), np.float32),
                     jnp.bfloat16)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x1)
    params32 = jax.tree.map(lambda a: a.astype(jnp.float32),
                            variables["params"])

    rows = []
    ladder_path = os.path.join(ASSETS, "rrdb_ladder.json")
    if os.path.isfile(ladder_path):   # accumulate across partial runs
        old = json.load(open(ladder_path))
        rows = [r for r in old.get("rows", [])]

    def flush():
        os.makedirs(ASSETS, exist_ok=True)
        with open(ladder_path, "w") as f:
            json.dump({"date": time.strftime("%Y-%m-%d"), "size": SIZE,
                       "tile_flops_tflop": 9.2, "rows": rows}, f, indent=1)

    def record(name, bs, ms, extra=None):
        tps = bs / (ms / 1e3)
        row = {"mode": name, "bs": bs, "ms": round(ms, 1),
               "tiles_per_sec": round(tps, 2)}
        if extra:
            row.update(extra)
        # dedup on the mode name STEM so a drifting quality-gate suffix
        # ("widened-int8 (gate 54.0 dB)") cannot leave a stale twin row
        stem = name.split(" (")[0]
        rows[:] = [r for r in rows
                   if not (r["mode"].split(" (")[0] == stem
                           and r["bs"] == bs)]
        rows.append(row)
        flush()
        log(f"RRDB-23 x4 {SIZE}² {name} bs={bs}: {ms:.1f} ms → "
            f"{tps:.2f} tiles/s" + (f" {extra}" if extra else ""))

    def bench(name, apply_fn, params, bs, iters=3):
        x = jnp.asarray(rng.random((bs, SIZE, SIZE, 3), np.float32),
                        jnp.bfloat16)
        try:
            ms = onchip_ms(apply_fn, params, x, iters=iters, repeats=2)
        except Exception as e:
            log(f"{name} bs={bs} failed: {type(e).__name__}: {e}")
            return None
        record(name, bs, ms)
        return ms

    modes = modes or ["plain", "packed4", "widened", "widened_g2",
                      "widened_g4", "int8"]

    if "plain" in modes:
        for bs in bss:
            if bs == 1 or bs == bss[0]:
                bench("plain-bf16",
                      lambda p, x: net.apply({"params": p}, x) * 1e-3,
                      variables["params"], bs)

    if "packed4" in modes:
        from image_restoration_tpu.ops.packed_inference import (
            pack_rrdbnet_params, packed_rrdbnet_forward)
        packed = pack_rrdbnet_params(variables["params"], NUM_BLOCK, g=4)
        bench("packed-g4-bf16 (r2)",
              lambda p, x: packed_rrdbnet_forward(p, x, NUM_BLOCK, 4, g=4)
              * 1e-3, packed, 4)

    from image_restoration_tpu.ops.rrdb_widened import (
        widen_rrdbnet_params, widened_rrdbnet_forward)
    if "widened" in modes:
        wp = widen_rrdbnet_params(variables["params"], NUM_BLOCK, g=1)
        for bs in bss:
            bench("widened-bf16",
                  lambda p, x: widened_rrdbnet_forward(p, x, NUM_BLOCK)
                  * 1e-3, wp, bs)
    if "widened_g2" in modes:
        wp2 = widen_rrdbnet_params(variables["params"], NUM_BLOCK, g=2)
        bench("widened-g2-bf16",
              lambda p, x: widened_rrdbnet_forward(p, x, NUM_BLOCK, g=2)
              * 1e-3, wp2, 2)
    if "widened_g4" in modes:
        wp4 = widen_rrdbnet_params(variables["params"], NUM_BLOCK, g=4)
        bench("widened-g4-bf16",
              lambda p, x: widened_rrdbnet_forward(p, x, NUM_BLOCK, g=4)
              * 1e-3, wp4, 4)

    if "int8" in modes:
        try:
            from image_restoration_tpu.ops.rrdb_quant import (
                calibrate_rrdb_act_scales, quantize_rrdb_params,
                quantized_rrdb_forward)
            calib_np, real = real_tiles(160, 2, rng)
            # calibration unrolls 345 convs — run it EAGERLY on the host
            # CPU backend (the remote compiler chokes on the unrolled
            # graph; eager avoids compilation entirely)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                p_cpu = jax.device_put(params32, cpu)
                scales = np.asarray(calibrate_rrdb_act_scales(
                    p_cpu, jax.device_put(jnp.asarray(calib_np), cpu),
                    NUM_BLOCK))
            qp = quantize_rrdb_params(jax.device_get(params32), scales,
                                      NUM_BLOCK)
            # quality gate vs bf16 on real content at a reduced size
            tiles_np, real = real_tiles(256, 2, rng)
            xs = jnp.asarray(tiles_np)
            ref_out = np.asarray(jax.jit(
                lambda p, x: net.apply({"params": p}, x))(
                variables["params"], xs.astype(jnp.bfloat16))).astype(
                np.float32)
            q_out = np.asarray(jax.jit(
                lambda p, x: quantized_rrdb_forward(p, x, NUM_BLOCK))(
                qp, xs)).astype(np.float32)
            mse = float(np.mean((ref_out - q_out) ** 2))
            span = float(ref_out.max() - ref_out.min()) or 1.0
            gate = 10 * np.log10(span ** 2 / max(mse, 1e-12))
            log(f"RRDB int8 vs bf16 PSNR @256² "
                f"({'REAL' if real else 'synthetic'}): {gate:.1f} dB")
            for bs in bss:
                ms = bench(f"widened-int8 (gate {gate:.1f} dB)",
                           lambda p, x: quantized_rrdb_forward(
                               p, x, NUM_BLOCK) * 1e-3, qp, bs)
        except ImportError:
            log("rrdb_quant not present; skipping int8")
        except Exception as e:
            log(f"int8 path failed: {type(e).__name__}: {e}")

    flush()
    log("wrote docs/assets/rrdb_ladder.json")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default=None,
                    help="comma list: plain,packed4,widened,widened_g2,"
                         "widened_g4,int8")
    ap.add_argument("--bss", default="1,4")
    a = ap.parse_args()
    main(a.modes.split(",") if a.modes else None,
         tuple(int(b) for b in a.bss.split(",")))
