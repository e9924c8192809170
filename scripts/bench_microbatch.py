"""Measure serving throughput with and without dynamic micro-batching.

Drives ServiceCore.restore (the /Restore/ endpoint body — resize, restore,
JPEG-encode) from K concurrent client threads over the production GFPGAN
256² generator, with micro-batching off (per-request dispatch, the
reference servers' behavior — Car_Plate-Restoration/api.py:125-151) and on
(serve/batching.py). Reports imgs/s and per-request latency for each mode.

Run on the real chip:  python scripts/bench_microbatch.py
(CPU sanity:  JAX_PLATFORMS=cpu python scripts/bench_microbatch.py --tiny)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from types import SimpleNamespace

import numpy as np
import cv2

# invoked as `python scripts/bench_microbatch.py` — put the repo root on
# sys.path (sys.path[0] is scripts/)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")


def run_mode(core, img_bgr, clients: int, per_client: int):
    lat = []
    lock = threading.Lock()

    def worker():
        for _ in range(per_client):
            t0 = time.monotonic()
            core.restore(img_bgr)
            dt = time.monotonic() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    n = clients * per_client
    return {
        "imgs_per_s": n / wall,
        "wall_s": wall,
        "n": n,
        "lat_p50_ms": float(np.percentile(lat, 50) * 1e3),
        "lat_p95_ms": float(np.percentile(lat, 95) * 1e3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--per-client", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--wait-ms", type=float, default=8.0)
    ap.add_argument("--pipeline-depth", type=int, default=3,
                    help="concurrent in-flight dispatches (ServiceCore "
                         "reads IRT_MICROBATCH_DEPTH)")
    ap.add_argument("--quant", default=None, choices=[None, "dyn-int8"])
    ap.add_argument("--tiny", action="store_true",
                    help="64² generator for CPU sanity runs")
    args = ap.parse_args()

    os.environ["IRT_MICROBATCH_DEPTH"] = str(args.pipeline_depth)
    if args.tiny:
        # CPU sanity must not touch (or hang on) the axon tunnel; the
        # plugin overrides JAX_PLATFORMS, so force cpu post-import
        import jax
        jax.config.update("jax_platforms", "cpu")

    from image_restoration_tpu.infer import Restorer, PRODUCTION_GFPGAN
    from image_restoration_tpu.serve.api import ServiceCore

    net = dict(PRODUCTION_GFPGAN)
    if args.tiny:
        net.update(input_width=64, input_height=64, num_style_feat=16,
                   channel_multiplier=0.25, num_mlp=2, narrow=0.5)
    restorer = Restorer(net, quant=args.quant)
    size = restorer.input_size[0]
    rng = np.random.default_rng(0)
    img_bgr = (rng.random((size, size, 3)) * 255).astype(np.uint8)

    fake_pipe = SimpleNamespace(car_restorer=restorer)
    results = {}
    for label, mb in [("per_request", 0), ("microbatch", args.max_batch)]:
        core = ServiceCore(pipeline=fake_pipe, restorer=restorer,
                           microbatch=mb, microbatch_wait_ms=args.wait_ms)
        core.restore(img_bgr)  # warm the jit caches outside timing
        if core.batcher is not None:
            # warm every bucket the run can hit so compiles stay out of
            # the timed window (buckets are powers of two up to max) —
            # through the batcher's OWN batch_fn and input form, so the
            # warmed graph is exactly the one the run dispatches
            item = core._as_input(np.ascontiguousarray(img_bgr[..., ::-1]))
            for b in core.batcher.buckets:
                core.batcher.batch_fn(np.repeat(item[None], b, 0))
            core.batcher.stats.update(items=0, dispatches=0,
                                      padded_rows=0, batch_hist={})
        results[label] = run_mode(core, img_bgr, args.clients,
                                  args.per_client)
        if core.batcher is not None:
            results[label]["batcher_stats"] = dict(
                core.batcher.stats, batch_hist=dict(
                    core.batcher.stats["batch_hist"]))
            core.batcher.stop()
        print(label, json.dumps(results[label]), flush=True)

    speedup = (results["microbatch"]["imgs_per_s"]
               / results["per_request"]["imgs_per_s"])
    print(json.dumps({"metric": "serve_microbatch_speedup",
                      "value": round(speedup, 3), "unit": "x",
                      "clients": args.clients,
                      "quant": args.quant}), flush=True)

    # the production answer: measured auto-selection (ServiceCore
    # microbatch="auto") — record which regime this link is in and the
    # calibration numbers that decided it
    os.environ["IRT_MICROBATCH_MAX"] = str(args.max_batch)
    auto_core = ServiceCore(pipeline=fake_pipe, restorer=restorer,
                            microbatch="auto",
                            microbatch_wait_ms=args.wait_ms)
    auto = {"selected": "microbatch" if auto_core.batcher is not None
            else "per_request",
            "calibration": auto_core.microbatch_decision}
    if auto_core.batcher is not None:
        auto_core.batcher.stop()
    if auto_core.pipeline_batcher is not None:
        auto_core.pipeline_batcher.stop()
    print("auto", json.dumps(auto), flush=True)
    import jax
    if args.tiny or jax.devices()[0].platform != "tpu":
        print("tiny/non-TPU run — NOT writing microbatch_bench.json "
              "(the artifact carries chip-measured numbers only)",
              file=sys.stderr, flush=True)
        return
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, "microbatch_bench.json")
    with open(path, "w") as f:
        json.dump({"date": time.strftime("%Y-%m-%d"),
                   "clients": args.clients, "per_client": args.per_client,
                   "max_batch": args.max_batch, "wait_ms": args.wait_ms,
                   "pipeline_depth": args.pipeline_depth,
                   "quant": args.quant, "speedup": round(speedup, 3),
                   "auto": auto, "results": results}, f, indent=1)
    print(f"wrote {path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
