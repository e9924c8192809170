#!/usr/bin/env python
"""Detector convergence on the real chip: RetinaFace-R18 trained from
random init on the on-device synthetic plate-scene generator
(detect/synth.py), then evaluated FUNCTIONALLY with the production
PlateDetector engine (decode + NMS): mean IoU of the top detection vs
ground truth and detection rate, before vs after training.

Closes the detector half of the training-evidence story: bench_train.py
measured steps/s at the reference's bs=24 budget
(Plate_Detect/Retina-License-Plate/train.py:95-169); this shows the full
trainer loop (anchors → matching → MultiBoxLoss → SGD + step decay →
BatchNorm stats) actually LEARNS to detect, end to end through the same
engine the product pipeline serves.

Tunnel-aware design: batches are generated inside the jitted step, so a
CHUNK-iteration stretch of training is ONE dispatch with only a PRNG key
and a step counter as inputs; per-chunk losses (a few floats) are the
only per-dispatch fetch. Progress prints per chunk so a tunnel death
mid-run cannot lose the measured prefix.

Run on chip:   python scripts/bench_detector_convergence.py
CPU sanity:    python scripts/bench_detector_convergence.py --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")


def iou_xyxy(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def evaluate(detector, state, key, n, size):
    """Functional eval through the serving engine: top-detection IoU vs
    GT and detection rate over n held-out on-device scenes."""
    from image_restoration_tpu.detect.synth import make_batch

    imgs, targets = jax.jit(make_batch, static_argnums=(1, 2))(
        key, n, size)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    boxes, scores, landms, valid = detector._detect(variables, imgs)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    landms, targets = np.asarray(landms), np.asarray(targets)
    ious, lm_errs, hits = [], [], 0
    for i in range(n):
        gt = targets[i, 0, :4]
        if not valid[i, 0]:
            ious.append(0.0)
            continue
        hits += 1
        ious.append(iou_xyxy(boxes[i, 0], gt))
        lm_errs.append(float(np.abs(landms[i, 0] - targets[i, 0, 4:14])
                             .mean()))
    return {"mean_iou": round(float(np.mean(ious)), 4),
            "det_rate": round(hits / n, 4),
            "mean_landmark_err": (round(float(np.mean(lm_errs)), 4)
                                  if lm_errs else None)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--bs", type=int, default=24,
                    help="reference budget (train.py:24 cfg batch_size)")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--eval-n", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="64² / 60 iters CPU sanity; no artifact write")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.iters, args.bs, args.size, args.chunk = 60, 8, 64, 20
        args.eval_n = 8

    from bench import guard_backend, log
    n_chunks = max(1, args.iters // args.chunk)
    if n_chunks * args.chunk != args.iters:
        # train exactly what we record: round to whole chunks
        log(f"iters {args.iters} → {n_chunks * args.chunk} "
            f"(whole {args.chunk}-iter chunks)")
        args.iters = n_chunks * args.chunk
    guard_backend()
    log(f"devices: {jax.devices()}")

    from image_restoration_tpu.detect.engine import PlateDetector, BGR_MEAN
    from image_restoration_tpu.detect.synth import make_batch
    from image_restoration_tpu.detect.train import DetectorTrainer

    trainer = DetectorTrainer(backbone="Resnet18", image_size=args.size,
                              decay_steps=(int(args.iters * 0.7),))
    detector = PlateDetector(backbone="Resnet18", image_size=args.size)
    state = dict(trainer.state, step=jnp.asarray(0))
    mean = jnp.asarray(BGR_MEAN, jnp.float32)
    key = jax.random.PRNGKey(0)

    base = evaluate(detector, state, jax.random.PRNGKey(99), args.eval_n,
                    args.size)
    log(f"random-init eval: {base}")

    step_fn = trainer._train_step

    @jax.jit
    def run_chunk(state, key, step0):
        def body(st, i):
            k = jax.random.fold_in(key, step0 + i)
            imgs, tgts = make_batch(k, args.bs, args.size)
            # the engine preprocess is x - BGR_MEAN (engine.py:55); train
            # on identically preprocessed inputs
            st, losses = step_fn(st, imgs - mean, tgts)
            return st, losses["loss"]
        return jax.lax.scan(body, state, jnp.arange(args.chunk))

    losses_all = []
    t_train = 0.0
    for c in range(n_chunks):
        t0 = time.perf_counter()
        state, losses = run_chunk(state, key, jnp.asarray(c * args.chunk))
        losses = np.asarray(losses)  # fetch: chunk floats
        dt = time.perf_counter() - t0
        if c > 0:  # first chunk pays the compile
            t_train += dt
        losses_all.append(losses)
        log(f"chunk {c + 1}/{n_chunks}: iters {c * args.chunk}-"
            f"{(c + 1) * args.chunk}, loss {losses[0]:.3f} → "
            f"{losses[-1]:.3f} ({dt:.1f}s)")
    losses_all = np.concatenate(losses_all)

    final = evaluate(detector, state, jax.random.PRNGKey(99), args.eval_n,
                     args.size)
    log(f"trained eval ({args.iters} iters): {final}")
    steps_per_s = ((n_chunks - 1) * args.chunk / t_train
                   if n_chunks > 1 and t_train > 0 else None)

    out = {
        "date": time.strftime("%Y-%m-%d"),
        "backbone": "Resnet18", "image_size": args.size,
        "iters": args.iters, "bs": args.bs,
        "data": "on-device synthetic plate scenes (detect/synth.py)",
        "loss_first10": [round(float(v), 3) for v in losses_all[:10]],
        "loss_curve_every50": [round(float(v), 3)
                               for v in losses_all[::50]],
        "loss_final": round(float(losses_all[-1]), 4),
        "eval_random_init": base,
        "eval_trained": final,
        "post_compile_steps_per_s": (round(steps_per_s, 1)
                                     if steps_per_s else None),
    }
    print(json.dumps({"metric": "detector_convergence_mean_iou",
                      "value": final["mean_iou"],
                      "unit": "IoU@top1", "iters": args.iters}),
          flush=True)
    if args.tiny or jax.devices()[0].platform != "tpu":
        log("non-TPU/tiny run — NOT writing detector_convergence.json")
        return
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, "detector_convergence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
