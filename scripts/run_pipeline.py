#!/usr/bin/env python
"""Offline batch CLI for the full product pipeline.

Runs detect → crop/mask/pad → restore plate + car → perspective
paste-back (the /Vehicle_Resolution_GFPGAN/ body —
Car_Plate-Restoration/api_plate_oto.py:404-489, which the reference only
exposes as an HTTP endpoint) over a folder/glob of images, batched and
pipelined through PlatePipeline.process_batch (detector at bs=chunk, one
fused 2N-image restore dispatch per chunk, host stages thread-parallel).

Usage:
    python scripts/run_pipeline.py --input 'test_images/*.jpg' --output out/
        [--chunk 8] [--workers 4] [--bf16]
        [--detector-ckpt D] [--plate-ckpt P] [--car-ckpt C]
        [--save montage,pasted]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import cv2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SAVEABLE = ("montage", "pasted", "plate_restored", "car_restored",
             "crop", "crop_padded", "transform", "input")


def main(argv=None, pipeline=None):
    p = argparse.ArgumentParser(description="batch product pipeline")
    p.add_argument("--input", required=True, help="image file or glob")
    p.add_argument("--output", default="pipeline_out")
    p.add_argument("--chunk", type=int, default=8,
                   help="images per device dispatch")
    p.add_argument("--workers", type=int, default=4,
                   help="host OpenCV threads")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--detector-ckpt", default=None)
    p.add_argument("--plate-ckpt", default=None)
    p.add_argument("--car-ckpt", default=None)
    p.add_argument("--save", default="montage,pasted",
                   help=f"comma-set of outputs to write, from {_SAVEABLE}")
    args = p.parse_args(argv)

    keys = [k.strip() for k in args.save.split(",") if k.strip()]
    bad = [k for k in keys if k not in _SAVEABLE]
    if bad:
        p.error(f"--save {bad} not in {_SAVEABLE}")

    paths = sorted(glob.glob(args.input))
    if not paths:
        raise FileNotFoundError(args.input)

    if pipeline is None:
        import jax.numpy as jnp
        from image_restoration_tpu.serve.pipeline import PlatePipeline
        pipeline = PlatePipeline(detector_ckpt=args.detector_ckpt,
                                 plate_ckpt=args.plate_ckpt,
                                 car_ckpt=args.car_ckpt,
                                 dtype=jnp.bfloat16 if args.bf16 else None)

    imgs = [cv2.imread(pth) for pth in paths]
    missing = [pth for pth, im in zip(paths, imgs) if im is None]
    if missing:
        raise FileNotFoundError(f"unreadable image(s): {missing[:5]}")

    os.makedirs(args.output, exist_ok=True)
    t0 = time.time()
    results = pipeline.process_batch(imgs, chunk_size=args.chunk,
                                     host_workers=args.workers)
    wall = time.time() - t0

    detected = 0
    for pth, res in zip(paths, results):
        name = os.path.splitext(os.path.basename(pth))[0]
        detected += bool(res["detected"])
        for k in keys:
            cv2.imwrite(os.path.join(args.output, f"{name}_{k}.png"),
                        res[k])
    print(f"{len(paths)} images in {wall:.2f}s "
          f"({wall / len(paths) * 1e3:.1f} ms/img incl. compile), "
          f"{detected} plates detected -> {args.output}", flush=True)
    return results


if __name__ == "__main__":
    main()
