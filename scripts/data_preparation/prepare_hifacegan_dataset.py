#!/usr/bin/env python
"""HiFaceGAN degradation pair synthesis — parity with
scripts/data_preparation/prepare_hifacegan_dataset.py (which wraps imgaug;
imgaug is not a dependency here, so the six degradation templates are
re-implemented with cv2/numpy):

  sr4x    — ×4 area downsample + cubic upsample to 512
  sr4x8x  — random ×4..×8 downsample + cubic upsample
  denoise — additive gaussian / laplace / poisson noise (per-channel)
  deblur  — motion blur k∈[10,20] or gaussian blur σ∈[3,8]
  jpeg    — jpeg quality mapped from compression 50..85
  16x     — 16×16 mosaic (block mean)
  full    — the composition of all of the above (HiFaceGAN 'full' setting)
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os
import os.path as osp

import cv2
import numpy as np

from image_restoration_tpu.utils.misc import scandir


def mosaic_16x(x, rng):
    h, w = x.shape[:2]
    out = x.astype(np.float64)
    for i in range((h + 15) // 16):
        for j in range((w + 15) // 16):
            block = out[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
            block[:] = block.mean(axis=(0, 1))
    return out.astype(np.uint8)


def sr4x(x, rng):
    h, w = x.shape[:2]
    small = cv2.resize(x, (max(w // 4, 1), max(h // 4, 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (512, 512), interpolation=cv2.INTER_CUBIC)


def sr4x8x(x, rng):
    h, w = x.shape[:2]
    f = rng.uniform(0.125, 0.25)
    small = cv2.resize(x, (max(int(w * f), 1), max(int(h * f), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (512, 512), interpolation=cv2.INTER_CUBIC)


def denoise_src(x, rng):
    kind = rng.integers(0, 3)
    xf = x.astype(np.float64)
    if kind == 0:
        scale = rng.uniform(20, 40, 3)
        xf = xf + rng.normal(0, scale, x.shape)
    elif kind == 1:
        scale = rng.uniform(20, 40, 3)
        xf = xf + rng.laplace(0, scale, x.shape)
    else:
        lam = rng.uniform(15, 30, 3)
        xf = xf + rng.poisson(lam, x.shape) * rng.choice([-1, 1], x.shape)
    return np.clip(xf, 0, 255).astype(np.uint8)


def deblur_src(x, rng):
    if rng.integers(0, 2) == 0:
        k = int(rng.integers(10, 21))
        kern = np.zeros((k, k), np.float32)
        kern[k // 2, :] = 1.0
        angle = rng.uniform(0, 360)
        m = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle, 1.0)
        kern = cv2.warpAffine(kern, m, (k, k))
        kern /= max(kern.sum(), 1e-8)
        return cv2.filter2D(x, -1, kern)
    sigma = rng.uniform(3.0, 8.0)
    return cv2.GaussianBlur(x, (0, 0), sigma)


def jpeg_src(x, rng):
    compression = rng.uniform(50, 85)
    quality = int(100 - compression)
    ok, buf = cv2.imencode(".jpg", x,
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    return cv2.imdecode(buf, cv2.IMREAD_COLOR)


TEMPLATES = {
    "sr4x": [sr4x],
    "sr4x8x": [sr4x8x],
    "denoise": [denoise_src],
    "deblur": [deblur_src],
    "jpeg": [jpeg_src],
    "16x": [mosaic_16x],
    "full": [sr4x8x, denoise_src, deblur_src, jpeg_src],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_folder", required=True,
                   help="512² GT images (e.g. FFHQ_512)")
    p.add_argument("--save_folder", required=True)
    p.add_argument("--deg_type", default="sr4x", choices=sorted(TEMPLATES))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.save_folder, exist_ok=True)
    names = sorted(scandir(args.gt_folder, suffix=("png", "jpg", "jpeg")))
    for i, name in enumerate(names):
        img = cv2.imread(osp.join(args.gt_folder, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        for fn in TEMPLATES[args.deg_type]:
            img = fn(img, rng)
        cv2.imwrite(osp.join(args.save_folder, name), img)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(names)}")
    print(f"done: {len(names)} images -> {args.save_folder}")


if __name__ == "__main__":
    main()
