#!/usr/bin/env python
"""Crop large images into overlapping sub-images for SR training.

Parity role: scripts/data_preparation/extract_subimages.py (DIV2K-style
480² crops with stride 240).
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os
import os.path as osp

import cv2

from image_restoration_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--crop_size", type=int, default=480)
    p.add_argument("--step", type=int, default=240)
    p.add_argument("--thresh_size", type=int, default=0)
    args = p.parse_args()
    os.makedirs(args.output, exist_ok=True)
    count = 0
    for rel in sorted(scandir(args.input, suffix=("png", "jpg", "jpeg"))):
        img = cv2.imread(osp.join(args.input, rel), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        h, w = img.shape[:2]
        name = osp.splitext(osp.basename(rel))[0]
        idx = 0
        ys = list(range(0, h - args.crop_size + 1, args.step)) or [0]
        xs = list(range(0, w - args.crop_size + 1, args.step)) or [0]
        for y in ys:
            for x in xs:
                crop = img[y:y + args.crop_size, x:x + args.crop_size]
                if min(crop.shape[:2]) < args.thresh_size:
                    continue
                idx += 1
                cv2.imwrite(osp.join(args.output,
                                     f"{name}_s{idx:03d}.png"), crop)
                count += 1
    print(f"wrote {count} sub-images to {args.output}")


if __name__ == "__main__":
    main()
