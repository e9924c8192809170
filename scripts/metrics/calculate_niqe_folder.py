#!/usr/bin/env python
"""Folder NIQE CLI — parity role: the reference's niqe usage in
scripts/metrics."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os.path as osp

import cv2
import numpy as np

from image_restoration_tpu.metrics import calculate_niqe
from image_restoration_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--crop_border", type=int, default=0)
    p.add_argument("--params_path", default=None)
    args = p.parse_args()
    vals = []
    for rel in sorted(scandir(args.input, suffix=("png", "jpg", "jpeg"))):
        img = cv2.imread(osp.join(args.input, rel)).astype(np.float32)
        v = calculate_niqe(img, args.crop_border,
                           params_path=args.params_path)
        vals.append(v)
        print(f"{rel}: NIQE {v:.4f}")
    print(f"Average NIQE {np.mean(vals):.4f}")


if __name__ == "__main__":
    main()
