#!/usr/bin/env python
"""Folder PSNR/SSIM CLI — parity with scripts/metrics/calculate_psnr_ssim.py."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os.path as osp

import cv2
import numpy as np

from image_restoration_tpu.metrics import calculate_psnr, calculate_ssim
from image_restoration_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True)
    p.add_argument("--restored", required=True)
    p.add_argument("--crop_border", type=int, default=4)
    p.add_argument("--suffix", default="")
    p.add_argument("--test_y_channel", action="store_true")
    args = p.parse_args()

    psnrs, ssims = [], []
    for rel in sorted(scandir(args.gt, suffix=("png", "jpg", "jpeg"))):
        gt = cv2.imread(osp.join(args.gt, rel)).astype(np.float64)
        name, ext = osp.splitext(rel)
        rpath = osp.join(args.restored, name + args.suffix + ext)
        if not osp.exists(rpath):
            rpath = osp.join(args.restored, rel)
        restored = cv2.imread(rpath).astype(np.float64)
        psnr = calculate_psnr(gt, restored, args.crop_border,
                              test_y_channel=args.test_y_channel)
        ssim = calculate_ssim(gt, restored, args.crop_border,
                              test_y_channel=args.test_y_channel)
        psnrs.append(psnr)
        ssims.append(ssim)
        print(f"{rel}: PSNR {psnr:.4f} dB  SSIM {ssim:.4f}")
    print(f"Average PSNR {np.mean(psnrs):.4f} dB  SSIM {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
