#!/usr/bin/env python
"""LPIPS between a restored folder and its GT folder — parity with
scripts/metrics/calculate_lpips.py (which wraps lpips.LPIPS(net='vgg')).

Images are matched by basename (`<name><suffix><ext>` in --restored),
converted to RGB [-1, 1] like the reference's normalize(mean=std=0.5).
Pass --lpips_weights (lpips vgg.pth lin layers) and --vgg_weights
(torchvision vgg16 state_dict) for calibrated values.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import glob
import os.path as osp

import cv2
import numpy as np

from image_restoration_tpu.metrics.lpips import LPIPS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True, help="folder of GT images")
    p.add_argument("--restored", required=True,
                   help="folder of restored images")
    p.add_argument("--suffix", default="",
                   help="suffix appended to restored basenames")
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--vgg_weights", default=None)
    args = p.parse_args()

    fn = LPIPS(lpips_weights_path=args.lpips_weights,
               vgg_weights_path=args.vgg_weights)
    scores = []
    for i, gt_path in enumerate(sorted(glob.glob(osp.join(args.gt, "*")))):
        base, ext = osp.splitext(osp.basename(gt_path))
        r_path = osp.join(args.restored, base + args.suffix + ext)
        gt = cv2.imread(gt_path, cv2.IMREAD_COLOR)
        restored = cv2.imread(r_path, cv2.IMREAD_COLOR)
        if gt is None or restored is None:
            print(f"skip {base}: unreadable pair")
            continue
        a = gt[..., ::-1].astype(np.float32) / 255.0 * 2 - 1
        b = restored[..., ::-1].astype(np.float32) / 255.0 * 2 - 1
        d = fn(a, b)
        scores.append(d)
        print(f"{i + 1:6d}: {base:25} \tLPIPS: {d:.6f}")
    if scores:
        print(f"Average: LPIPS: {np.mean(scores):.6f}")


if __name__ == "__main__":
    main()
