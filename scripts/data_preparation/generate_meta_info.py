#!/usr/bin/env python
"""Generate a meta_info txt (name + shape per image).

Parity role: scripts/data_preparation/generate_meta_info.py.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os.path as osp

import cv2

from image_restoration_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()
    with open(args.output, "w") as f:
        for rel in sorted(scandir(args.input,
                                  suffix=("png", "jpg", "jpeg"))):
            img = cv2.imread(osp.join(args.input, rel),
                             cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            if img.ndim == 2:
                h, w, c = *img.shape, 1
            else:
                h, w, c = img.shape
            f.write(f"{rel} ({h},{w},{c})\n")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
