#!/usr/bin/env python
"""FID between a folder and reference statistics — parity with
scripts/metrics/calculate_fid_folder.py (+ calculate_fid_stats_from_datasets)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os.path as osp

import cv2
import numpy as np

from image_restoration_tpu.metrics.fid import (calculate_fid,
                                               load_patched_inception_v3)
from image_restoration_tpu.utils.misc import scandir


def folder_features(folder, extract, batch_size=8, size=299):
    import jax.numpy as jnp
    paths = sorted(scandir(folder, suffix=("png", "jpg", "jpeg"),
                           full_path=True))
    feats = []
    for start in range(0, len(paths), batch_size):
        imgs = []
        for path in paths[start:start + batch_size]:
            img = cv2.imread(path)[..., ::-1].astype(np.float32) / 255.0
            imgs.append(cv2.resize(img, (size, size)))
        feats.append(np.asarray(extract(jnp.asarray(np.stack(imgs)))))
    return np.concatenate(feats, 0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True)
    p.add_argument("--fid_stats", help=".npz with mean/cov of the reference "
                                       "set; omit with --folder2 instead")
    p.add_argument("--folder2")
    p.add_argument("--inception_weights", default=None,
                   help="pt_inception .pth to import")
    p.add_argument("--save_stats_to", default=None)
    args = p.parse_args()

    extract = load_patched_inception_v3(args.inception_weights)
    feats = folder_features(args.folder, extract)
    mu1, sigma1 = feats.mean(0), np.cov(feats, rowvar=False)
    if args.save_stats_to:
        np.savez(args.save_stats_to, mean=mu1, cov=sigma1)
        print(f"saved stats to {args.save_stats_to}")
    if args.fid_stats:
        stats = np.load(args.fid_stats)
        mu2, sigma2 = stats["mean"], stats["cov"]
    elif args.folder2:
        feats2 = folder_features(args.folder2, extract)
        mu2, sigma2 = feats2.mean(0), np.cov(feats2, rowvar=False)
    else:
        return
    print(f"FID: {calculate_fid(mu1, sigma1, mu2, sigma2):.4f}")


if __name__ == "__main__":
    main()
