#!/usr/bin/env python
"""Extract inception statistics from a registered dataset — parity with
scripts/metrics/calculate_fid_stats_from_datasets.py. Stats are saved as
.npz (mean/cov) consumable by calculate_fid_folder.py/--fid_stats."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import math

import numpy as np

from image_restoration_tpu.data import build_dataset
from image_restoration_tpu.data.loader import DataLoader
from image_restoration_tpu.metrics.fid import (extract_inception_features,
                                               load_patched_inception_v3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_sample", type=int, default=50000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dataroot", type=str, default="datasets/ffhq")
    p.add_argument("--dataset_type", type=str, default="FFHQDataset")
    p.add_argument("--io_backend", type=str, default="disk",
                   choices=("disk", "lmdb", "pak"))
    p.add_argument("--inception_weights", default=None)
    p.add_argument("--save_path", default=None)
    args = p.parse_args()

    opt = {
        "name": "FFHQ",
        "type": args.dataset_type,
        "dataroot_gt": args.dataroot,
        "io_backend": {"type": args.io_backend},
        "use_hflip": False,
        "mean": [0.5, 0.5, 0.5],
        "std": [0.5, 0.5, 0.5],
        "input_width": args.size,
        "input_height": args.size,
    }
    dataset = build_dataset(opt)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        drop_last=False)
    total_batch = math.ceil(args.num_sample / args.batch_size)

    def gen():
        import jax.numpy as jnp
        for idx, data in enumerate(loader):
            if idx >= total_batch:
                break
            yield jnp.asarray(data["gt"])

    extract = load_patched_inception_v3(args.inception_weights)
    features = extract_inception_features(gen(), extract, total_batch)
    features = features[:args.num_sample]
    print(f"Extracted {features.shape[0]} features.")
    mean = np.mean(features, 0)
    cov = np.cov(features, rowvar=False)
    save_path = args.save_path or f"inception_{opt['name']}_{args.size}.npz"
    np.savez(save_path, name=opt["name"], size=args.size, mean=mean, cov=cov)
    print(f"saved stats to {save_path}")


if __name__ == "__main__":
    main()
