#!/usr/bin/env python
"""Regroup REDS train/val — parity with scripts/data_preparation/
regroup_reds_dataset.py: merge the 30 validation clips into the train
folder as indices 240-269 (reds datasets re-split validation by name)."""

import argparse
import glob
import os
import shutil


def regroup_reds_dataset(train_path: str, val_path: str):
    for folder in sorted(glob.glob(os.path.join(val_path, "*"))):
        if not os.path.isdir(folder):
            continue
        new_idx = int(os.path.basename(folder)) + 240
        dst = os.path.join(train_path, f"{new_idx:03d}")
        print(f"{folder} -> {dst}")
        shutil.copytree(folder, dst, dirs_exist_ok=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="datasets/REDS")
    args = p.parse_args()
    regroup_reds_dataset(os.path.join(args.root, "train_sharp"),
                         os.path.join(args.root, "val_sharp"))
    regroup_reds_dataset(
        os.path.join(args.root, "train_sharp_bicubic/X4"),
        os.path.join(args.root, "val_sharp_bicubic/X4"))
