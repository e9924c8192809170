#!/usr/bin/env python3
"""Generate dataset meta-info lists (ref scripts/data_preparation/
generate_meta_info.py + basicsr/data/meta_info/*).

Formats:
  REDS:      "<clip> <num_frames> (720,1280,3)"  — clips 000..269, 100
             frames each (REDS4 val split: 000/011/015/020).
  Vimeo90K:  "<clip>/<seq> 7 (256,448,3)" — converted from the official
             sep_trainlist.txt / sep_testlist.txt shipped with the dataset.
  folder:    "<name> <shape>" per image in a GT folder (paired datasets).

Usage:
  python generate_meta_info.py reds  --out meta_info_REDS_GT.txt
  python generate_meta_info.py reds4 --out meta_info_REDS4_test_GT.txt
  python generate_meta_info.py vimeo --list sep_trainlist.txt --out ...
  python generate_meta_info.py folder --root datasets/DIV2K/GT_sub --out ...
"""
from __future__ import annotations

import argparse
import os
import sys

REDS4 = ("000", "011", "015", "020")


def gen_reds(out, test_only=False):
    clips = REDS4 if test_only else [f"{i:03d}" for i in range(270)]
    with open(out, "w") as f:
        for c in clips:
            f.write(f"{c} 100 (720,1280,3)\n")
    print(f"{out}: {len(clips)} clips")


def gen_vimeo(list_path, out):
    with open(list_path) as f:
        keys = [line.strip() for line in f if line.strip()]
    with open(out, "w") as f:
        for k in keys:
            f.write(f"{k} 7 (256,448,3)\n")
    print(f"{out}: {len(keys)} septuplets")


def gen_folder(root, out, suffix=("png", "jpg", "jpeg", "bmp")):
    import cv2
    names = sorted(n for n in os.listdir(root)
                   if n.lower().endswith(tuple(suffix)))
    with open(out, "w") as f:
        for n in names:
            img = cv2.imread(os.path.join(root, n))
            h, w = img.shape[:2]
            c = img.shape[2] if img.ndim == 3 else 1
            f.write(f"{n} ({h},{w},{c})\n")
    print(f"{out}: {len(names)} images")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["reds", "reds4", "vimeo", "folder"])
    p.add_argument("--list", help="sep_trainlist.txt for vimeo")
    p.add_argument("--root", help="image folder for kind=folder")
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)
    if a.kind == "reds":
        gen_reds(a.out)
    elif a.kind == "reds4":
        gen_reds(a.out, test_only=True)
    elif a.kind == "vimeo":
        if not a.list:
            sys.exit("--list required for vimeo")
        gen_vimeo(a.list, a.out)
    else:
        if not a.root:
            sys.exit("--root required for folder")
        gen_folder(a.root, a.out)


if __name__ == "__main__":
    main()
