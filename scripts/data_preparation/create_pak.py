#!/usr/bin/env python
"""Pack an image folder into a .pak record store (the LMDB replacement).

Parity role: scripts/data_preparation/create_lmdb.py.
Usage: python scripts/data_preparation/create_pak.py --input DIR --output x.pak
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse

from image_restoration_tpu.utils.file_client import make_pak_from_folder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--suffix", nargs="+",
                   default=["png", "jpg", "jpeg", "bmp"])
    args = p.parse_args()
    n = make_pak_from_folder(args.input, args.output, tuple(args.suffix))
    print(f"packed {n} files into {args.output} (+.idx)")


if __name__ == "__main__":
    main()
