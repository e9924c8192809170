#!/usr/bin/env python
"""CLI shim — parity with Car_Plate-Restoration/inference.py.

Usage: python inference.py --input test.jpg [--ckpt net_g.pth] [--arch ...]
"""
from image_restoration_tpu.infer import main

if __name__ == "__main__":
    main()
