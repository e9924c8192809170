#!/usr/bin/env python
"""CLI shim — parity with basicsr/train.py.

Usage: python train.py -opt configs/train_gfpgan_plate_256.yml [--debug]
"""
import os.path as osp

from image_restoration_tpu.train import train_pipeline

if __name__ == "__main__":
    train_pipeline(osp.dirname(osp.abspath(__file__)))
