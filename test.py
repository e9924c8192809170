#!/usr/bin/env python
"""CLI shim — parity with basicsr/test.py.

Usage: python test.py -opt configs/test_*.yml
"""
import os.path as osp

from image_restoration_tpu.test import test_pipeline

if __name__ == "__main__":
    test_pipeline(osp.dirname(osp.abspath(__file__)))
