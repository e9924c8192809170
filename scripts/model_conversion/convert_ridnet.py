#!/usr/bin/env python
"""Convert official RIDNet checkpoints to orbax.

Parity role: scripts/model_conversion/convert_ridnet.py (official→BasicSR
key remap) — here the structure-driven importer maps the BasicSR layout
onto the flax tree directly.

Usage:
  python scripts/model_conversion/convert_ridnet.py \
      --ckpt RIDNet.pth --out ckpt_dir
"""
import os.path as _osp
import subprocess
import sys

if __name__ == "__main__":
    root = _osp.abspath(_osp.join(_osp.dirname(__file__), "..", ".."))
    sys.exit(subprocess.call(
        [sys.executable,
         _osp.join(root, "scripts", "model_conversion",
                   "convert_models.py"),
         "--arch", "RIDNet",
         "--config", '{"in_channels":3,"mid_channels":64,"out_channels":3}',
         "--input_hw", "64", "64"] + sys.argv[1:]))
