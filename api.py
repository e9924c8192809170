#!/usr/bin/env python
"""Serving shim — parity with Car_Plate-Restoration/api.py (restoration-only
server; /Restore/ returns the restored JPEG stream).

Usage: python api.py [--port 8000]
"""
import argparse

from image_restoration_tpu.serve.api import run_server

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args()
    run_server(args.host, args.port)
