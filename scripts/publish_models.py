#!/usr/bin/env python
"""Stamp checkpoints with a content hash for publishing.

Parity role: scripts/publish_models.py (sha-suffixed ckpt names).
"""

import argparse
import hashlib
import os
import os.path as osp


def hash_tree(path: str) -> str:
    h = hashlib.sha256()
    if osp.isfile(path):
        h.update(open(path, "rb").read())
    else:
        for root, _, files in os.walk(path):
            for f in sorted(files):
                h.update(open(osp.join(root, f), "rb").read())
    return h.hexdigest()[:8]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="+")
    args = p.parse_args()
    for path in args.paths:
        digest = hash_tree(path)
        base = path.rstrip("/")
        new = f"{base}-{digest}"
        os.rename(base, new)
        print(f"{base} → {new}")


if __name__ == "__main__":
    main()
