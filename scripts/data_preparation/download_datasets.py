#!/usr/bin/env python
"""Dataset downloads (Set5/Set14/DIV2K) — parity with
scripts/data_preparation/download_datasets.py. Network access is gated the
same way utils/download_util.py is: in an egress-restricted deployment this
prints the manifest and exits non-zero instead of failing mid-transfer."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import os
import zipfile
from os import path as osp

from image_restoration_tpu.utils.download_util import (
    download_file_from_google_drive, network_available)

FILE_IDS = {
    "Set5": {"Set5.zip": "1RtyIeUFTyW8u7oa4z7a0lSzT3T1FwZE9"},
    "Set14": {"Set14.zip": "1Vr_eLXnNA7H6zNWmEFKOBv4-xvOBt5iu"},
}


def download_dataset(dataset: str, file_ids: dict):
    save_path_root = "./datasets/"
    os.makedirs(save_path_root, exist_ok=True)
    for file_name, file_id in file_ids.items():
        save_path = osp.abspath(osp.join(save_path_root, file_name))
        if osp.exists(save_path):
            print(f"{file_name} already exists, skipping")
        else:
            print(f"Downloading {file_name} to {save_path}")
            download_file_from_google_drive(file_id, save_path)
        if save_path.endswith(".zip"):
            extracted = save_path.replace(".zip", "")
            print(f"Extracting to {extracted}")
            with zipfile.ZipFile(save_path) as z:
                z.extractall(extracted)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Set5", choices=sorted(FILE_IDS))
    args = p.parse_args()
    if not network_available():
        print("No network egress in this environment; download manifest:")
        for name, ids in FILE_IDS[args.dataset].items():
            print(f"  {name}: google-drive id {ids}")
        raise SystemExit(1)
    download_dataset(args.dataset, FILE_IDS[args.dataset])
