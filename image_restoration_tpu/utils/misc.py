"""Misc utilities — parity with basicsr/utils/misc.py."""

from __future__ import annotations

import os
import random
import time
from os import path as osp

import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed host RNGs (ref misc.py:11-17). Device randomness is explicit
    jax.random keys derived from the config seed."""
    random.seed(seed)
    np.random.seed(seed)


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str) -> None:
    """mkdir; archive an existing dir with a timestamp (ref misc.py:24-36)."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt: dict) -> None:
    """Create experiment directories (ref misc.py:38-50)."""
    path_opt = opt["path"].copy()
    if opt["is_train"]:
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root"))
    for key, path in path_opt.items():
        if ("strict_load" in key or "pretrain_network" in key
                or "resume" in key or "param_key" in key or key == "root"):
            continue
        if isinstance(path, str) and path:
            os.makedirs(path, exist_ok=True)


def scandir(dir_path: str, suffix=None, recursive: bool = False,
            full_path: bool = False):
    """Scan a directory for files (ref misc.py:52-92)."""
    if isinstance(suffix, str):
        suffix = (suffix,)

    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = osp.relpath(entry.path, root)
                if suffix is None or return_path.endswith(tuple(suffix)):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    return _scandir(dir_path, suffix, recursive)


def check_resume(opt: dict, resume_iter: int) -> None:
    """Rewire pretrain paths when resuming (ref misc.py:94-118)."""
    if opt["path"].get("resume_state"):
        networks = [key for key in opt.keys() if key.startswith("network_")]
        flag_pretrain = any(
            opt["path"].get(f"pretrain_{n}") is not None for n in networks)
        if flag_pretrain:
            print("pretrain_network paths will be ignored during resuming.")
        for network in networks:
            name = f"pretrain_{network}"
            basename = network.replace("network_", "")
            if opt["path"].get("ignore_resume_networks") is None or \
                    network not in opt["path"]["ignore_resume_networks"]:
                opt["path"][name] = osp.join(
                    opt["path"]["models"],
                    f"net_{basename}_{resume_iter}.ckpt")


def sizeof_fmt(size: float, suffix: str = "B") -> str:
    for unit in ("", "K", "M", "G", "T", "P", "E", "Z"):
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"
