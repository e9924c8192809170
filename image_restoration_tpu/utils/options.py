"""YAML config system — parity with basicsr/utils/options.py:37-150.

Same YAML schema as the reference (`type:`-dispatched registries, datasets/
network_g/train/val/path sections) so reference configs port 1:1. Instead of
NCCL launcher flags, `num_devices` controls the JAX data-parallel mesh.
"""

from __future__ import annotations

import argparse
import os
import random
from collections import OrderedDict
from os import path as osp

import yaml


def ordered_yaml():
    """Ordered yaml loader/dumper pair (ref options.py:12-34)."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def dict2str(opt, indent_level=1):
    """Pretty-print a nested config (ref options.py:98-116)."""
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":["
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + f"{k}: {v}\n"
    return msg


def parse(opt_path: str, root_path: str | None = None,
          is_train: bool = True) -> dict:
    """Load + expand a config (ref options.py:37-95)."""
    with open(opt_path, "r") as f:
        opt = yaml.load(f, Loader=ordered_yaml()[0])
    opt = dict(opt)
    opt["is_train"] = is_train

    # datasets: inject phase/scale
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
        # the reference option zoo spells hflip as `use_flip`
        if "use_flip" in dataset and "use_hflip" not in dataset:
            dataset["use_hflip"] = dataset["use_flip"]
        for key in ("dataroot_gt", "dataroot_lq"):
            if dataset.get(key) is not None:
                dataset[key] = osp.expanduser(dataset[key])

    # paths
    root_path = root_path or os.getcwd()
    opt.setdefault("path", {})
    for key, val in opt["path"].items():
        if val and ("resume_state" in key or "pretrain_network" in key
                    or "param_key" in key or "strict_load" in key):
            continue
        if isinstance(val, str):
            opt["path"][key] = osp.expanduser(val)
    opt["path"]["root"] = root_path
    if is_train:
        experiments_root = osp.join(root_path, "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_states"] = osp.join(experiments_root,
                                                  "training_states")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = osp.join(experiments_root,
                                                "visualization")
        # debug mode: tiny frequencies (ref options.py:84-88)
        if "debug" in opt["name"]:
            if "val" in opt:
                opt["val"]["val_freq"] = 8
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(root_path, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = osp.join(results_root,
                                                "visualization")
    return opt


def parse_options(root_path: str | None = None, is_train: bool = True,
                  argv=None):
    """CLI entry (ref options.py:119-150). Returns (opt, args)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to option YAML file.")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--force_yml", nargs="+", default=None,
                        help="e.g. train:total_iter=100")
    args = parser.parse_args(argv)

    opt = parse(args.opt, root_path=root_path, is_train=is_train)
    opt["auto_resume"] = args.auto_resume

    if args.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]
        # re-expand paths with the debug name
        opt = parse(args.opt, root_path=root_path, is_train=is_train)
        opt["name"] = "debug_" + opt["name"]
        opt["auto_resume"] = args.auto_resume
        if "val" in opt:
            opt["val"]["val_freq"] = 8
        if "logger" in opt:
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8

    # force yml overrides (ref options.py:158-172)
    if args.force_yml is not None:
        for entry in args.force_yml:
            keys, value = entry.split("=")
            keys, value = keys.strip(), value.strip()
            value = yaml.safe_load(value)
            eval_str = "opt"
            for key in keys.split(":"):
                eval_str += f'["{key}"]'
            exec(f"{eval_str} = value")

    # seed
    seed = opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed
    return opt, args
