"""Test pipeline — parity with basicsr/test.py:11-45."""

from __future__ import annotations

import time
from os import path as osp

from .data import build_dataset, build_dataloader
from .models import build_model
from .utils.logger import get_env_info, get_root_logger
from .utils.misc import make_exp_dirs
from .utils.options import dict2str, parse_options


def test_pipeline(root_path: str | None = None, argv=None):
    opt, _ = parse_options(root_path, is_train=False, argv=argv)
    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"],
                        f"test_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    model = build_model(opt)
    results = {}
    for _, dataset_opt in sorted(opt["datasets"].items()):
        dataset = build_dataset(dataset_opt)
        loader = build_dataloader(dataset, dataset_opt)
        name = dataset_opt["name"]
        logger.info(f"Testing {name} ({len(dataset)} images)...")
        if dataset.device_pipeline() is not None:
            model.set_degradation_pipeline(dataset.device_pipeline())
        results[name] = model.validation(
            loader, current_iter=opt["name"], tb_logger=None,
            save_img=opt.get("val", {}).get("save_img", True))
    return results


if __name__ == "__main__":
    test_pipeline(osp.abspath(osp.join(__file__, osp.pardir, osp.pardir)))
