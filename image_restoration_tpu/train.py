"""Training pipeline — parity with basicsr/train.py:91-199.

Single process per host (multi-host via jax.distributed.initialize); the
batch is sharded over the data mesh inside the model, XLA emits the gradient
collectives. Degradation synthesis runs on-device inside the jitted step.
"""

from __future__ import annotations

import os
import time
from os import path as osp

import numpy as np
import jax

from .data import build_dataset, build_dataloader
from .models import build_model
from .utils.logger import (AvgTimer, MessageLogger, get_env_info,
                           get_root_logger, init_tb_logger)
from .utils.misc import check_resume, make_exp_dirs, mkdir_and_rename, \
    scandir, set_random_seed
from .utils.options import dict2str, parse_options


def load_resume_state(opt):
    """Auto-resume from the newest checkpoint (ref train.py:68-88)."""
    resume_state_path = None
    if opt.get("auto_resume"):
        state_dir = opt["path"]["models"]
        if osp.isdir(state_dir):
            ckpts = [d for d in os.listdir(state_dir)
                     if d.startswith("ckpt_")]
            if ckpts:
                latest = max(int(c.split("_")[1]) for c in ckpts)
                resume_state_path = osp.join(state_dir, f"ckpt_{latest}")
                opt["path"]["resume_state"] = resume_state_path
    else:
        if opt["path"].get("resume_state"):
            resume_state_path = opt["path"]["resume_state"]
    return resume_state_path


def create_train_val_dataloader(opt, logger):
    """Ref train.py:29-65."""
    train_loader, val_loader = None, None
    train_dataset = None
    num_replicas = jax.process_count()
    rank = jax.process_index()
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            train_dataset = build_dataset(dataset_opt)
            train_loader = build_dataloader(
                train_dataset, dataset_opt, num_replicas=num_replicas,
                rank=rank, seed=opt["manual_seed"])
            logger.info(f"Training set [{dataset_opt['name']}]: "
                        f"{len(train_dataset)} images, "
                        f"{len(train_loader)} iters/epoch")
        elif phase.split("_")[0] == "val":
            val_dataset = build_dataset(dataset_opt)
            val_loader = build_dataloader(val_dataset, dataset_opt)
            logger.info(f"Validation set [{dataset_opt['name']}]: "
                        f"{len(val_dataset)} images")
    return train_loader, val_loader, train_dataset


def train_pipeline(root_path: str | None = None, argv=None):
    opt, args = parse_options(root_path, is_train=True, argv=argv)
    set_random_seed(opt["manual_seed"] + jax.process_index())

    if opt.get("debug_nans"):  # opt-in anomaly detection (SURVEY §5)
        from .utils.debug import enable_nan_checks
        enable_nan_checks(True)

    resume_state_path = load_resume_state(opt)
    if resume_state_path is None and jax.process_index() == 0:
        make_exp_dirs(opt)

    log_file = osp.join(opt["path"]["log"],
                        f"train_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = None
    # wandb must init BEFORE tensorboard for sync_tensorboard to work
    # (ref train.py init_tb_loggers ordering)
    if (opt["logger"].get("wandb") or {}).get("project") is not None:
        from .utils.logger import init_wandb_logger
        init_wandb_logger(opt)
    if opt["logger"].get("use_tb_logger"):
        tb_logger = init_tb_logger(osp.join(opt["path"]["experiments_root"],
                                            "tb_logger"))

    train_loader, val_loader, train_dataset = \
        create_train_val_dataloader(opt, logger)

    model = build_model(opt)
    degrade_fn = train_dataset.device_pipeline()
    if degrade_fn is not None:
        model.set_degradation_pipeline(degrade_fn)

    start_iter = 0
    if resume_state_path:
        check_resume(opt, 0)
        model.resume(resume_state_path)
        start_iter = int(model.state["iter"])
        logger.info(f"Resuming training from iter {start_iter}")

    msg_logger = MessageLogger(opt, start_iter + 1, tb_logger)
    total_iters = int(opt["train"]["total_iter"])
    val_freq = int(opt.get("val", {}).get("val_freq", 0) or 0)
    save_freq = int(opt["logger"].get("save_checkpoint_freq", 0) or 0)
    print_freq = int(opt["logger"].get("print_freq", 100))

    rng = jax.random.PRNGKey(opt["manual_seed"])
    current_iter = start_iter
    epoch = 0
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    logger.info(f"Start training from iter {current_iter}")

    while current_iter < total_iters:
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            data_timer.record()
            if current_iter >= total_iters:
                break
            current_iter += 1
            rng, step_rng = jax.random.split(rng)
            log_vars = model.optimize_parameters(current_iter, batch,
                                                 step_rng)
            iter_timer.record()
            if current_iter % print_freq == 0:
                logs = {"epoch": epoch, "iter": current_iter,
                        "lrs": model.current_learning_rates(current_iter),
                        "time": iter_timer.get_avg_time(),
                        "data_time": data_timer.get_avg_time()}
                logs.update(log_vars)
                msg_logger(logs)
            if save_freq and current_iter % save_freq == 0 and \
                    jax.process_index() == 0:
                model.save(current_iter)
            if val_freq and val_loader is not None and \
                    current_iter % val_freq == 0:
                model.validation(val_loader, current_iter, tb_logger,
                                 opt.get("val", {}).get("save_img", False))
            data_timer.start()
            iter_timer.start()
        epoch += 1

    logger.info("End of training.")
    if jax.process_index() == 0:
        model.save(current_iter)
    if val_loader is not None:
        model.validation(val_loader, current_iter, tb_logger,
                         opt.get("val", {}).get("save_img", False))
    return model


if __name__ == "__main__":
    train_pipeline(osp.abspath(osp.join(__file__, osp.pardir, osp.pardir)))
