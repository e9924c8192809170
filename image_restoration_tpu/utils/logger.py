"""Logging — parity with basicsr/utils/logger.py.

MessageLogger (:10-77): formatted iter/lr/eta/loss lines + TensorBoard
scalars. Root logger (:108-147) is process-0-only at INFO (other hosts log
errors only). The reference's rank gating on torch.distributed becomes
jax.process_index().
"""

from __future__ import annotations

import datetime
import logging
import time

initialized_logger = {}


class AvgTimer:
    """Wall-clock timer with running average (detector utils/timer.py analog)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.current_time = 0.0
        self.total_time = 0.0
        self.count = 0
        self.avg_time = 0.0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """Format training log lines + push scalars to TensorBoard.

    Ref logger.py:10-77 — same line format:
    [name..][epoch, iter, lr] [eta, time, data_time] losses
    """

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        self.interval = opt["logger"]["print_freq"]
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.use_tb_logger = opt["logger"].get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self):
        self.start_time = time.time()

    def __call__(self, log_vars: dict):
        epoch = log_vars.pop("epoch")
        current_iter = log_vars.pop("iter")
        lrs = log_vars.pop("lrs")

        message = (f"[{self.exp_name[:5]}..][epoch:{epoch:3d}, "
                   f"iter:{current_iter:8,d}, lr:(")
        for v in lrs:
            message += f"{v:.3e},"
        message += ")] "

        if "time" in log_vars.keys():
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time")
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[eta: {eta_str}, "
            message += f"time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None:
                label = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(label, v, current_iter)
        self.logger.info(message)


def init_wandb_logger(opt: dict):
    """W&B run init, used to sync the tensorboard log (ref
    logger.py:87-106). Rank-0 only; no-op with a warning when the wandb
    package is not installed (it is an optional dependency here too)."""
    import jax
    if jax.process_index() != 0:
        return
    logger = get_root_logger()
    try:
        import wandb
    except ImportError:
        logger.warning("wandb is not installed; skipping wandb logging "
                       "(logger.wandb.project is set in the config)")
        return
    project = opt["logger"]["wandb"]["project"]
    resume_id = opt["logger"]["wandb"].get("resume_id")
    if resume_id:
        wandb_id = resume_id
        resume = "allow"
        logger.warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id = wandb.util.generate_id()
        resume = "never"
    wandb.init(id=wandb_id, resume=resume, name=opt["name"], config=opt,
               project=project, sync_tensorboard=True)
    logger.info(f"Use wandb logger with id={wandb_id}; project={project}.")


def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            return None
    return SummaryWriter(log_dir=log_dir)


def get_root_logger(logger_name: str = "image_restoration_tpu",
                    log_level: int = logging.INFO,
                    log_file: str | None = None) -> logging.Logger:
    """Process-aware root logger (ref logger.py:108-147)."""
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_logger:
        return logger
    format_str = "%(asctime)s %(levelname)s: %(message)s"
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str))
    logger.addHandler(stream_handler)
    logger.propagate = False

    try:
        import jax
        process_index = jax.process_index()
    except Exception:
        process_index = 0
    if process_index != 0:
        logger.setLevel("ERROR")
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            file_handler = logging.FileHandler(log_file, "w")
            file_handler.setFormatter(logging.Formatter(format_str))
            file_handler.setLevel(log_level)
            logger.addHandler(file_handler)
    initialized_logger[logger_name] = True
    return logger


def get_env_info() -> str:
    import jax
    import flax
    import image_restoration_tpu
    msg = ("\nFramework: image_restoration_tpu "
           f"{image_restoration_tpu.__version__}"
           f"\n\tJAX: {jax.__version__}"
           f"\n\tflax: {flax.__version__}"
           f"\n\tdevices: {jax.devices()}")
    return msg
