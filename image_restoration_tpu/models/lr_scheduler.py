"""LR schedules — parity with basicsr/models/lr_scheduler.py:6-96.

Expressed as pure iter→multiplier functions consumed by optax (the TPU-jit
analog of torch LR schedulers): the whole schedule lives inside the jitted
update, no host-side scheduler.step().
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def multistep_restart_lr(base_lr: float, milestones: Sequence[int],
                         gamma: float = 0.5, restarts: Sequence[int] = (0,),
                         restart_weights: Sequence[float] = (1,),
                         warmup_iter: int = -1):
    """MultiStepRestartLR (ref :6-54) as an optax schedule fn."""
    milestones = sorted(milestones)
    restarts = list(restarts)
    restart_weights = list(restart_weights)

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        # milestone decays
        for m in milestones:
            lr = jnp.where(it >= m, lr * gamma, lr)
        # restarts reset the decay with a weight
        for r, w in zip(restarts, restart_weights):
            if r == 0:
                continue
            lr = jnp.where(it == r, base_lr * w, lr)
        if warmup_iter > 0:
            warm = base_lr * (it + 1) / warmup_iter
            lr = jnp.where(it < warmup_iter, warm, lr)
        return lr

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 1e-7):
    """CosineAnnealingRestartLR (ref :57-96)."""
    assert len(periods) == len(restart_weights)
    cumulative = [sum(periods[:i + 1]) for i in range(len(periods))]

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        prev_end = 0.0
        for period, weight, end in zip(periods, restart_weights, cumulative):
            in_cycle = (it >= prev_end) & (it < end)
            t = (it - prev_end) / period
            cyc = eta_min + weight * 0.5 * (base_lr - eta_min) * \
                (1 + jnp.cos(jnp.pi * t))
            lr = jnp.where(in_cycle, cyc, lr)
            prev_end = end
        return lr

    return schedule


def build_schedule(train_opt: dict, base_lr: float):
    """Build from the YAML `scheduler:` block (type MultiStepLR /
    MultiStepRestartLR / CosineAnnealingRestartLR)."""
    sched = dict(train_opt.get("scheduler", {}) or {})
    stype = sched.pop("type", None)
    warmup = train_opt.get("warmup_iter", -1)
    if stype in ("MultiStepLR", "MultiStepRestartLR"):
        return multistep_restart_lr(
            base_lr, sched.get("milestones", []),
            sched.get("gamma", 0.5), sched.get("restarts", (0,)),
            sched.get("restart_weights", (1,)), warmup)
    if stype == "CosineAnnealingRestartLR":
        return cosine_annealing_restart_lr(
            base_lr, sched["periods"], sched.get("restart_weights", (1,)),
            sched.get("eta_min", 1e-7))
    if stype is None:
        return lambda count: jnp.asarray(base_lr, jnp.float32)
    raise ValueError(f"unknown scheduler type {stype}")
