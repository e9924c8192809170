"""LR schedules — parity with basicsr/models/lr_scheduler.py:6-96.

Expressed as pure iter→lr functions consumed by optax (the TPU-jit analog
of torch LR schedulers): the whole schedule lives inside the jitted update,
no host-side scheduler.step(). The reference schedulers are STATEFUL
(each get_lr mutates from the previous lr); these are their closed forms:

  * MultiStepRestartLR (ref :6-34): lr(it) = base · w_r · gamma^k where
    r is the last restart ≤ it (weight w_r, 1.0 for the implicit restart
    at 0) and k counts milestones in (r, it] with multiplicity — a restart
    wipes earlier decays, later milestones re-accumulate from the restart
    weight, and a milestone coinciding with a restart is swallowed by it
    (the reference returns from the restart branch first).
  * CosineAnnealingRestartLR (ref :57-96): period index is the first i
    with it ≤ cumulative[i] (so the restart takes effect the iteration
    AFTER the boundary — the reference's get_position quirk, kept).
    Past sum(periods) the reference's get_position returns None and
    get_lr raises TypeError; a traced schedule cannot raise on a traced
    iter, so we hold eta_min there (documented deviation).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def multistep_restart_lr(base_lr: float, milestones: Sequence[int],
                         gamma: float = 0.1, restarts: Sequence[int] = (0,),
                         restart_weights: Sequence[float] = (1,),
                         warmup_iter: int = -1):
    """MultiStepRestartLR (ref :6-34) as an optax schedule fn."""
    milestones = list(milestones)  # keep duplicates: gamma^count semantics
    restarts = list(restarts)
    restart_weights = list(restart_weights)
    assert len(restarts) == len(restart_weights), \
        "restarts and their weights do not match."
    if 0 not in restarts:
        restarts = [0] + restarts
        restart_weights = [1.0] + restart_weights

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        # last restart <= it → its weight and position
        w = jnp.asarray(restart_weights[0], jnp.float32)
        r_eff = jnp.asarray(float(restarts[0]), jnp.float32)
        for r, rw in zip(restarts[1:], restart_weights[1:]):
            hit = it >= r
            w = jnp.where(hit, rw, w)
            r_eff = jnp.where(hit, float(r), r_eff)
        # milestones strictly after the governing restart, with multiplicity
        k = jnp.zeros((), jnp.float32)
        for m in milestones:
            k = k + ((it >= m) & (m > r_eff)).astype(jnp.float32)
        lr = base_lr * w * gamma ** k
        if warmup_iter > 0:
            warm = base_lr * (it + 1) / warmup_iter
            lr = jnp.where(it < warmup_iter, warm, lr)
        return lr

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0.0):
    """CosineAnnealingRestartLR (ref :57-96)."""
    assert len(periods) == len(restart_weights), \
        "periods and restart_weights should have the same length."
    cumulative = [sum(periods[:i + 1]) for i in range(len(periods))]

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        # first i with it <= cumulative[i] (ref get_position_from_periods)
        idx = jnp.zeros((), jnp.int32)
        for c in cumulative:
            idx = idx + (it > c).astype(jnp.int32)
        idx = jnp.minimum(idx, len(periods) - 1)
        nearest = jnp.asarray([0.0] + [float(c) for c in cumulative[:-1]],
                              jnp.float32)[idx]
        period = jnp.asarray([float(p) for p in periods], jnp.float32)[idx]
        weight = jnp.asarray(restart_weights, jnp.float32)[idx]
        t = jnp.clip((it - nearest) / period, 0.0, 1.0)
        return eta_min + weight * 0.5 * (base_lr - eta_min) * \
            (1 + jnp.cos(jnp.pi * t))

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
            sched.get("gamma", 0.1), sched.get("restarts", (0,)),
            sched.get("restart_weights", (1,)), warmup)
    if stype == "CosineAnnealingRestartLR":
        return cosine_annealing_restart_lr(
            base_lr, sched["periods"], sched.get("restart_weights", (1,)),
            sched.get("eta_min", 0.0))
    if stype is None:
        return lambda count: jnp.asarray(base_lr, jnp.float32)
    raise ValueError(f"unknown scheduler type {stype}")
