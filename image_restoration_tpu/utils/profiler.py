"""Profiling hooks — the aux-subsystem upgrade over the reference's
wall-clock-only timing (SURVEY §5: train.py per-iter time/data_time).

Wraps jax.profiler: programmatic traces around training windows and an
on-demand profiler server for `tensorboard --logdir` / xprof capture.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional


def start_server(port: int = 9999):
    """Start the profiler server (capture with TensorBoard's PROFILE tab)."""
    import jax
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Trace a window of device work into `log_dir`."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in captured traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def trace_training_window(model, batches, rng, log_dir: str,
                          num_steps: int = 3, start_iter: int = 1):
    """Profile a few optimizer steps (compile excluded by a warmup step)."""
    import jax
    model.optimize_parameters(start_iter, batches[0], rng)  # warmup/compile
    with trace(log_dir):
        for i in range(1, num_steps + 1):
            rng, step = jax.random.split(rng)
            with annotate(f"train_step_{i}"):
                model.optimize_parameters(start_iter + i,
                                          batches[i % len(batches)], step)
    return log_dir
