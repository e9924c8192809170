"""Opt-in numerical debugging.

The reference runs torch.autograd.set_detect_anomaly(True) on EVERY
training step (gfpgan_model.py:495) and try/excepts the backward — a
permanent 2× slowdown. Here anomaly detection is an opt-in config switch
(`debug_nans: true` in the YAML, or a context manager), costing nothing
when off (SURVEY §5 aux subsystems).
"""

from __future__ import annotations

import contextlib


def enable_nan_checks(enable: bool = True) -> None:
    """Global jax_debug_nans: jit re-runs op-by-op on NaN and pinpoints it."""
    import jax
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_checks():
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_step(step_fn):
    """Wrap a jitted step with checkify to surface device-side asserts
    (index OOB, NaN) as host errors instead of silent corruption."""
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
