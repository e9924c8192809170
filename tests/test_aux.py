"""Aux subsystems: debug/nan checks, profiler annotation, dist helpers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_restoration_tpu.utils.debug import nan_checks, checkify_step
from image_restoration_tpu.utils.profiler import annotate
from image_restoration_tpu.utils.dist_util import get_dist_info, master_only


def test_nan_checks_catch():
    with pytest.raises(FloatingPointError):
        with nan_checks():
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # off again afterwards
    out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert np.isnan(float(out))


def test_checkify_step_catches_nan():
    @checkify_step
    def step(x):
        return jnp.log(x)

    assert np.isfinite(float(step(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        step(jnp.asarray(-1.0))


def test_profiler_annotation_noop():
    with annotate("span"):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_dist_helpers():
    rank, world = get_dist_info()
    assert rank == 0 and world == 1

    calls = []

    @master_only
    def record():
        calls.append(1)
        return "done"

    assert record() == "done"
    assert calls == [1]


def test_init_wandb_logger_gated():
    """Ref logger.py:87-106; wandb is optional — absent package must warn,
    not raise."""
    from image_restoration_tpu.utils.logger import init_wandb_logger
    init_wandb_logger({"name": "t",
                       "logger": {"wandb": {"project": "proj"}}})
