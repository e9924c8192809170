"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "fake cluster" (SURVEY.md §4): multi-chip sharding
logic is validated on CPU devices; the real TPU is only used by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin re-registers itself over JAX_PLATFORMS; force CPU here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
