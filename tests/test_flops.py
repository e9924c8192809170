"""Exact-FLOP counter (utils/flops.py) vs hand-computed shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_tpu.utils.flops import count_flops


def test_matmul():
    a = jnp.zeros((8, 64))
    b = jnp.zeros((64, 32))
    r = count_flops(lambda a, b: a @ b, a, b)
    assert r["total"] == 2 * 8 * 64 * 32
    assert r["matmul"] == r["total"] and r["conv"] == 0


def test_conv_and_groups():
    x = jnp.zeros((2, 16, 16, 8))
    w = jnp.zeros((3, 3, 8, 24))
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    r = count_flops(f, x, w)
    assert r["total"] == 2 * (2 * 16 * 16 * 24) * 8 * 9

    # depthwise: feature_group_count=8, kernel HWIO with I=1
    wd = jnp.zeros((3, 3, 1, 8))
    fd = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=8,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rd = count_flops(fd, x, wd)
    assert rd["total"] == 2 * (2 * 16 * 16 * 8) * 1 * 9


def test_grad_triples_matmul():
    """vjp of x@w (wrt both) = fwd + two matmuls of equal cost."""
    x = jnp.zeros((8, 64))
    w = jnp.zeros((64, 32))
    loss = lambda x, w: jnp.sum(x @ w)
    r = count_flops(jax.grad(loss, argnums=(0, 1)), x, w)
    assert r["total"] == 3 * 2 * 8 * 64 * 32


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16))

    def f(w):
        def body(c, _):
            return c @ w, None
        out, _ = jax.lax.scan(body, jnp.zeros((4, 16)), None, length=10)
        return out
    r = count_flops(f, w)
    assert r["total"] == 10 * 2 * 4 * 16 * 16


def test_cond_takes_max_branch():
    x = jnp.zeros((8, 8))

    def f(x):
        return jax.lax.cond(
            x[0, 0] > 0,
            lambda x: x @ x @ x,   # 2 matmuls
            lambda x: x @ x,       # 1 matmul
            x)
    r = count_flops(f, x)
    assert r["total"] == 2 * (2 * 8 * 8 * 8)
    assert any("cond" in fl for fl in r["flags"])


def test_jit_and_top_shapes():
    a = jnp.zeros((8, 64))
    b = jnp.zeros((64, 32))
    r = count_flops(jax.jit(lambda a, b: a @ b), a, b)
    assert r["total"] == 2 * 8 * 64 * 32
    assert len(r["top_shapes"]) == 1 and "dot_general" in r["top_shapes"][0][0]
