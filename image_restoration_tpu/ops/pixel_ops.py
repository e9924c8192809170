"""Pixel shuffle / unshuffle for NHWC tensors.

Replaces torch.nn.functional.pixel_shuffle and the reference
`pixel_unshuffle` (Car_Plate-Restoration/basicsr/archs/arch_util.py:185-201).
Pure reshape/transpose — XLA folds these into surrounding convs' layouts.

Channel ordering matches torch exactly so imported weights are bit-compatible:
torch pixel_shuffle treats NCHW channels as (C, r, r) blocks; in NHWC we
reshape the last axis as (C, r, r) and interleave.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """(N, H, W, C*r^2) → (N, H*r, W*r, C); torch-compatible channel order."""
    n, h, w, c = x.shape
    r = scale
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, oc
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jax.Array, scale: int) -> jax.Array:
    """(N, H*r, W*r, C) → (N, H, W, C*r^2); inverse of pixel_shuffle."""
    n, hh, ww, c = x.shape
    r = scale
    h, w = hh // r, ww // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, r, r
    return x.reshape(n, h, w, c * r * r)
