"""DUF — dynamic upsampling filters video SR, flax / NDHWC.

Parity with basicsr/archs/duf_arch.py: DenseBlocksTemporalReduce (:9-78),
DenseBlocks (:80-136), DynamicUpsamplingFilter (:138-187 — per-pixel 5×5
filters applied to the center frame), DUF (:189-283; 16/28/52-layer
variants).

The per-pixel dynamic filtering is expressed as a shift-stack + einsum
(one MXU contraction) instead of the reference's im2col conv trick.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.pixel_ops import pixel_shuffle

Dtype = Any


def _conv3d(x, features, kernel, name, module, padding=None, use_bias=True):
    """3D conv over (N, T, H, W, C)."""
    if padding is None:
        padding = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(features, kernel, padding=padding, use_bias=use_bias,
                   name=name, dtype=module.dtype)(x)


class _BN(nn.Module):
    """BatchNorm; eps 1e-3 matches the official-weights variant (ref
    duf_arch.py:25-30 — pytorch-default eps 1e-5 when training fresh)."""
    dtype: Dtype = None
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.999,
                            epsilon=self.epsilon, dtype=self.dtype,
                            name="bn")(x)


def dynamic_upsampling_filter(x, filters, filter_size=(5, 5)):
    """Apply per-pixel dynamic filters (ref :138-187).

    x: (N,H,W,3); filters: (N,H,W,K,M) with K=prod(filter_size), M=scale².
    Returns (N,H,W,3·M).
    """
    n, h, w, c = x.shape
    kh, kw = filter_size
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    patches = []
    for dy in range(kh):
        for dx in range(kw):
            patches.append(jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (n, h, w, c)))
    patches = jnp.stack(patches, axis=3)  # (N,H,W,K,3)
    out = jnp.einsum("nhwkc,nhwkm->nhwcm", patches, filters)
    return out.reshape(n, h, w, -1)


class DenseBlocks(nn.Module):
    """(1,1,1)+(3,3,3) conv pairs with channel concat (ref :80-136)."""
    num_block: int
    num_feat: int = 64
    num_grow_ch: int = 16
    bn_eps: float = 1e-3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_block):
            y = _BN(self.dtype, self.bn_eps, name=f"bn1_{i}")(x, train)
            y = jax.nn.relu(y)
            y = _conv3d(y, x.shape[-1], (1, 1, 1), f"conv1_{i}", self)
            y = _BN(self.dtype, self.bn_eps, name=f"bn2_{i}")(y, train)
            y = jax.nn.relu(y)
            y = _conv3d(y, self.num_grow_ch, (3, 3, 3), f"conv2_{i}", self)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class DenseBlocksTemporalReduce(nn.Module):
    """3 dense blocks that shrink T by 2 each (ref :9-78)."""
    num_grow_ch: int = 32
    bn_eps: float = 1e-3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            y = _BN(self.dtype, self.bn_eps, name=f"bn1_{i}")(x, train)
            y = jax.nn.relu(y)
            y = _conv3d(y, x.shape[-1], (1, 1, 1), f"conv1_{i}", self)
            y = _BN(self.dtype, self.bn_eps, name=f"bn2_{i}")(y, train)
            y = jax.nn.relu(y)
            y = _conv3d(y, self.num_grow_ch, (3, 3, 3), f"conv2_{i}", self,
                        padding=((0, 0), (1, 1), (1, 1)))
            x = jnp.concatenate([x[:, 1:-1], y], axis=-1)
        return x


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """DUF (ref :189-283). Input (N,T,H,W,3) with T=7; returns center ×scale.

    `adapt_official_weights` selects BN eps 1e-3 (official TF-converted
    checkpoints) vs the pytorch-default 1e-5 (ref duf_arch.py:25-30,97-102).
    """
    scale: int = 4
    num_layer: int = 52
    adapt_official_weights: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, t, h, w, c = x.shape
        if self.num_layer == 16:
            num_block, num_grow_ch = 3, 32
        elif self.num_layer == 28:
            num_block, num_grow_ch = 9, 16
        else:
            num_block, num_grow_ch = 21, 16
        eps = 1e-3 if self.adapt_official_weights else 1e-5

        x_center = x[:, t // 2]
        feat = _conv3d(x, 64, (1, 3, 3), "conv3d1", self)
        feat = DenseBlocks(num_block, 64, num_grow_ch, bn_eps=eps,
                           name="dense_block1", dtype=self.dtype)(feat, train)
        feat = DenseBlocksTemporalReduce(
            num_grow_ch, bn_eps=eps, name="dense_block2",
            dtype=self.dtype)(feat, train)
        feat = jax.nn.relu(_BN(self.dtype, eps, name="bn3d2")(feat, train))
        feat = jax.nn.relu(_conv3d(feat, 256, (1, 3, 3), "conv3d2", self))

        # residual branch
        res = jax.nn.relu(_conv3d(feat, 256, (1, 1, 1), "conv3d_r1", self))
        res = _conv3d(res, 3 * self.scale ** 2, (1, 1, 1), "conv3d_r2", self)
        # filter branch
        flt = jax.nn.relu(_conv3d(feat, 512, (1, 1, 1), "conv3d_f1", self))
        flt = _conv3d(flt, 25 * self.scale ** 2, (1, 1, 1), "conv3d_f2",
                      self)

        # temporal reduce leaves T' = t - 6 = 1 for t=7
        res = res[:, res.shape[1] // 2]              # (N,H,W,3·s²)
        flt = flt[:, flt.shape[1] // 2]              # (N,H,W,25·s²)
        flt = jax.nn.softmax(
            flt.reshape(n, h, w, 25, self.scale ** 2), axis=3)
        out = dynamic_upsampling_filter(x_center, flt, (5, 5))
        out = out + res
        return pixel_shuffle(out, self.scale)
