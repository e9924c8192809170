"""InceptionV3 (FID variant) — flax/NHWC.

Parity with basicsr/archs/inception.py:17-307 (the pt_inception FID port):
the standard torchvision InceptionV3 block layout (A/B/C/D/E) with the FID
pooling patches — the pool branch of A/C/E_1 is a TensorFlow-style average
pool that EXCLUDES the zero padding from its divisor
(count_include_pad=False, ref inception.py:205-208,230-233,262-265) and
the second E block (Mixed_7c) uses a MAX pool there
(ref inception.py:295-300) — and the FID pooled 2048-d feature output.
Weights import from a torchvision/pt_inception state_dict .pth via the
generic converter; architecture golden vs the reference torch net at
random imported weights in tests/test_inception_golden.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.resize import resize

Dtype = Any


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: Sequence[int] = (3, 3)
    stride: int = 1
    padding: Sequence = ((0, 0), (0, 0))
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, tuple(self.kernel_size),
                    (self.stride, self.stride), padding=tuple(self.padding),
                    use_bias=False, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn", dtype=self.dtype)(x)
        return jax.nn.relu(x)


def _pad(k):
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1",
                         dtype=self.dtype)(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=_pad((5, 5)),
                         name="branch5x5_2", dtype=self.dtype)(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)),
                         name="branch3x3dbl_2", dtype=self.dtype)(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)),
                         name="branch3x3dbl_3", dtype=self.dtype)(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(96, (3, 3), padding=_pad((3, 3)),
                         name="branch3x3dbl_2", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3",
                         dtype=self.dtype)(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1",
                         dtype=self.dtype)(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)),
                         name="branch7x7_2", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)),
                         name="branch7x7_3", dtype=self.dtype)(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)),
                         name="branch7x7dbl_2", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)),
                         name="branch7x7dbl_3", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)),
                         name="branch7x7dbl_4", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=_pad((1, 7)),
                         name="branch7x7dbl_5", dtype=self.dtype)(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1",
                         dtype=self.dtype)(x, train)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2",
                         dtype=self.dtype)(b3, train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1",
                         dtype=self.dtype)(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((1, 7)),
                         name="branch7x7x3_2", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)),
                         name="branch7x7x3_3", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4",
                         dtype=self.dtype)(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # FIDInceptionE_2 (Mixed_7c) uses a max pool in the pool branch
    # (ref inception.py:295-300); E_1 (Mixed_7b) the TF-style avg pool.
    pool_max: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1",
                         dtype=self.dtype)(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((1, 3)),
                          name="branch3x3_2a", dtype=self.dtype)(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((3, 1)),
                          name="branch3x3_2b", dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(384, (3, 3), padding=_pad((3, 3)),
                         name="branch3x3dbl_2", dtype=self.dtype)(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=_pad((1, 3)),
                          name="branch3x3dbl_3a", dtype=self.dtype)(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((3, 1)),
                          name="branch3x3dbl_3b", dtype=self.dtype)(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_max:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)),
                             count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@ARCH_REGISTRY.register()
class InceptionV3(nn.Module):
    """FID feature extractor: input NHWC RGB in [0,1], resized to 299²,
    scaled to (−1,1); returns pooled 2048-d features."""
    resize_input: bool = True
    normalize_input: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.resize_input:
            x = resize(x, (299, 299), "bilinear")
        if self.normalize_input:
            x = 2 * x - 1
        d = self.dtype
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3",
                        dtype=d)(x, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=d)(x, train)
        x = BasicConv2d(64, (3, 3), padding=_pad((3, 3)),
                        name="Conv2d_2b_3x3", dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=d)(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b", dtype=d)(x, train)
        x = InceptionA(64, name="Mixed_5c", dtype=d)(x, train)
        x = InceptionA(64, name="Mixed_5d", dtype=d)(x, train)
        x = InceptionB(name="Mixed_6a", dtype=d)(x, train)
        x = InceptionC(128, name="Mixed_6b", dtype=d)(x, train)
        x = InceptionC(160, name="Mixed_6c", dtype=d)(x, train)
        x = InceptionC(160, name="Mixed_6d", dtype=d)(x, train)
        x = InceptionC(192, name="Mixed_6e", dtype=d)(x, train)
        x = InceptionD(name="Mixed_7a", dtype=d)(x, train)
        x = InceptionE(name="Mixed_7b", dtype=d)(x, train)
        x = InceptionE(pool_max=True, name="Mixed_7c", dtype=d)(x, train)
        return jnp.mean(x, axis=(1, 2))  # (N, 2048)
