"""RIDNet — real image denoising with feature attention, flax/NHWC.

Parity with basicsr/archs/ridnet_arch.py: MeanShift (:8-28), EResidualBlock
(:31-57), MergeRun dilated dual branch (:59-89), ChannelAttention (:91-107),
EAM (:110-140), RIDNet (:142-199).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import ResidualBlockNoBN, conv_kaiming

Dtype = Any


def _dilated_conv(x, features, dilation, name, module):
    p = dilation
    return nn.Conv(features, (3, 3), padding=((p, p), (p, p)),
                   kernel_dilation=(dilation, dilation), name=name,
                   dtype=module.dtype)(x)


class EResidualBlockNoBN(nn.Module):
    out_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out = conv_kaiming(self.out_channels, 3, name="conv1",
                           dtype=self.dtype)(x)
        out = jax.nn.relu(out)
        out = conv_kaiming(self.out_channels, 3, name="conv2",
                           dtype=self.dtype)(out)
        out = jax.nn.relu(out)
        out = conv_kaiming(self.out_channels, 1, padding=0, name="conv3",
                           dtype=self.dtype)(out)
        return jax.nn.relu(out + x)


class MergeRun(nn.Module):
    out_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b1 = jax.nn.relu(conv_kaiming(self.out_channels, 3, name="d1_conv1",
                                      dtype=self.dtype)(x))
        b1 = jax.nn.relu(_dilated_conv(b1, self.out_channels, 2, "d1_conv2",
                                       self))
        b2 = jax.nn.relu(_dilated_conv(x, self.out_channels, 3, "d2_conv1",
                                       self))
        b2 = jax.nn.relu(_dilated_conv(b2, self.out_channels, 4, "d2_conv2",
                                       self))
        agg = jax.nn.relu(conv_kaiming(self.out_channels, 3, name="agg",
                                       dtype=self.dtype)(
            jnp.concatenate([b1, b2], axis=-1)))
        return agg + x


class RIDChannelAttention(nn.Module):
    squeeze_factor: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = jax.nn.relu(conv_kaiming(c // self.squeeze_factor, 1, padding=0,
                                     name="fc1", dtype=self.dtype)(y))
        y = jax.nn.sigmoid(conv_kaiming(c, 1, padding=0, name="fc2",
                                        dtype=self.dtype)(y))
        return x * y


class EAM(nn.Module):
    mid_channels: int
    out_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out = MergeRun(self.mid_channels, name="merge", dtype=self.dtype)(x)
        out = jax.nn.relu(ResidualBlockNoBN(self.mid_channels, name="block1",
                                            dtype=self.dtype)(out))
        out = EResidualBlockNoBN(self.out_channels, name="block2",
                                 dtype=self.dtype)(out)
        return RIDChannelAttention(name="ca", dtype=self.dtype)(out)


@ARCH_REGISTRY.register()
class RIDNet(nn.Module):
    in_channels: int = 3
    mid_channels: int = 64
    out_channels: int = 3
    num_block: int = 4
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype) * self.img_range
        std = jnp.asarray(self.rgb_std, x.dtype)
        res = (x - mean) / std
        res = jax.nn.relu(conv_kaiming(self.mid_channels, 3, name="head",
                                       dtype=self.dtype)(res))
        for i in range(self.num_block):
            res = EAM(self.mid_channels, self.mid_channels,
                      name=f"body_{i}", dtype=self.dtype)(res)
        res = conv_kaiming(self.out_channels, 3, name="tail",
                           dtype=self.dtype)(res)
        res = res * std + mean
        return x + res
