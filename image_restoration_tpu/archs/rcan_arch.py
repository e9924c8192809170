"""RCAN (channel-attention SR) — flax/NHWC.

Parity with basicsr/archs/rcan_arch.py: ChannelAttention (:8), RCAB (:27),
ResidualGroup (:49), RCAN (:72).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import conv_kaiming, PixelShuffleUpsample

Dtype = Any


class ChannelAttention(nn.Module):
    squeeze_factor: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv_kaiming(c // self.squeeze_factor, 1, padding=0,
                         name="fc1", dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = conv_kaiming(c, 1, padding=0, name="fc2", dtype=self.dtype)(y)
        return x * jax.nn.sigmoid(y)


class RCAB(nn.Module):
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        res = conv_kaiming(self.num_feat, 3, name="conv1", dtype=self.dtype)(x)
        res = jax.nn.relu(res)
        res = conv_kaiming(self.num_feat, 3, name="conv2",
                           dtype=self.dtype)(res)
        res = ChannelAttention(self.squeeze_factor, name="attention",
                               dtype=self.dtype)(res)
        return x + res * self.res_scale


class ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.num_block):
            res = RCAB(self.num_feat, self.squeeze_factor, self.res_scale,
                       name=f"rcab_{i}", dtype=self.dtype)(res)
        res = conv_kaiming(self.num_feat, 3, name="conv", dtype=self.dtype)(res)
        return x + res


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        x = (x - mean) * self.img_range
        feat = conv_kaiming(self.num_feat, 3, name="conv_first", dtype=d)(x)
        res = feat
        for i in range(self.num_group):
            res = ResidualGroup(self.num_feat, self.num_block,
                                self.squeeze_factor, self.res_scale,
                                name=f"group_{i}", dtype=d)(res)
        res = conv_kaiming(self.num_feat, 3, name="conv_after_body",
                           dtype=d)(res)
        res = res + feat
        out = PixelShuffleUpsample(self.upscale, self.num_feat,
                                   name="upsample", dtype=d)(res)
        out = conv_kaiming(self.num_out_ch, 3, name="conv_last", dtype=d)(out)
        return out / self.img_range + mean
