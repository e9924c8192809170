"""EDSR — flax/NHWC. Parity with basicsr/archs/edsr_arch.py:9-61."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import conv_kaiming, ResidualBlockNoBN, PixelShuffleUpsample

Dtype = Any


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
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
        for i in range(self.num_block):
            res = ResidualBlockNoBN(self.num_feat, res_scale=self.res_scale,
                                    name=f"body_{i}", dtype=d)(res)
        res = conv_kaiming(self.num_feat, 3, name="conv_after_body",
                           dtype=d)(res)
        res = res + feat
        out = PixelShuffleUpsample(self.upscale, self.num_feat,
                                   name="upsample", dtype=d)(res)
        out = conv_kaiming(self.num_out_ch, 3, name="conv_last", dtype=d)(out)
        return out / self.img_range + mean
