"""MSRResNet (modified SRResNet) — flax/NHWC.

Parity with Car_Plate-Restoration/basicsr/archs/srresnet_arch.py:9-68:
conv_first → 16×ResidualBlockNoBN → pixel-shuffle upsample (×2 stages or ×3)
→ conv_hr → conv_last, plus a bilinear-upsampled global skip. LeakyReLU 0.1.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.pixel_ops import pixel_shuffle
from ..ops.resize import resize
from .arch_util import conv_kaiming, ResidualBlockNoBN

Dtype = Any


def _lrelu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * slope)


@ARCH_REGISTRY.register()
class MSRResNet(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        feat = _lrelu(conv_kaiming(self.num_feat, 3, name="conv_first",
                                   dtype=d)(x))
        out = feat
        for i in range(self.num_block):
            out = ResidualBlockNoBN(self.num_feat, name=f"body_{i}",
                                    dtype=d)(out)
        if self.upscale in (2, 3):
            out = conv_kaiming(self.num_feat * self.upscale ** 2, 3,
                               name="upconv1", dtype=d)(out)
            out = _lrelu(pixel_shuffle(out, self.upscale))
        elif self.upscale == 4:
            out = conv_kaiming(self.num_feat * 4, 3, name="upconv1",
                               dtype=d)(out)
            out = _lrelu(pixel_shuffle(out, 2))
            out = conv_kaiming(self.num_feat * 4, 3, name="upconv2",
                               dtype=d)(out)
            out = _lrelu(pixel_shuffle(out, 2))
        out = _lrelu(conv_kaiming(self.num_feat, 3, name="conv_hr",
                                  dtype=d)(out))
        out = conv_kaiming(self.num_out_ch, 3, name="conv_last", dtype=d)(out)
        h, w = x.shape[1], x.shape[2]
        base = resize(x, (h * self.upscale, w * self.upscale), "bilinear")
        return out + base
