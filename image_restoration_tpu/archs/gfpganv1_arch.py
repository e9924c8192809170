"""GFPGANv1 (square face variant) + FacialComponentDiscriminator.

Parity with basicsr/archs/gfpganv1_arch.py:229-430: the original square
512² face generator is the rectangle-aware GFPGANv1OCR at ratio 1 (the OCR
file is a generalization of this one), so GFPGANv1 is a thin config front.
FacialComponentDiscriminator (:395-430) is the VGG-style per-component D
(eyes/mouth — here plate characters) that returns intermediate features for
the component style loss (gfpgan_model.py:556-642).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .gfpgan_ocr_arch import GFPGANv1OCR
from .stylegan2_arch import ConvLayer

Dtype = Any


@ARCH_REGISTRY.register()
class GFPGANv1(GFPGANv1OCR):
    """Square-face front: out_size² generator (ref :229-393)."""

    @classmethod
    def from_out_size(cls, out_size: int = 512, **kwargs):
        return cls(input_width=out_size, input_height=out_size, **kwargs)


@ARCH_REGISTRY.register()
class FacialComponentDiscriminator(nn.Module):
    """VGG-style component D returning (logits, feats). Ref :395-430."""
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, return_feats: bool = False):
        d = self.dtype
        feat = ConvLayer(64, 3, downsample=False, use_bias=True,
                         activate=True, name="conv1", dtype=d)(x)
        feat = ConvLayer(128, 3, downsample=True, use_bias=True,
                         activate=True, name="conv2", dtype=d)(feat)
        feat = ConvLayer(128, 3, downsample=False, use_bias=True,
                         activate=True, name="conv3", dtype=d)(feat)
        rlt_feats: List = [feat]
        feat = ConvLayer(256, 3, downsample=True, use_bias=True,
                         activate=True, name="conv4", dtype=d)(feat)
        feat = ConvLayer(256, 3, downsample=False, use_bias=True,
                         activate=True, name="conv5", dtype=d)(feat)
        rlt_feats.append(feat)
        out = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                      name="final_conv", dtype=d)(feat)
        if return_feats:
            return out, rlt_feats
        return out, None
