"""ArcFace IResNet embedding backbone (identity-loss network).

The reference wires an identity loss through `network_identity`
(basicsr/models/gfpgan_model.py:185-205 builds it, :645-657 applies it:
L1 between arcface embeddings of the restored output and the gt, gt
branch detached, inputs bilinear-resized to 112² and clamped to (−1,1)).
That code path is BROKEN upstream — `backbones.iresnet18` at :198
references a module that is never imported and does not exist anywhere in
the reference tree, so enabling `network_identity` crashes (which is why
every shipped config comments it out). This is the working TPU-native
equivalent of the evident intent: the standard ArcFace iresnet
architecture, eval-only, with BatchNorm folded into per-channel
scale/shift constants (the net is always frozen — ref :203-205 — so
running statistics are compile-time constants, not state).

Weight import from the standard insightface `iresnet18` state_dict layout
is provided by convert/iresnet_import.py (BN folding + NCHW→NHWC fc
permutation).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY

Dtype = Any


class FoldedBN(nn.Module):
    """Eval-mode BatchNorm as an affine: y = x·scale + shift where
    scale = γ/√(running_var+ε) and shift = β − running_mean·scale."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        shift = self.param("shift", nn.initializers.zeros, (c,))
        return x * scale + shift


def _prelu(module, x, name):
    alpha = module.param(name, nn.initializers.constant(0.25),
                         (x.shape[-1],))
    return jnp.where(x >= 0, x, x * alpha)


class IBasicBlock(nn.Module):
    """bn1 → conv3×3 → bn2 → prelu → conv3×3(stride) → bn3, + shortcut."""
    planes: int
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out = FoldedBN(name="bn1")(x)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv1")(out)
        out = FoldedBN(name="bn2")(out)
        out = _prelu(self, out, "prelu")
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FoldedBN(name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = FoldedBN(name="downsample_bn")(x)
        return out + x


@ARCH_REGISTRY.register()
class IResNet(nn.Module):
    """ArcFace IResNet; input (N,112,112,3) in (−1,1) → (N, num_features)."""
    layers: Sequence[int] = (2, 2, 2, 2)
    num_features: int = 512
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = FoldedBN(name="bn1")(h)
        h = _prelu(self, h, "prelu")
        planes = 64
        for li, blocks in enumerate(self.layers):
            planes = 64 * 2 ** li
            for bi in range(blocks):
                h = IBasicBlock(planes, stride=2 if bi == 0 else 1,
                                dtype=self.dtype,
                                name=f"layer{li + 1}_{bi}")(h)
        h = FoldedBN(name="bn2")(h)
        # torch flattens NCHW → (N, C·H·W); we flatten NHWC. The importer
        # permutes the fc input dim so imported weights match this order.
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.num_features, dtype=self.dtype, name="fc")(h)
        return FoldedBN(name="features")(h)


@ARCH_REGISTRY.register()
def IResNet18(**kw) -> IResNet:
    return IResNet(layers=(2, 2, 2, 2), **kw)


@ARCH_REGISTRY.register()
def IResNet34(**kw) -> IResNet:
    return IResNet(layers=(3, 4, 6, 3), **kw)


@ARCH_REGISTRY.register()
def IResNet50(**kw) -> IResNet:
    return IResNet(layers=(3, 4, 14, 3), **kw)
