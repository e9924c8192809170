"""SpyNet optical flow — flax/NHWC.

Parity with basicsr/archs/spynet_arch.py:29-110: 6-level coarse-to-fine
pyramid, each level a 5-conv (7×7) BasicModule refining a ×2-upsampled flow;
ImageNet-normalized inputs; final flow rescaled to the original size.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.resize import resize
from .arch_util import flow_warp

Dtype = Any


class BasicModule(nn.Module):
    """5×(7×7 conv) flow refiner (ref :10-25)."""
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        feats = (32, 64, 32, 16, 2)
        for i, f in enumerate(feats):
            x = nn.Conv(f, (7, 7), padding=((3, 3), (3, 3)),
                        name=f"conv{i}", dtype=self.dtype)(x)
            if i < len(feats) - 1:
                x = jax.nn.relu(x)
        return x


def _avg_pool2(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


@ARCH_REGISTRY.register()
class SpyNet(nn.Module):
    load_path: Any = None  # handled by the weight importer
    dtype: Dtype = None

    def setup(self):
        self.basic_module = [BasicModule(name=f"basic_module_{i}",
                                         dtype=self.dtype)
                             for i in range(6)]

    def _process(self, ref, supp):
        mean = jnp.asarray([0.485, 0.456, 0.406], ref.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], ref.dtype)
        refs = [(ref - mean) / std]
        supps = [(supp - mean) / std]
        for _ in range(5):
            refs.insert(0, _avg_pool2(refs[0]))
            supps.insert(0, _avg_pool2(supps[0]))

        n = ref.shape[0]
        h0, w0 = refs[0].shape[1] // 2, refs[0].shape[2] // 2
        flow = jnp.zeros((n, h0, w0, 2), ref.dtype)
        for level in range(6):
            h, w = refs[level].shape[1], refs[level].shape[2]
            up = resize(flow, (h, w), "bilinear_ac") * 2.0
            warped = flow_warp(supps[level], up, padding_mode="border")
            flow = self.basic_module[level](
                jnp.concatenate([refs[level], warped, up], axis=-1)) + up
        return flow

    def __call__(self, ref, supp):
        """ref/supp: (N,H,W,3) in [0,1] → flow (N,H,W,2) (Δx, Δy)."""
        h, w = ref.shape[1], ref.shape[2]
        h32 = int(math.ceil(h / 32.0) * 32)
        w32 = int(math.ceil(w / 32.0) * 32)
        ref_r = resize(ref, (h32, w32), "bilinear")
        supp_r = resize(supp, (h32, w32), "bilinear")
        flow = resize(self._process(ref_r, supp_r), (h, w), "bilinear")
        scale = jnp.asarray([w / w32, h / h32], flow.dtype)
        return flow * scale
