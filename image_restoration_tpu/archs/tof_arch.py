"""TOFlow — task-oriented flow video SR, flax/NHWC.

Parity with basicsr/archs/tof_arch.py: SPyNetTOF (:42-91, 4-level variant)
and TOFlow (:94-172 — 7-frame warp-to-center + 4-conv fusion).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.resize import resize
from .arch_util import flow_warp

Dtype = Any


class TOFBasicModule(nn.Module):
    """5-conv flow refiner (ref tof_arch.py:9-39)."""
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        cfg = [(32, 7), (64, 7), (32, 7), (16, 7), (2, 7)]
        for i, (f, k) in enumerate(cfg):
            x = nn.Conv(f, (k, k), padding=((k // 2, k // 2),
                                            (k // 2, k // 2)),
                        name=f"conv{i}", dtype=self.dtype)(x)
            if i < len(cfg) - 1:
                x = jax.nn.relu(x)
        return x


class SPyNetTOF(nn.Module):
    """4-level SpyNet variant (ref :42-91)."""
    dtype: Dtype = None

    def setup(self):
        self.basic_module = [TOFBasicModule(name=f"basic_module_{i}",
                                            dtype=self.dtype)
                             for i in range(4)]

    def __call__(self, ref, supp):
        n, h, w, _ = ref.shape
        refs, supps = [ref], [supp]
        for _ in range(3):
            refs.insert(0, refs[0].reshape(
                n, refs[0].shape[1] // 2, 2, refs[0].shape[2] // 2, 2,
                3).mean(axis=(2, 4)))
            supps.insert(0, supps[0].reshape(
                n, supps[0].shape[1] // 2, 2, supps[0].shape[2] // 2, 2,
                3).mean(axis=(2, 4)))
        flow = jnp.zeros((n, h // 16, w // 16, 2), ref.dtype)
        for level in range(4):
            hh, ww = refs[level].shape[1], refs[level].shape[2]
            # ref :87: F.interpolate align_corners=True; flow_warp default
            # zero padding (arch_util.flow_warp defaults)
            flow_up = resize(flow, (hh, ww), "bilinear_ac") * 2.0
            warped = flow_warp(supps[level], flow_up)
            flow = flow_up + self.basic_module[level](
                jnp.concatenate([refs[level], warped, flow_up], axis=-1))
        return flow


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """7-frame TOFlow (ref :94-172). Input (N,7,H,W,3) (x4-bicubic-upscaled
    LRs, like the reference's usage); returns the restored center frame."""
    adapt_official_weights: bool = False
    dtype: Dtype = None

    def setup(self):
        self.ref_idx = 0 if self.adapt_official_weights else 3
        self.spynet = SPyNetTOF(name="spynet", dtype=self.dtype)
        self.conv_1 = nn.Conv(64, (9, 9), padding=((4, 4), (4, 4)),
                              name="conv_1", dtype=self.dtype)
        self.conv_2 = nn.Conv(64, (9, 9), padding=((4, 4), (4, 4)),
                              name="conv_2", dtype=self.dtype)
        self.conv_3 = nn.Conv(64, (1, 1), name="conv_3", dtype=self.dtype)
        self.conv_4 = nn.Conv(3, (1, 1), name="conv_4", dtype=self.dtype)

    def __call__(self, lrs):
        if self.adapt_official_weights:
            # official 0-th-frame-is-reference order (ref :147-148)
            lrs = lrs[:, jnp.array([3, 0, 1, 2, 4, 5, 6])]
        n, t, h, w, c = lrs.shape
        ref_idx = self.ref_idx
        mean = jnp.asarray([0.485, 0.456, 0.406], lrs.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], lrs.dtype)
        lrs = (lrs - mean) / std
        lr_ref = lrs[:, ref_idx]
        warped = []
        for i in range(t):
            if i == ref_idx:
                warped.append(lr_ref)
            else:
                flow = self.spynet(lr_ref, lrs[:, i])
                warped.append(flow_warp(lrs[:, i], flow))
        feat = jnp.concatenate(warped, axis=-1)
        feat = jax.nn.relu(self.conv_1(feat))
        feat = jax.nn.relu(self.conv_2(feat))
        feat = jax.nn.relu(self.conv_3(feat))
        out = self.conv_4(feat) + lr_ref
        return out * std + mean
