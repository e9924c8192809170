"""EDVR — video restoration with PCD alignment and TSA fusion, flax/NHWC.

Parity with basicsr/archs/edvr_arch.py: PCDAlignment (:9-99, 3-level
pyramid cascading deformable alignment), TSAFusion (:101-191, temporal +
spatial attention), PredeblurModule (:193-244), EDVR (:247-383).

The DCNv2Pack equivalent (archs/arch_util.py:204-227) is a flax module over
the gather-based modulated deform conv (ops/deform_conv.py) — no CUDA
im2col.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.deform_conv import modulated_deform_conv
from ..ops.pixel_ops import pixel_shuffle
from ..ops.resize import resize
from .arch_util import ResidualBlockNoBN, conv_kaiming

Dtype = Any


def _lrelu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * slope)


class DCNv2Pack(nn.Module):
    """Modulated deform conv whose offsets/masks come from a conv on a
    feature input (ref arch_util.py:204-227). max_offset=R selects the
    gather-free windowed DCN (ops/deform_conv.py): ~30x faster on TPU,
    exact while every learned offset is within +-R."""
    out_channels: int
    deformable_groups: int = 8
    max_offset: Optional[int] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, feat):
        g, k = self.deformable_groups, 9
        out = conv_kaiming(g * 3 * k, 3, name="conv_offset",
                           dtype=self.dtype)(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        # CUDA decode (deform_conv_cuda_kernel.cu): cat(o1,o2) is viewed
        # per deformable group as 2K channels with tap t's (y,x) at
        # (2t, 2t+1) — the group view CROSSES the o1/o2 boundary; passing
        # the concatenation straight through reproduces it exactly (the
        # core splits (g, 2K) then (K, 2)). Re-deriving y=o1/x=o2 would be
        # a channel permutation that breaks imported reference weights.
        off = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        cin = x.shape[-1]
        weight = self.param("weight", jax.nn.initializers.variance_scaling(
            2.0, "fan_in", "normal"), (3, 3, cin, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,))
        return modulated_deform_conv(x, off, mask, weight, bias, stride=1,
                                     padding=1, deformable_groups=g,
                                     max_offset=self.max_offset)


class PCDAlignment(nn.Module):
    """Pyramid-cascading-deformable alignment (ref edvr_arch.py:9-99)."""
    num_feat: int = 64
    deformable_groups: int = 8
    dcn_max_offset: Optional[int] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, nbr_feat_l: List, ref_feat_l: List):
        """nbr/ref_feat_l: [L1 (N,H,W,F), L2 (N,H/2,W/2,F), L3 (...)]."""
        f, d = self.num_feat, self.dtype
        upsampled_offset, upsampled_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            level = f"l{i}"
            offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]],
                                     axis=-1)
            offset = _lrelu(conv_kaiming(f, 3, name=f"offset_conv1_{level}",
                                         dtype=d)(offset))
            if i == 3:
                offset = _lrelu(conv_kaiming(
                    f, 3, name=f"offset_conv2_{level}", dtype=d)(offset))
            else:
                offset = _lrelu(conv_kaiming(
                    f, 3, name=f"offset_conv2_{level}", dtype=d)(
                    jnp.concatenate([offset, upsampled_offset], axis=-1)))
                offset = _lrelu(conv_kaiming(
                    f, 3, name=f"offset_conv3_{level}", dtype=d)(offset))

            feat = DCNv2Pack(f, self.deformable_groups,
                             max_offset=self.dcn_max_offset,
                             name=f"dcn_pack_{level}",
                             dtype=d)(nbr_feat_l[i - 1], offset)
            if i < 3:
                feat = conv_kaiming(f, 3, name=f"feat_conv_{level}",
                                    dtype=d)(
                    jnp.concatenate([feat, upsampled_feat], axis=-1))
            if i > 1:
                feat = _lrelu(feat)
                h, w = offset.shape[1] * 2, offset.shape[2] * 2
                upsampled_offset = resize(offset, (h, w), "bilinear") * 2
                upsampled_feat = resize(feat, (h, w), "bilinear")

        # cascading refinement at L1
        offset = jnp.concatenate([feat, ref_feat_l[0]], axis=-1)
        offset = _lrelu(conv_kaiming(f, 3, name="cas_offset_conv1",
                                     dtype=d)(offset))
        offset = _lrelu(conv_kaiming(f, 3, name="cas_offset_conv2",
                                     dtype=d)(offset))
        feat = _lrelu(DCNv2Pack(f, self.deformable_groups,
                                max_offset=self.dcn_max_offset,
                                name="cas_dcnpack", dtype=d)(feat, offset))
        return feat


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (ref edvr_arch.py:101-191)."""
    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, aligned_feat):
        """aligned_feat: (N, T, H, W, F) → fused (N, H, W, F)."""
        n, t, h, w, f = aligned_feat.shape
        d = self.dtype
        emb_ref = conv_kaiming(f, 3, name="temporal_attn1", dtype=d)(
            aligned_feat[:, self.center_frame_idx])
        emb = conv_kaiming(f, 3, name="temporal_attn2", dtype=d)(
            aligned_feat.reshape(-1, h, w, f)).reshape(n, t, h, w, f)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1, keepdims=True)
        corr_prob = jax.nn.sigmoid(corr)  # (N,T,H,W,1)
        weighted = (aligned_feat * corr_prob).transpose(
            0, 2, 3, 1, 4).reshape(n, h, w, t * f)
        feat = _lrelu(conv_kaiming(f, 1, padding=0, name="feat_fusion",
                                   dtype=d)(weighted))

        # spatial attention
        attn = _lrelu(conv_kaiming(f, 1, padding=0, name="spatial_attn1",
                                   dtype=d)(weighted))
        attn_max = nn.max_pool(attn, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
        attn_avg = nn.avg_pool(attn, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
        attn = _lrelu(conv_kaiming(f, 1, padding=0, name="spatial_attn2",
                                   dtype=d)(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _lrelu(conv_kaiming(f, 1, padding=0,
                                         name="spatial_attn_l1",
                                         dtype=d)(attn))
        attn_level_max = nn.max_pool(attn_level, (3, 3), strides=(2, 2),
                                     padding=((1, 1), (1, 1)))
        attn_level_avg = nn.avg_pool(attn_level, (3, 3), strides=(2, 2),
                                     padding=((1, 1), (1, 1)))
        attn_level = _lrelu(conv_kaiming(
            f, 3, name="spatial_attn_l2", dtype=d)(
            jnp.concatenate([attn_level_max, attn_level_avg], axis=-1)))
        attn_level = _lrelu(conv_kaiming(f, 3, name="spatial_attn_l3",
                                         dtype=d)(attn_level))
        attn_level = resize(attn_level, attn.shape[1:3], "bilinear")
        attn = _lrelu(conv_kaiming(f, 3, name="spatial_attn3",
                                   dtype=d)(attn)) + attn_level
        attn = _lrelu(conv_kaiming(f, 1, padding=0, name="spatial_attn4",
                                   dtype=d)(attn))
        attn = resize(attn, (h, w), "bilinear")
        attn = conv_kaiming(f, 3, name="spatial_attn5", dtype=d)(attn)
        attn_add = conv_kaiming(f, 1, padding=0, name="spatial_attn_add2",
                                dtype=d)(
            _lrelu(conv_kaiming(f, 1, padding=0, name="spatial_attn_add1",
                                dtype=d)(attn)))
        attn = jax.nn.sigmoid(attn)
        return feat * attn * 2 + attn_add


class PredeblurModule(nn.Module):
    """Pre-deblur head (ref edvr_arch.py:193-244)."""
    num_feat: int = 64
    hr_in: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        f, d = self.num_feat, self.dtype
        feat_l1 = _lrelu(conv_kaiming(f, 3, name="conv_first", dtype=d)(x))
        if self.hr_in:
            feat_l1 = _lrelu(conv_kaiming(f, 3, stride=2,
                                          name="stride_conv_hr1",
                                          dtype=d)(feat_l1))
            feat_l1 = _lrelu(conv_kaiming(f, 3, stride=2,
                                          name="stride_conv_hr2",
                                          dtype=d)(feat_l1))
        feat_l2 = _lrelu(conv_kaiming(f, 3, stride=2, name="stride_conv_l2",
                                      dtype=d)(feat_l1))
        feat_l3 = _lrelu(conv_kaiming(f, 3, stride=2, name="stride_conv_l3",
                                      dtype=d)(feat_l2))
        feat_l3 = ResidualBlockNoBN(f, name="resblock_l3", dtype=d)(feat_l3)
        feat_l3 = resize(feat_l3, feat_l2.shape[1:3], "bilinear")
        feat_l2 = ResidualBlockNoBN(f, name="resblock_l2_1",
                                    dtype=d)(feat_l2) + feat_l3
        feat_l2 = ResidualBlockNoBN(f, name="resblock_l2_2", dtype=d)(feat_l2)
        feat_l2 = resize(feat_l2, feat_l1.shape[1:3], "bilinear")
        for i in range(2):
            feat_l1 = ResidualBlockNoBN(f, name=f"resblock_l1_{i}",
                                        dtype=d)(feat_l1)
        feat_l1 = feat_l1 + feat_l2
        for i in range(2, 5):
            feat_l1 = ResidualBlockNoBN(f, name=f"resblock_l1_{i}",
                                        dtype=d)(feat_l1)
        return feat_l1


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """EDVR (ref edvr_arch.py:247-383). Input (N,T,H,W,3), output center
    frame ×4 (or same size when hr_in)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: Optional[int] = None
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True
    # serving knob: bounded-offset windowed DCN (exact for |off|<=R;
    # trained PCD offsets are a few px — assert via max-offset probes)
    dcn_max_offset: Optional[int] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        n, t, h, w, c = x.shape
        center = self.center_frame_idx if self.center_frame_idx is not None \
            else self.num_frame // 2
        f, d = self.num_feat, self.dtype
        x_center = x[:, center]

        flat = x.reshape(-1, h, w, c)
        if self.with_predeblur:
            feat_l1 = PredeblurModule(f, self.hr_in, name="predeblur",
                                      dtype=d)(flat)
            feat_l1 = conv_kaiming(f, 1, padding=0, name="conv_1x1",
                                   dtype=d)(feat_l1)
            if self.hr_in:
                h, w = h // 4, w // 4
        else:
            feat_l1 = _lrelu(conv_kaiming(f, 3, name="conv_first",
                                          dtype=d)(flat))
        for i in range(self.num_extract_block):
            feat_l1 = ResidualBlockNoBN(f, name=f"feature_extraction_{i}",
                                        dtype=d)(feat_l1)
        feat_l2 = _lrelu(conv_kaiming(f, 3, stride=2, name="conv_l2_1",
                                      dtype=d)(feat_l1))
        feat_l2 = _lrelu(conv_kaiming(f, 3, name="conv_l2_2",
                                      dtype=d)(feat_l2))
        feat_l3 = _lrelu(conv_kaiming(f, 3, stride=2, name="conv_l3_1",
                                      dtype=d)(feat_l2))
        feat_l3 = _lrelu(conv_kaiming(f, 3, name="conv_l3_2",
                                      dtype=d)(feat_l3))

        feat_l1 = feat_l1.reshape(n, t, h, w, f)
        feat_l2 = feat_l2.reshape(n, t, h // 2, w // 2, f)
        feat_l3 = feat_l3.reshape(n, t, h // 4, w // 4, f)

        pcd = PCDAlignment(f, self.deformable_groups,
                           dcn_max_offset=self.dcn_max_offset,
                           name="pcd_align", dtype=d)
        ref = [feat_l1[:, center], feat_l2[:, center], feat_l3[:, center]]
        aligned = [pcd([feat_l1[:, i], feat_l2[:, i], feat_l3[:, i]], ref)
                   for i in range(t)]
        aligned = jnp.stack(aligned, axis=1)

        if self.with_tsa:
            feat = TSAFusion(f, self.num_frame, center, name="fusion",
                             dtype=d)(aligned)
        else:
            feat = conv_kaiming(f, 1, padding=0, name="fusion", dtype=d)(
                aligned.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * f))

        out = feat
        for i in range(self.num_reconstruct_block):
            out = ResidualBlockNoBN(f, name=f"reconstruction_{i}",
                                    dtype=d)(out)
        out = _lrelu(pixel_shuffle(conv_kaiming(f * 4, 3, name="upconv1",
                                                dtype=d)(out), 2))
        out = _lrelu(pixel_shuffle(conv_kaiming(64 * 4, 3, name="upconv2",
                                                dtype=d)(out), 2))
        out = _lrelu(conv_kaiming(64, 3, name="conv_hr", dtype=d)(out))
        out = conv_kaiming(self.num_out_ch, 3, name="conv_last", dtype=d)(out)
        if self.hr_in:
            base = x_center
        else:
            base = resize(x_center, (4 * h, 4 * w), "bilinear")
        return out + base
