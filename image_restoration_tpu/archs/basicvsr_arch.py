"""BasicVSR / IconVSR — recurrent video SR, flax/NHWC.

Parity with basicsr/archs/basicvsr_arch.py: BasicVSR (:12-93, bidirectional
SpyNet-flow propagation + ConvResidualBlocks trunks), ConvResidualBlocks
(:96-105), IconVSR (:109-248, keyframe refill via EDVRFeatureExtractor +
temporal padding), EDVRFeatureExtractor (:251-309).

TPU-first: the frame recurrences run as `lax.scan` over time (one compiled
step reused for every frame) instead of Python loops.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.pixel_ops import pixel_shuffle
from ..ops.resize import resize
from .arch_util import ResidualBlockNoBN, conv_kaiming, flow_warp
from .spynet_arch import SpyNet
from .edvr_arch import PCDAlignment, TSAFusion

Dtype = Any


def _lrelu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * slope)


class ConvResidualBlocks(nn.Module):
    """conv + N residual blocks (ref :96-105)."""
    num_out_ch: int = 64
    num_block: int = 15
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _lrelu(conv_kaiming(self.num_out_ch, 3, name="conv_first",
                                dtype=self.dtype)(x))
        for i in range(self.num_block):
            x = ResidualBlockNoBN(self.num_out_ch, name=f"block_{i}",
                                  dtype=self.dtype)(x)
        return x


@ARCH_REGISTRY.register()
class BasicVSR(nn.Module):
    """Bidirectional recurrent VSR (ref :12-93). Input (N,T,H,W,3).

    flow_max_offset=R serves the propagation warps through the
    gather-free windowed flow_warp (archs/arch_util.py) — identical
    while |flow| <= R px."""
    num_feat: int = 64
    num_block: int = 15
    spynet_path: Optional[str] = None
    flow_max_offset: Optional[int] = None
    dtype: Dtype = None

    def setup(self):
        self.spynet = SpyNet(name="spynet", dtype=self.dtype)
        self.backward_trunk = ConvResidualBlocks(
            self.num_feat, self.num_block, name="backward_trunk",
            dtype=self.dtype)
        self.forward_trunk = ConvResidualBlocks(
            self.num_feat, self.num_block, name="forward_trunk",
            dtype=self.dtype)
        self.fusion = conv_kaiming(self.num_feat, 1, padding=0,
                                   name="fusion", dtype=self.dtype)
        self.upconv1 = conv_kaiming(self.num_feat * 4, 3, name="upconv1",
                                    dtype=self.dtype)
        self.upconv2 = conv_kaiming(64 * 4, 3, name="upconv2",
                                    dtype=self.dtype)
        self.conv_hr = conv_kaiming(64, 3, name="conv_hr", dtype=self.dtype)
        self.conv_last = conv_kaiming(3, 3, name="conv_last",
                                      dtype=self.dtype)

    def get_flow(self, x):
        n, t, h, w, c = x.shape
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flows_backward = self.spynet(x1, x2).reshape(n, t - 1, h, w, 2)
        flows_forward = self.spynet(x2, x1).reshape(n, t - 1, h, w, 2)
        return flows_forward, flows_backward

    def __call__(self, x):
        n, t, h, w, c = x.shape
        flows_forward, flows_backward = self.get_flow(x)

        # Both recurrences are nn.scan'd over time: the trunk traces ONCE
        # (params broadcast across steps), so compile time is O(1) in clip
        # length instead of O(T) for an unrolled python loop. The first
        # step has no incoming flow; warping the all-zero initial feature
        # with a dummy zero flow is exact (sampling a zero image is zero),
        # so every step can warp unconditionally.
        x_t = jnp.moveaxis(x, 1, 0)                      # (T,N,H,W,C)
        dummy = jnp.zeros((1, n, h, w, 2), x.dtype)
        fb_t = jnp.moveaxis(flows_backward, 1, 0)        # (T-1,N,H,W,2)
        ff_t = jnp.moveaxis(flows_forward, 1, 0)

        def bwd_body(mdl, feat_prop, xs):
            x_i, flow_i = xs
            feat_prop = flow_warp(feat_prop, flow_i,
                                  max_flow=mdl.flow_max_offset)
            feat_prop = mdl.backward_trunk(
                jnp.concatenate([x_i, feat_prop], axis=-1))
            return feat_prop, feat_prop

        scan_bwd = nn.scan(bwd_body, variable_broadcast="params",
                           split_rngs={"params": False})
        # carry dtype must equal the trunk OUTPUT dtype or nn.scan rejects
        # the loop (bf16 serving: trunk emits bf16 while x stays f32)
        init = jnp.zeros((n, h, w, self.num_feat), self.dtype or x.dtype)
        # reversed time: step j=0 is frame t-1 (dummy flow), then
        # flows_backward[t-2] ... flows_backward[0]
        _, out_bwd_rev = scan_bwd(
            self, init, (x_t[::-1], jnp.concatenate([dummy, fb_t[::-1]])))
        out_bwd = out_bwd_rev[::-1]                      # (T,N,H,W,F)

        def fwd_body(mdl, feat_prop, xs):
            x_i, flow_i, bwd_i = xs
            feat_prop = flow_warp(feat_prop, flow_i,
                                  max_flow=mdl.flow_max_offset)
            feat_prop = mdl.forward_trunk(
                jnp.concatenate([x_i, feat_prop], axis=-1))
            out = jnp.concatenate([bwd_i, feat_prop], axis=-1)
            out = _lrelu(mdl.fusion(out))
            out = _lrelu(pixel_shuffle(mdl.upconv1(out), 2))
            out = _lrelu(pixel_shuffle(mdl.upconv2(out), 2))
            out = _lrelu(mdl.conv_hr(out))
            out = mdl.conv_last(out)
            base = resize(x_i, (4 * h, 4 * w), "bilinear")
            return feat_prop, out + base

        scan_fwd = nn.scan(fwd_body, variable_broadcast="params",
                           split_rngs={"params": False})
        _, outs = scan_fwd(self, init,
                           (x_t, jnp.concatenate([dummy, ff_t]), out_bwd))
        return jnp.moveaxis(outs, 0, 1)                  # (N,T,4H,4W,3)


@ARCH_REGISTRY.register()
class EDVRFeatureExtractor(nn.Module):
    """EDVR trunk producing a fused center-frame feature (ref :251-309)."""
    num_input_frame: int = 5
    num_feat: int = 64
    load_path: Optional[str] = None
    dcn_max_offset: Optional[int] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        n, t, h, w, c = x.shape
        center = self.num_input_frame // 2
        feat = _lrelu(conv_kaiming(self.num_feat, 3, name="conv_first",
                                   dtype=self.dtype)(
            x.reshape(-1, h, w, c)))
        for i in range(5):
            feat = ResidualBlockNoBN(self.num_feat,
                                     name=f"feature_extraction_{i}",
                                     dtype=self.dtype)(feat)
        l1 = feat
        l2 = _lrelu(conv_kaiming(self.num_feat, 3, stride=2,
                                 name="conv_l2_1", dtype=self.dtype)(l1))
        l2 = _lrelu(conv_kaiming(self.num_feat, 3, name="conv_l2_2",
                                 dtype=self.dtype)(l2))
        l3 = _lrelu(conv_kaiming(self.num_feat, 3, stride=2,
                                 name="conv_l3_1", dtype=self.dtype)(l2))
        l3 = _lrelu(conv_kaiming(self.num_feat, 3, name="conv_l3_2",
                                 dtype=self.dtype)(l3))

        l1 = l1.reshape(n, t, h, w, -1)
        l2 = l2.reshape(n, t, h // 2, w // 2, -1)
        l3 = l3.reshape(n, t, h // 4, w // 4, -1)

        pcd = PCDAlignment(self.num_feat, deformable_groups=8,
                           dcn_max_offset=self.dcn_max_offset,
                           name="pcd_align", dtype=self.dtype)
        ref = [l1[:, center], l2[:, center], l3[:, center]]
        aligned = []
        for i in range(t):
            aligned.append(pcd([l1[:, i], l2[:, i], l3[:, i]], ref))
        aligned = jnp.stack(aligned, axis=1)  # (N,T,H,W,F)
        return TSAFusion(self.num_feat, self.num_input_frame, center,
                         name="fusion", dtype=self.dtype)(aligned)


@ARCH_REGISTRY.register()
class IconVSR(nn.Module):
    """Information-refill BasicVSR (ref :109-248). Input (N,T,H,W,3)."""
    num_feat: int = 64
    num_block: int = 15
    keyframe_stride: int = 5
    temporal_padding: int = 2
    spynet_path: Optional[str] = None
    edvr_path: Optional[str] = None
    dcn_max_offset: Optional[int] = None
    flow_max_offset: Optional[int] = None
    dtype: Dtype = None

    def setup(self):
        self.spynet = SpyNet(name="spynet", dtype=self.dtype)
        self.edvr = EDVRFeatureExtractor(self.temporal_padding * 2 + 1,
                                         self.num_feat, name="edvr",
                                         dcn_max_offset=self.dcn_max_offset,
                                         dtype=self.dtype)
        self.backward_fusion = conv_kaiming(self.num_feat, 3,
                                            name="backward_fusion",
                                            dtype=self.dtype)
        self.backward_trunk = ConvResidualBlocks(
            self.num_feat, self.num_block, name="backward_trunk",
            dtype=self.dtype)
        self.forward_fusion = conv_kaiming(self.num_feat, 3,
                                           name="forward_fusion",
                                           dtype=self.dtype)
        self.forward_trunk = ConvResidualBlocks(
            self.num_feat, self.num_block, name="forward_trunk",
            dtype=self.dtype)
        self.upconv1 = conv_kaiming(self.num_feat * 4, 3, name="upconv1",
                                    dtype=self.dtype)
        self.upconv2 = conv_kaiming(64 * 4, 3, name="upconv2",
                                    dtype=self.dtype)
        self.conv_hr = conv_kaiming(64, 3, name="conv_hr", dtype=self.dtype)
        self.conv_last = conv_kaiming(3, 3, name="conv_last",
                                      dtype=self.dtype)

    def __call__(self, x):
        n, t, h, w, c = x.shape
        # pad spatially to a multiple of 4 (ref pad_spatial :149-170)
        ph = (4 - h % 4) % 4
        pw = (4 - w % 4) % 4
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
                    mode="reflect")
        hh, ww = h + ph, w + pw

        keyframe_idx = list(range(0, t, self.keyframe_stride))
        if keyframe_idx[-1] != t - 1:
            keyframe_idx.append(t - 1)

        # flows
        x1 = x[:, :-1].reshape(-1, hh, ww, 3)
        x2 = x[:, 1:].reshape(-1, hh, ww, 3)
        flows_backward = self.spynet(x1, x2).reshape(n, t - 1, hh, ww, 2)
        flows_forward = self.spynet(x2, x1).reshape(n, t - 1, hh, ww, 2)

        # keyframe features via EDVR over temporally-padded windows
        tp = self.temporal_padding
        if tp == 2:
            x_pad = jnp.concatenate([x[:, 1:3][:, ::-1], x,
                                     x[:, -3:-1][:, ::-1]], axis=1)
        else:
            x_pad = jnp.concatenate([x[:, 1:1 + tp][:, ::-1], x,
                                     x[:, -tp - 1:-1][:, ::-1]], axis=1)
        num_frames = 2 * tp + 1
        feats_keyframe = {}
        for i in keyframe_idx:
            feats_keyframe[i] = self.edvr(x_pad[:, i:i + num_frames])

        # backward branch (python loop: keyframe refill is data-dependent
        # on static indices, so the loop unrolls cleanly under jit)
        outputs = []
        feat_prop = jnp.zeros((n, hh, ww, self.num_feat), x.dtype)
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i],
                                      max_flow=self.flow_max_offset)
            if i in keyframe_idx:
                feat_prop = jnp.concatenate(
                    [feat_prop, feats_keyframe[i]], axis=-1)
                feat_prop = self.backward_fusion(feat_prop)
            feat_prop = self.backward_trunk(
                jnp.concatenate([x[:, i], feat_prop], axis=-1))
            outputs.append(feat_prop)
        outputs = outputs[::-1]

        # forward branch
        final = []
        feat_prop = jnp.zeros_like(feat_prop)
        for i in range(t):
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1],
                                      max_flow=self.flow_max_offset)
            if i in keyframe_idx:
                feat_prop = jnp.concatenate(
                    [feat_prop, feats_keyframe[i]], axis=-1)
                feat_prop = self.forward_fusion(feat_prop)
            feat_prop = self.forward_trunk(jnp.concatenate(
                [x[:, i], outputs[i], feat_prop], axis=-1))
            out = _lrelu(pixel_shuffle(self.upconv1(feat_prop), 2))
            out = _lrelu(pixel_shuffle(self.upconv2(out), 2))
            out = _lrelu(self.conv_hr(out))
            out = self.conv_last(out)
            base = resize(x[:, i], (4 * hh, 4 * ww), "bilinear")
            final.append(out + base)
        out = jnp.stack(final, axis=1)
        return out[:, :, :4 * h, :4 * w, :]
