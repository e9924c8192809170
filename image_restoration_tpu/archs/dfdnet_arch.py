"""DFDNet — deep face dictionary restoration, flax/NHWC.

Parity with basicsr/archs/dfdnet_arch.py:50-158 (+dfdnet_util.py): the
VGG19-face encoder tapped at relu2_2/relu3_4/relu4_4/conv5_4, per-part
dictionary feature swap (AdaIN-matched nearest atom + attention blend),
MSDilationBlock bottleneck, and the SFT upsampling decoder.

Weight-importable: submodule names mirror the reference graph tokens so
`convert.torch_import.convert_state_dict` maps reference checkpoints
directly after `convert.hifacegan_import.fold_spectral_norm` (all the
reference convs are spectral_norm-wrapped; at eval torch applies W/σ, which
folding materializes — there is no DFDNet trainer, in the reference either).

The dictionary swap slices ROIs at host-provided integer part boxes, so
`__call__` runs eagerly (reference supports batch 1 only, :121-127); the
conv trunk still lowers to XLA ops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .vgg_arch import VGGFeatureExtractor

Dtype = Any

PARTS = ("left_eye", "right_eye", "nose", "mouth")


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


def blur3(x):
    """Depthwise 3×3 binomial blur (dfdnet_util.py Blur:42-55)."""
    k = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], x.dtype) / 16.0
    c = x.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _nearest_torch(x, size):
    """torch F.interpolate(mode='nearest'): src = floor(dst·in/out)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    ri = np.floor(np.arange(oh) * h / oh).astype(np.int32)
    ci = np.floor(np.arange(ow) * w / ow).astype(np.int32)
    return x[..., ri, :, :][..., :, ci, :]


def _bilinear(x, size):
    """torch bilinear, align_corners=False (half-pixel centers, and — like
    torch's default — NO antialias prefilter when downscaling)."""
    shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x, shape, method="linear", antialias=False)


def adaptive_instance_normalization(content, style, eps=1e-5):
    """AdaIN over NHWC (dfdnet_util.py:58-89): match content (dictionary
    atoms) to the degraded ROI's per-channel mean/std. torch.var defaults
    to the UNBIASED estimator — ddof=1 here for parity."""
    c_mean = jnp.mean(content, axis=(-3, -2), keepdims=True)
    c_std = jnp.sqrt(jnp.var(content, axis=(-3, -2), keepdims=True,
                             ddof=1) + eps)
    s_mean = jnp.mean(style, axis=(-3, -2), keepdims=True)
    s_std = jnp.sqrt(jnp.var(style, axis=(-3, -2), keepdims=True,
                             ddof=1) + eps)
    return (content - c_mean) / c_std * s_std + s_mean


class AttentionBlock(nn.Module):
    """conv → lrelu → conv (dfdnet_util.py:92-95)."""
    channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), name="layer0",
                    dtype=self.dtype)(x)
        return nn.Conv(self.channels, (3, 3), name="layer2",
                       dtype=self.dtype)(_lrelu(h))


class _DilatedPair(nn.Module):
    """Two dilated convs with lrelu between (dfdnet_util.py conv_block)."""
    channels: int
    dilation: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        pad = self.dilation  # ((k-1)//2)·dilation for k=3
        h = nn.Conv(self.channels, (3, 3), padding=pad,
                    kernel_dilation=self.dilation, name="layer0",
                    dtype=self.dtype)(x)
        return nn.Conv(self.channels, (3, 3), padding=pad,
                       kernel_dilation=self.dilation, name="layer2",
                       dtype=self.dtype)(_lrelu(h))


class MSDilationBlock(nn.Module):
    """4 parallel dilation branches + fused residual (dfdnet_util.py
    :124-147)."""
    channels: int
    dilation: Sequence[int] = (1, 1, 1, 1)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        outs = [_DilatedPair(self.channels, self.dilation[i],
                             name=f"conv_blocks_{i}", dtype=self.dtype)(x)
                for i in range(4)]
        h = jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.channels, (3, 3), name="conv_fusion",
                       dtype=self.dtype)(h) + x


class UpResBlock(nn.Module):
    """x + conv(lrelu(conv(x))) (dfdnet_util.py:150-162)."""
    channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), name="body_0",
                    dtype=self.dtype)(x)
        h = nn.Conv(self.channels, (3, 3), name="body_2",
                    dtype=self.dtype)(_lrelu(h))
        return x + h


class _Upsample4(nn.Module):
    """snconv → lrelu → UpResBlock ×2 → conv → tanh (ref :94-97)."""
    channels: int
    dtype: Dtype = None

    def setup(self):
        self.layer0 = nn.Conv(self.channels, (3, 3), name="layer0",
                              dtype=self.dtype)
        self.layer2 = UpResBlock(self.channels, name="layer2",
                                 dtype=self.dtype)
        self.layer3 = UpResBlock(self.channels, name="layer3",
                                 dtype=self.dtype)
        self.layer4 = nn.Conv(3, (3, 3), name="layer4", dtype=self.dtype)

    def __call__(self, x):
        h = self.layer2(_lrelu(self.layer0(x)))
        return jnp.tanh(self.layer4(self.layer3(h)))


class SFTUpBlock(nn.Module):
    """Blur→conv + SFT (scale/shift from the updated feature) + 2× up
    (ref dfdnet_arch.py:13-46). The double-LeakyReLU quirk is kept: conv1
    uses slope 0.04 (= two 0.2 activations), the rest 0.2."""
    out_ch: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, updated_feat):
        h = nn.Conv(self.out_ch, (3, 3), name="conv1_1",
                    dtype=self.dtype)(blur3(x))
        h = _lrelu(h, 0.04)
        scale = nn.Conv(self.out_ch, (3, 3), name="scale_block_0",
                        dtype=self.dtype)(updated_feat)
        scale = nn.Conv(self.out_ch, (3, 3), name="scale_block_2",
                        dtype=self.dtype)(_lrelu(scale))
        shift = nn.Conv(self.out_ch, (3, 3), name="shift_block_0",
                        dtype=self.dtype)(updated_feat)
        shift = nn.Conv(self.out_ch, (3, 3), name="shift_block_2",
                        dtype=self.dtype)(_lrelu(shift))
        h = h * scale + jax.nn.sigmoid(shift)
        h = _bilinear(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.Conv(self.out_ch, (3, 3), name="convup_1",
                    dtype=self.dtype)(h)
        return _lrelu(h)


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """Dictionary face restoration (ref dfdnet_arch.py:50-158).

    __call__(x, part_locations, dictionaries):
      x: (1, 512, 512, 3) RGB in [-1, 1] (range_norm VGG input).
      part_locations: sequence of 4 int boxes (x1, y1, x2, y2) in input
        coordinates, ordered left_eye/right_eye/nose/mouth.
      dictionaries: {'256'|'128'|'64'|'32': {part: (K, h, w, C)}} NHWC —
        the reference loads these from dict_path; here they are runtime
        inputs (no torch pickle dependency inside the module).
    """
    num_feat: int = 64
    dtype: Dtype = None

    @property
    def vgg_layers(self):
        return ("relu2_2", "relu3_4", "relu4_4", "conv5_4")

    @property
    def feature_sizes(self):
        return (256, 128, 64, 32)

    def setup(self):
        nf, d = self.num_feat, self.dtype
        self.vgg_extractor = VGGFeatureExtractor(
            layer_name_list=self.vgg_layers, vgg_type="vgg19",
            use_input_norm=True, range_norm=True, name="vgg_extractor",
            dtype=d)
        channel_sizes = (128, 256, 512, 512)
        blocks = {}
        for idx, f_size in enumerate(self.feature_sizes):
            for part in PARTS:
                blocks[f"{part}_{f_size}"] = AttentionBlock(
                    channel_sizes[idx], name=f"attn_blocks_{part}_{f_size}",
                    dtype=d)
        self._attn = blocks
        self.multi_scale_dilation = MSDilationBlock(
            nf * 8, dilation=(4, 3, 2, 1), name="multi_scale_dilation",
            dtype=d)
        self.upsample0 = SFTUpBlock(nf * 8, name="upsample0", dtype=d)
        self.upsample1 = SFTUpBlock(nf * 4, name="upsample1", dtype=d)
        self.upsample2 = SFTUpBlock(nf * 2, name="upsample2", dtype=d)
        self.upsample3 = SFTUpBlock(nf, name="upsample3", dtype=d)
        self.upsample4 = _Upsample4(nf, name="upsample4", dtype=d)

    def _swap(self, vgg_feat, updated, dict_feat, loc, part, f_size):
        """Dictionary feature swap for one part ROI (ref :98-116)."""
        x1, y1, x2, y2 = (int(v) for v in loc)
        part_feat = vgg_feat[:, y1:y2, x1:x2, :]
        part_resized = _bilinear(part_feat, dict_feat.shape[1:3])
        dict_feat = adaptive_instance_normalization(dict_feat, part_resized)
        # inner product of the ROI with each atom (F.conv2d with atoms as
        # filters at exactly-matching spatial size, ref :106-108)
        scores = jnp.einsum("hwc,khwc->k", part_resized[0], dict_feat)
        idx = jnp.argmax(scores)
        atom = jax.lax.dynamic_index_in_dim(dict_feat, idx, keepdims=False)
        swap_feat = _nearest_torch(atom[None],
                                   (part_feat.shape[1], part_feat.shape[2]))
        attn = self._attn[f"{part}_{f_size}"](swap_feat - part_feat)
        return updated.at[:, y1:y2, x1:x2, :].set(attn * swap_feat
                                                  + part_feat)

    def __call__(self, x, part_locations, dictionaries):
        vgg_features = self.vgg_extractor(x)
        updated_vgg_features = []
        for vgg_layer, f_size in zip(self.vgg_layers, self.feature_sizes):
            vgg_feat = vgg_features[vgg_layer]
            updated = vgg_feat
            for part_idx, part in enumerate(PARTS):
                loc = np.asarray(part_locations[part_idx]).reshape(-1)[:4]
                loc = (loc // (512 / f_size)).astype(np.int64)
                updated = self._swap(vgg_feat, updated,
                                     dictionaries[str(f_size)][part],
                                     loc, part, f_size)
            updated_vgg_features.append(updated)

        h = self.multi_scale_dilation(vgg_features["conv5_4"])
        h = self.upsample0(h, updated_vgg_features[3])
        h = self.upsample1(h, updated_vgg_features[2])
        h = self.upsample2(h, updated_vgg_features[1])
        h = self.upsample3(h, updated_vgg_features[0])
        return self.upsample4(h)
