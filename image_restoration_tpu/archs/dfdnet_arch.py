"""DFDNet — deep face dictionary restoration, flax/NHWC (compact).

Parity surface with basicsr/archs/dfdnet_arch.py:50 (+dfdnet_util.py): a
VGG-style encoder, per-component dictionary attention (the k-nearest
dictionary atom per facial part, blended via a learned confidence — the
reference's AttentionBlock/MSDilationBlock path), and an SFT-upsampling
decoder. Dictionaries are runtime inputs (the reference loads them from a
.pth); faces/landmarks come from the caller (the reference's dlib
face_util path is serving-side preprocessing).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.resize import resize
from .arch_util import conv_kaiming

Dtype = Any

PARTS = ("left_eye", "right_eye", "nose", "mouth")


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


class AttentionBlock(nn.Module):
    """Confidence-weighted residual blend (dfdnet_util.py AttentionBlock)."""
    channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, feat, swapped):
        attn = conv_kaiming(self.channels, 1, padding=0, name="conv1",
                            dtype=self.dtype)(swapped - feat)
        attn = jax.nn.sigmoid(conv_kaiming(self.channels, 3, name="conv2",
                                           dtype=self.dtype)(_lrelu(attn)))
        return feat + attn * (swapped - feat)


def dictionary_swap(feat_roi: jax.Array, dictionary: jax.Array) -> jax.Array:
    """Replace an ROI feature with its nearest dictionary atom.

    feat_roi: (h, w, c); dictionary: (K, h, w, c). Cosine-similarity match
    over flattened atoms (the reference's conv-based correlation).
    """
    f = feat_roi.reshape(-1)
    d = dictionary.reshape(dictionary.shape[0], -1)
    f_n = f / (jnp.linalg.norm(f) + 1e-8)
    d_n = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
    scores = d_n @ f_n
    idx = jnp.argmax(scores)
    return dictionary[idx]


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """Dictionary face restoration (ref dfdnet_arch.py:50-158, compact).

    __call__(x, part_locations=None, dictionaries=None): without parts or
    dictionaries it degrades to the encoder-decoder restoration path.
    """
    num_feat: int = 64
    dict_feat_channels: Sequence[int] = (128, 256, 512, 512)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, part_locations: Optional[Dict] = None,
                 dictionaries: Optional[Dict] = None):
        nf, d = self.num_feat, self.dtype
        # VGG-style encoder with taps at 4 scales
        taps = []
        h = x
        chans = (nf, nf * 2, nf * 4, nf * 8)
        for i, c in enumerate(chans):
            h = _lrelu(conv_kaiming(c, 3, name=f"enc{i}_a", dtype=d)(h))
            h = _lrelu(conv_kaiming(c, 3, stride=2, name=f"enc{i}_b",
                                    dtype=d)(h))
            taps.append(h)

        # dictionary swap per facial part at each scale (when provided)
        if part_locations is not None and dictionaries is not None:
            new_taps = []
            for si, tap in enumerate(taps):
                t = tap
                for part in PARTS:
                    if part not in part_locations or \
                            (part, si) not in dictionaries and \
                            part not in dictionaries:
                        continue
                    y0, x0, y1, x1 = part_locations[part][si]
                    roi = t[0, y0:y1, x0:x1]
                    dic = dictionaries[part][si] if part in dictionaries \
                        else dictionaries[(part, si)]
                    swapped = dictionary_swap(roi, dic)
                    blended = AttentionBlock(
                        t.shape[-1], name=f"attn_{part}_{si}",
                        dtype=d)(roi[None], swapped[None])[0]
                    t = t.at[0, y0:y1, x0:x1].set(blended)
                new_taps.append(t)
            taps = new_taps

        # SFT decoder
        h = taps[-1]
        for i in range(len(chans) - 1, -1, -1):
            hh, ww = h.shape[1] * 2, h.shape[2] * 2
            h = resize(h, (hh, ww), "bilinear")
            skip = taps[i - 1] if i > 0 else None
            h = _lrelu(conv_kaiming(chans[max(i - 1, 0)], 3,
                                    name=f"dec{i}", dtype=d)(h))
            if skip is not None:
                scale = conv_kaiming(h.shape[-1], 3, name=f"sft_scale{i}",
                                     dtype=d)(skip)
                shift = conv_kaiming(h.shape[-1], 3, name=f"sft_shift{i}",
                                     dtype=d)(skip)
                h = h * (1 + scale) + shift
        out = conv_kaiming(3, 3, name="conv_out", dtype=d)(h)
        return jnp.tanh(out)
