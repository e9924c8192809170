"""HiFaceGAN — SPADE-based face renovation, flax/NHWC.

Parity with basicsr/archs/hifacegan_arch.py (SPADEGenerator :10, HiFaceGAN
:145, HiFaceGANDiscriminator :168) + hifacegan_util.py blocks: SPADE
normalization conditioned on multi-scale degraded inputs, a suppression-
module encoder (LIP-style), and a multi-scale PatchGAN discriminator that
returns intermediate features for the feature-matching loss.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.resize import resize
from .arch_util import conv_kaiming

Dtype = Any


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


class SPADE(nn.Module):
    """Spatially-adaptive (de)normalization (hifacegan_util.py SPADE:12-55).

    Parameter-free instance norm (the reference's single-GPU path maps
    'syncbatch' to InstanceNorm2d too, :22-27), then `normalized·γ + β`
    with γ/β from bias-free 3×3 convs over a shared embedding whose width
    is min(norm_nc, 128) (:33-38).
    """
    norm_nc: int
    label_nc: int = 3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, segmap):
        # parameter-free instance norm
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normalized = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        seg = resize(segmap, x.shape[1:3], "nearest")
        nhidden = 128 if self.norm_nc > 128 else self.norm_nc
        actv = jax.nn.relu(conv_kaiming(nhidden, 3, name="mlp_shared",
                                        dtype=self.dtype)(seg))
        gamma = conv_kaiming(self.norm_nc, 3, use_bias=False,
                             name="mlp_gamma", dtype=self.dtype)(actv)
        beta = conv_kaiming(self.norm_nc, 3, use_bias=False,
                            name="mlp_beta", dtype=self.dtype)(actv)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    """SPADE residual block (hifacegan_util.py SPADEResnetBlock)."""
    fout: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, seg):
        fin = x.shape[-1]
        fmid = min(fin, self.fout)
        dx = SPADE(fin, name="norm_0", dtype=self.dtype)(x, seg)
        dx = conv_kaiming(fmid, 3, name="conv_0", dtype=self.dtype)(
            _lrelu(dx))
        dx = SPADE(fmid, name="norm_1", dtype=self.dtype)(dx, seg)
        dx = conv_kaiming(self.fout, 3, name="conv_1", dtype=self.dtype)(
            _lrelu(dx))
        if fin != self.fout:
            xs = SPADE(fin, name="norm_s", dtype=self.dtype)(x, seg)
            xs = conv_kaiming(self.fout, 1, padding=0, use_bias=False,
                              name="conv_s", dtype=self.dtype)(xs)
        else:
            xs = x
        return xs + dx


class SimplifiedLIP(nn.Module):
    """Local-importance pooling (hifacegan_util.py SimplifiedLIP): ×2
    downsample weighted by a learned logit map."""
    channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        logit = conv_kaiming(self.channels, 3, name="logit_conv",
                             dtype=self.dtype)(x)
        logit = jnp.exp(jnp.clip(jax.nn.sigmoid(logit) * 2, -10, 10))
        num = nn.avg_pool(x * logit, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        den = nn.avg_pool(logit, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        return num / jnp.maximum(den, 1e-8)


@ARCH_REGISTRY.register()
class SPADEGenerator(nn.Module):
    """SPADE decoder (ref hifacegan_arch.py:10-142).

    The reference signature is accepted in full (:13-21); in this redesign
    `use_vae`/`z_dim` are inert (the VAE path is disabled upstream too),
    `crop_size` only fixes the seed resolution implied by the input,
    `norm_g` always resolves to the parameter-free instance norm the
    reference's single-process path uses (hifacegan_util.py:22-27), and
    `is_train`/`init_train_phase` (progressive training, disabled in the
    reference) are kept for config parity.
    """
    num_in_ch: int = 3
    num_feat: int = 64
    use_vae: bool = False
    z_dim: int = 256
    crop_size: int = 512
    norm_g: str = "spectralspadesyncbatch3x3"
    is_train: bool = True
    init_train_phase: int = 3
    ups_num: int = 5  # 1024→32 encoder depth / decoder upsamples
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        """x: degraded input (N,H,W,3); used as both seed and SPADE maps."""
        nf = self.num_feat
        h, w = x.shape[1], x.shape[2]
        sh, sw = h // 2 ** self.ups_num, w // 2 ** self.ups_num
        seed = resize(x, (sh, sw), "nearest")
        feat = conv_kaiming(16 * nf, 3, name="fc", dtype=self.dtype)(seed)
        chans = [16, 16, 8, 4, 2, 1]
        feat = SPADEResnetBlock(16 * nf, name="head_0",
                                dtype=self.dtype)(feat, x)
        for i in range(self.ups_num):
            hh, ww = feat.shape[1] * 2, feat.shape[2] * 2
            feat = resize(feat, (hh, ww), "nearest")
            feat = SPADEResnetBlock(chans[i + 1] * nf, name=f"up_{i}",
                                    dtype=self.dtype)(feat, x)
        out = conv_kaiming(3, 3, name="conv_img", dtype=self.dtype)(
            _lrelu(feat))
        return jnp.tanh(out)


@ARCH_REGISTRY.register()
class HiFaceGAN(SPADEGenerator):
    """Suppression-module encoder + SPADE decoder (ref :145-166)."""

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        # LIP encoder pyramid → multi-scale guidance
        feats = []
        h = conv_kaiming(nf, 3, name="enc_first", dtype=self.dtype)(x)
        for i in range(4):
            h = SimplifiedLIP(h.shape[-1], name=f"lip_{i}",
                              dtype=self.dtype)(h)
            h = _lrelu(conv_kaiming(min(nf * 2 ** (i + 1), nf * 8), 3,
                                    name=f"enc_{i}", dtype=self.dtype)(h))
            feats.append(h)

        sh, sw = x.shape[1] // 16, x.shape[2] // 16
        feat = conv_kaiming(16 * nf, 3, name="fc", dtype=self.dtype)(
            feats[-1])
        chans = [16, 8, 4, 2, 1]
        guides = feats[::-1] + [x]
        for i in range(4):
            feat = SPADEResnetBlock(chans[i] * nf, name=f"up_{i}",
                                    dtype=self.dtype)(feat, guides[i])
            hh, ww = feat.shape[1] * 2, feat.shape[2] * 2
            feat = resize(feat, (hh, ww), "nearest")
        feat = SPADEResnetBlock(nf, name="up_final",
                                dtype=self.dtype)(feat, x)
        out = conv_kaiming(3, 3, name="conv_img", dtype=self.dtype)(
            _lrelu(feat))
        return jnp.tanh(out)


class NLayerDiscriminator(nn.Module):
    """PatchGAN D returning intermediate features."""
    num_feat: int = 64
    n_layers: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x) -> List:
        feats = []
        h = _lrelu(conv_kaiming(self.num_feat, 4, stride=2, padding=1,
                                name="conv0", dtype=self.dtype)(x))
        feats.append(h)
        nf = self.num_feat
        for i in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if i == self.n_layers - 1 else 2
            h = conv_kaiming(nf, 4, stride=stride, padding=1,
                             name=f"conv{i}", dtype=self.dtype)(h)
            # parameter-free instance norm (spectral-norm-free variant)
            mean = jnp.mean(h, axis=(1, 2), keepdims=True)
            var = jnp.var(h, axis=(1, 2), keepdims=True)
            h = _lrelu((h - mean) * jax.lax.rsqrt(var + 1e-5))
            feats.append(h)
        feats.append(conv_kaiming(1, 4, padding=1, name="conv_out",
                                  dtype=self.dtype)(h))
        return feats


@ARCH_REGISTRY.register()
class HiFaceGANDiscriminator(nn.Module):
    """Multi-scale PatchGAN over cat(input, output) (ref :168-259).

    `conditional_d` means the caller concatenates (lq, img) channelwise
    before the call; `norm_d` resolves to the parameter-free instance norm
    (`spectralinstance`) used by the reference default.
    """
    num_in_ch: int = 3
    num_out_ch: int = 3
    conditional_d: bool = True
    num_d: int = 2
    n_layers_d: int = 4
    num_feat: int = 64
    norm_d: str = "spectralinstance"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        outs = []
        h = x
        for i in range(self.num_d):
            outs.append(NLayerDiscriminator(
                self.num_feat, self.n_layers_d, name=f"d_{i}",
                dtype=self.dtype)(h))
            if i != self.num_d - 1:
                h = nn.avg_pool(h, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
        return outs
