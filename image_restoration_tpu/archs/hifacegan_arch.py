"""HiFaceGAN — SPADE-based face renovation, flax/NHWC.

Parity with basicsr/archs/hifacegan_arch.py (SPADEGenerator :10, HiFaceGAN
:145, HiFaceGANDiscriminator :168) + hifacegan_util.py blocks: SPADE
normalization conditioned on multi-scale degraded inputs, a suppression-
module encoder (LIP-style), and a multi-scale PatchGAN discriminator that
returns intermediate features for the feature-matching loss.
"""

from __future__ import annotations

from typing import Any, List

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


def _instance_norm(x, scale=None, shift=None, eps=1e-5):
    """torch InstanceNorm2d semantics (per-sample, per-channel over HW)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + shift
    return y


def _up2(x):
    """nn.Upsample(scale_factor=2) — exact nearest ×2."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class _Affine(nn.Module):
    """Affine pair for torch InstanceNorm2d(affine=True) (scale='weight',
    bias) — named so the structure-driven importer resolves them."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class SimplifiedLIP(nn.Module):
    """Local-importance pooling (hifacegan_util.py:160-199): logit =
    SoftGate(IN_affine(conv_nobias(x)))·12, out = avg(x·eˡ)/avg(eˡ) with a
    3×3 stride-2 window (the pad-count divisors cancel in the ratio).
    Child names mirror the torch `logit` Sequential for weight import."""
    channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        logit = conv_kaiming(self.channels, 3, use_bias=False,
                             name="logit_0", dtype=self.dtype)(x)
        logit = _Affine(name="logit_1")(_instance_norm(logit))
        weight = jnp.exp(jax.nn.sigmoid(logit) * 12.0)
        num = nn.avg_pool(x * weight, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        den = nn.avg_pool(weight, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        return num / den


class LIPEncoder(nn.Module):
    """hifacegan_util.py LIPEncoder (:202-236): conv+IN+ReLU stem, then
    n_2xdown × (SimplifiedLIP ↓2 → conv → IN) with ReLU between stages
    (none after the last). Child names mirror the torch `model` Sequential
    indices (conv at 0; per stage i: LIP at 3+4i, conv at 4+4i)."""
    ngf: int
    n_2xdown: int = 5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = conv_kaiming(self.ngf, 3, use_bias=False, name="model_0",
                         dtype=self.dtype)(x)
        h = jax.nn.relu(_instance_norm(h))
        cur = 1
        for i in range(self.n_2xdown):
            nxt = min(cur * 2, 16)
            h = SimplifiedLIP(self.ngf * cur, name=f"model_{3 + 4 * i}",
                              dtype=self.dtype)(h)
            h = conv_kaiming(self.ngf * nxt, 3, name=f"model_{4 + 4 * i}",
                             dtype=self.dtype)(h)
            h = _instance_norm(h)
            cur = nxt
            if i < self.n_2xdown - 1:
                h = jax.nn.relu(h)
        return h


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
    use_vae: bool = False  # inert: the VAE path is disabled upstream too
    z_dim: int = 256
    crop_size: int = 512
    norm_g: str = "spectralspadesyncbatch3x3"
    is_train: bool = True
    init_train_phase: int = 3
    scale_ratio: int = 5  # hardcoded in the reference (:28)
    dtype: Dtype = None

    def encode(self, x):
        """Nearest-downsample 2^scale_ratio then the fc conv (ref :62-69)."""
        h, w = x.shape[1], x.shape[2]
        sh, sw = h // 2 ** self.scale_ratio, w // 2 ** self.scale_ratio
        seed = resize(x, (sh, sw), "nearest")
        return conv_kaiming(16 * self.num_feat, 3, name="fc",
                            dtype=self.dtype)(seed)

    @nn.compact
    def __call__(self, x):
        """x: degraded input (N,H,W,3); used as both seed and SPADE maps.

        Ref forward (:71-95): fc → head_0 → up → g_middle_0 → g_middle_1 →
        phase×(up → ups[i]) → to_rgbs[phase−1](lrelu) → tanh, with
        phase = init_train_phase+1 when is_train else 4.
        """
        nf = self.num_feat
        seg = x
        feat = self.encode(x)
        feat = SPADEResnetBlock(16 * nf, name="head_0",
                                dtype=self.dtype)(feat, seg)
        feat = _up2(feat)
        feat = SPADEResnetBlock(16 * nf, name="g_middle_0",
                                dtype=self.dtype)(feat, seg)
        feat = SPADEResnetBlock(16 * nf, name="g_middle_1",
                                dtype=self.dtype)(feat, seg)
        phase = self.init_train_phase + 1 if self.is_train else 4
        up_chans = [8, 4, 2, 1]
        for i in range(phase):
            feat = _up2(feat)
            feat = SPADEResnetBlock(up_chans[i] * nf, name=f"ups_{i}",
                                    dtype=self.dtype)(feat, seg)
        out = conv_kaiming(3, 3, name=f"to_rgbs_{phase - 1}",
                           dtype=self.dtype)(_lrelu(feat))
        return jnp.tanh(out)


@ARCH_REGISTRY.register()
class HiFaceGAN(SPADEGenerator):
    """SPADEGenerator with the learnable LIP encoder (ref :145-166)."""

    def encode(self, x):
        return LIPEncoder(self.num_feat, self.scale_ratio,
                          name="lip_encoder", dtype=self.dtype)(x)


class NLayerDiscriminator(nn.Module):
    """PatchGAN D returning all intermediate group outputs (ref :225-270).

    Groups mirror the reference Sequential split: model0 = conv(bias)+lrelu,
    model1..n−1 = spectral-norm conv (bias deleted by
    get_nonspade_norm_layer) + parameter-free InstanceNorm + lrelu,
    model_n = 1-channel conv(bias). Spectral norm folds into the imported
    weight (W/σ), so the flax convs are plain.
    """
    num_feat: int = 64
    n_layers: int = 4
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x) -> List:
        feats = []
        h = _lrelu(conv_kaiming(self.num_feat, 4, stride=2, padding=2,
                                name="model0_0", dtype=self.dtype)(x))
        feats.append(h)
        nf = self.num_feat
        for i in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if i == self.n_layers - 1 else 2
            h = conv_kaiming(nf, 4, stride=stride, padding=2,
                             use_bias=False, name=f"model{i}_0",
                             dtype=self.dtype)(h)
            h = _lrelu(_instance_norm(h))
            feats.append(h)
        feats.append(conv_kaiming(1, 4, padding=2,
                                  name=f"model{self.n_layers}_0",
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
                self.num_feat, self.n_layers_d, name=f"discriminator_{i}",
                dtype=self.dtype)(h))
            if i != self.num_d - 1:
                # F.avg_pool2d(3,2,pad=1, count_include_pad=False):
                # divide the sum-pool by the per-window VALID count
                num = nn.avg_pool(h, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1))) * 9.0
                den = nn.avg_pool(jnp.ones_like(h[..., :1]), (3, 3),
                                  strides=(2, 2),
                                  padding=((1, 1), (1, 1))) * 9.0
                h = num / den
        return outs
