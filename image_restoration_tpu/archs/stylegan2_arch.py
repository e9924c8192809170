"""StyleGAN2 block set + generator + discriminator — flax/NHWC, TPU-native.

Behavioral parity with the reference (rectangle-aware OCR variant
Car_Plate-Restoration/basicsr/archs/stylegan2_ocr_arch.py and the square
basicsr/archs/stylegan2_arch.py — the two files share the block set):

  NormStyleCode            :12-23        EqualLinear      :134-179
  ModulatedConv2d          :182-285      StyleConv        :288-333
  ToRGB                    :336-374      ConstantInput    :377-391
  StyleGAN2OCRGenerator    :394-590      ScaledLeakyReLU  :593-606
  EqualConv2d              :609-655      ConvLayer        :658-705
  ResBlock                 :708-734      StyleGAN2Discriminator
                                         (stylegan2_arch.py:736-805)

TPU-first differences:
  * per-sample modulated conv = modulate-input/demodulate-output rewrite
    (see ops/modulated_conv.py) — one dense MXU conv, no batch-grouping
  * upfirdn resampling = single dilated conv (ops/upfirdn.py)
  * fused bias+LeakyReLU epilogues fuse under XLA (ops/fused_act.py)
  * noise injection threads explicit JAX PRNG keys (collection 'noise'
    rng) instead of global RNG; fixed noise lives in the 'buffers'
    variable collection so imported checkpoints can carry it.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from ..ops.modulated_conv import modulated_conv2d, conv2d
from ..ops.upfirdn import upfirdn_upsample, upfirdn_smooth
from ..ops import fused_resample
from ..ops.fused_resample import conv_down_fir
from ..ops.modulated_conv import fused_valid_conv

Dtype = Any


def _cast(x: jax.Array, dtype: Dtype) -> jax.Array:
    """Mixed-precision entry cast: params stay f32 (master weights, init,
    checkpoints unchanged); compute runs in `dtype` when set. The ops
    layer (conv2d/upfirdn2d/fused_resample) casts weights/FIR kernels to
    the activation dtype, so one cast here cascades through the layer.
    dtype=None keeps exact f32 — the golden tests' path. (The r5 chip
    trace showed the 'bf16' GAN trainer actually ran f32 convs because
    these hand-rolled layers declared but never applied dtype.)"""
    return x if dtype is None or x.dtype == dtype else x.astype(dtype)


def stylegan_channels(channel_multiplier: float, narrow: float = 1.0) -> dict:
    """Resolution → channel-count table (ref stylegan2_ocr_arch.py:432-442)."""
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


def norm_style_code(x: jax.Array) -> jax.Array:
    """x * rsqrt(mean(x^2) + 1e-8) — ref NormStyleCode :12-23."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalized linear, ref :134-179. Stored weight ~ N(0, 1/lr_mul);
    runtime scale = lr_mul/sqrt(in); bias effective = bias * lr_mul."""
    out_channels: int
    use_bias: bool = True
    bias_init_val: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _cast(x, self.dtype)
        in_ch = x.shape[-1]
        weight = self.param(
            "weight", jax.nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (in_ch, self.out_channels))
        scale = (1.0 / math.sqrt(in_ch)) * self.lr_mul
        out = jnp.dot(x, weight.astype(x.dtype)) * scale
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.constant(self.bias_init_val),
                (self.out_channels,)) * self.lr_mul
        if self.activation == "fused_lrelu":
            out = fused_leaky_relu(out, bias)
        elif bias is not None:
            out = out + bias.astype(out.dtype)
        return out


class EqualConv2d(nn.Module):
    """Equalized conv, ref :609-655. weight ~ N(0,1); scale 1/sqrt(in·k²)."""
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _cast(x, self.dtype)
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", jax.nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_channels))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        out = conv2d(x, weight * scale, stride=self.stride,
                     padding=self.padding)
        if self.use_bias:
            bias = self.param("bias",
                              nn.initializers.constant(self.bias_init_val),
                              (self.out_channels,))
            out = out + bias.astype(out.dtype)
        return out


class ConvLayer(nn.Module):
    """[FIR-smooth↓] + EqualConv2d + [FusedLeakyReLU | ScaledLeakyReLU].

    Ref :658-705. Param names: 'weight' (+conv 'bias' when activate=False),
    'act_bias' for the fused activation bias.
    """
    out_channels: int
    kernel_size: int
    downsample: bool = False
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = _cast(x, self.dtype)
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", jax.nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_channels))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        if self.downsample:
            if fused_resample.FUSE_DOWN:
                # FIR folded into a single space_to_depth conv (exact;
                # ops/fused_resample.py) — one HBM pass instead of two
                out = conv_down_fir(x, weight * scale,
                                    tuple(self.resample_kernel),
                                    conv_fn=fused_valid_conv)
            else:
                x = upfirdn_smooth(x,
                                   jnp.asarray(self.resample_kernel,
                                               jnp.float32),
                                   downsample_factor=2, kernel_size=k)
                out = conv2d(x, weight * scale, stride=2, padding=0)
        else:
            out = conv2d(x, weight * scale, stride=1, padding=k // 2)
        if self.activate:
            if self.use_bias:
                act_bias = self.param("act_bias", nn.initializers.zeros,
                                      (self.out_channels,))
                out = fused_leaky_relu(out, act_bias)
            else:
                out = scaled_leaky_relu(out)
        elif self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,))
            out = out + bias.astype(out.dtype)
        return out


class ResBlock(nn.Module):
    """D residual block: conv + downsample-conv + 1×1-downsample skip, /√2.

    Ref :708-734.
    """
    out_channels: int
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = ConvLayer(in_ch, 3, use_bias=True, activate=True,
                        name="conv1", dtype=self.dtype)(x)
        out = ConvLayer(self.out_channels, 3, downsample=True,
                        resample_kernel=self.resample_kernel, use_bias=True,
                        activate=True, name="conv2", dtype=self.dtype)(out)
        skip = ConvLayer(self.out_channels, 1, downsample=True,
                         resample_kernel=self.resample_kernel, use_bias=False,
                         activate=False, name="skip", dtype=self.dtype)(x)
        return (out + skip) / math.sqrt(2)


class ModulatedConv2d(nn.Module):
    """Modulated conv wrapper: style MLP tap + equalized weight + the
    TPU-native modulated conv op. Ref :182-285 (no bias, scale 1/sqrt(in·k²))."""
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    eps: float = 1e-8
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, style):
        x = _cast(x, self.dtype)
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", jax.nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_channels))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        s = EqualLinear(in_ch, use_bias=True, bias_init_val=1.0,
                        lr_mul=1.0, activation=None, name="modulation",
                        dtype=self.dtype)(style)
        return modulated_conv2d(x, weight * scale, s,
                                demodulate=self.demodulate,
                                sample_mode=self.sample_mode,
                                smooth_kernel=self.resample_kernel,
                                eps=self.eps)


class StyleConv(nn.Module):
    """ModulatedConv2d + noise injection + fused LeakyReLU. Ref :288-333."""
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, style, noise=None, noise_rng=None):
        out = ModulatedConv2d(self.out_channels, self.kernel_size,
                              self.num_style_feat, self.demodulate,
                              self.sample_mode, self.resample_kernel,
                              name="modulated_conv", dtype=self.dtype)(x, style)
        noise_weight = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            b, h, w, _ = out.shape
            if noise_rng is not None:
                noise = jax.random.normal(noise_rng, (b, h, w, 1), out.dtype)
            else:
                noise = jnp.zeros((b, h, w, 1), out.dtype)
        out = out + noise_weight.astype(out.dtype) * noise.astype(out.dtype)
        act_bias = self.param("act_bias", nn.initializers.zeros,
                              (self.out_channels,))
        return fused_leaky_relu(out, act_bias)


class ToRGB(nn.Module):
    """1×1 modulated conv (no demod) to RGB + upsampled skip-add. Ref :336-374."""
    num_style_feat: int
    upsample: bool = True
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv2d(3, 1, self.num_style_feat, demodulate=False,
                              sample_mode=None, name="modulated_conv",
                              dtype=self.dtype)(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            if self.upsample:
                skip = upfirdn_upsample(
                    skip, jnp.asarray(self.resample_kernel, jnp.float32))
            out = out + skip
        return out


class ConstantInput(nn.Module):
    """Learned constant 4×(4·ratio) input. Ref :377-391. NHWC."""
    num_channel: int
    size_height: int
    size_width: int

    @nn.compact
    def __call__(self, batch: int):
        weight = self.param("weight", jax.nn.initializers.normal(1.0),
                            (1, self.size_height, self.size_width,
                             self.num_channel))
        return jnp.tile(weight, (batch, 1, 1, 1))


class StyleGAN2OCRGenerator(nn.Module):
    """Rectangle-aware StyleGAN2 generator. Ref stylegan2_ocr_arch.py:394-590.

    `__call__(styles, ...)` mirrors the reference forward: styles is a list
    of (b, num_style_feat) codes (or (b, num_latent, num_style_feat) when
    `input_is_latent` and per-layer codes are supplied). Noise is a list of
    explicit (1|b, h, w, 1) arrays, or drawn from the 'noise' rng, or zeros.
    """
    input_width: int = 768
    input_height: int = 32
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: float = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.0
    sft_half: bool = False  # used by the SFT subclass path
    dtype: Dtype = None

    @property
    def log_size(self) -> int:
        return int(math.log2(min(self.input_width, self.input_height)))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def ratio(self) -> int:
        return int(self.input_width / self.input_height)

    def setup(self):
        channels = stylegan_channels(self.channel_multiplier, self.narrow)
        self.channels = channels
        self.style_mlp = [
            EqualLinear(self.num_style_feat, use_bias=True, bias_init_val=0.0,
                        lr_mul=self.lr_mlp, activation="fused_lrelu",
                        name=f"style_mlp_{i}", dtype=self.dtype)
            for i in range(self.num_mlp)]
        self.constant_input = ConstantInput(
            channels[4], size_height=4, size_width=4 * self.ratio,
            name="constant_input")
        self.style_conv1 = StyleConv(
            channels[4], 3, self.num_style_feat, demodulate=True,
            sample_mode=None, resample_kernel=self.resample_kernel,
            name="style_conv1", dtype=self.dtype)
        self.to_rgb1 = ToRGB(self.num_style_feat, upsample=False,
                             resample_kernel=self.resample_kernel,
                             name="to_rgb1", dtype=self.dtype)

        style_convs = []
        to_rgbs = []
        for i in range(3, self.log_size + 1):
            out_ch = channels[2 ** i]
            style_convs.append(StyleConv(
                out_ch, 3, self.num_style_feat, demodulate=True,
                sample_mode="upsample", resample_kernel=self.resample_kernel,
                name=f"style_convs_{len(style_convs)}", dtype=self.dtype))
            style_convs.append(StyleConv(
                out_ch, 3, self.num_style_feat, demodulate=True,
                sample_mode=None, resample_kernel=self.resample_kernel,
                name=f"style_convs_{len(style_convs) + 0}", dtype=self.dtype))
            to_rgbs.append(ToRGB(
                self.num_style_feat, upsample=True,
                resample_kernel=self.resample_kernel,
                name=f"to_rgbs_{len(to_rgbs)}", dtype=self.dtype))
        self.style_convs = style_convs
        self.to_rgbs = to_rgbs

    def noise_shapes(self) -> list:
        shapes = []
        for layer_idx in range(self.num_layers):
            h = 2 ** ((layer_idx + 5) // 2)
            shapes.append((1, h, h * self.ratio, 1))
        return shapes

    def style_forward(self, x):
        """Style code → W latent (NormStyleCode + MLP)."""
        x = norm_style_code(x)
        for layer in self.style_mlp:
            x = layer(x)
        return x

    def mean_latent(self, rng, num_samples: int):
        latent_in = jax.random.normal(
            rng, (num_samples, self.num_style_feat))
        return jnp.mean(self.style_forward(latent_in), axis=0, keepdims=True)

    def _prepare(self, styles, input_is_latent, truncation, truncation_latent,
                 inject_index, noise, randomize_noise):
        if not input_is_latent:
            styles = [self.style_forward(s) for s in styles]
        if noise is None:
            if randomize_noise and self.has_rng("noise"):
                rng = self.make_rng("noise")
                keys = jax.random.split(rng, self.num_layers)
                noise = [jax.random.normal(keys[i], s)
                         for i, s in enumerate(self.noise_shapes())]
            else:
                noise = [jnp.zeros(s) for s in self.noise_shapes()]
        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        if len(styles) == 1:
            if styles[0].ndim < 3:
                latent = jnp.tile(styles[0][:, None, :],
                                  (1, self.num_latent, 1))
            else:
                latent = styles[0]
        elif len(styles) == 2:
            if inject_index is None:
                inject_index = self.num_latent // 2
            latent1 = jnp.tile(styles[0][:, None, :], (1, inject_index, 1))
            latent2 = jnp.tile(styles[1][:, None, :],
                               (1, self.num_latent - inject_index, 1))
            latent = jnp.concatenate([latent1, latent2], axis=1)
        else:
            raise ValueError("styles must have 1 or 2 entries")
        return latent, noise

    def __call__(self, styles, conditions=None, input_is_latent=False,
                 noise=None, randomize_noise=True, truncation=1.0,
                 truncation_latent=None, inject_index=None,
                 return_latents=False):
        latent, noise = self._prepare(styles, input_is_latent, truncation,
                                      truncation_latent, inject_index, noise,
                                      randomize_noise)
        out = self.constant_input(latent.shape[0])
        out = self.style_conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for idx in range(len(self.to_rgbs)):
            conv1 = self.style_convs[2 * idx]
            conv2 = self.style_convs[2 * idx + 1]
            out = conv1(out, latent[:, i], noise=noise[2 * idx + 1])
            if conditions is not None and i < len(conditions):
                # SFT merge (ref gfpganv1_ocr_arch.py:117-125)
                if self.sft_half:
                    half = out.shape[-1] // 2
                    out_same, out_sft = out[..., :half], out[..., half:]
                    out_sft = out_sft * conditions[i - 1] + conditions[i]
                    out = jnp.concatenate([out_same, out_sft], axis=-1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = conv2(out, latent[:, i + 1], noise=noise[2 * idx + 2])
            skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2

        if return_latents:
            return skip, latent
        return skip, None


# expose under the registry with reference signatures
ARCH_REGISTRY.register(StyleGAN2OCRGenerator)


@ARCH_REGISTRY.register()
class StyleGAN2Generator(StyleGAN2OCRGenerator):
    """Square generator, reference stylegan2_arch.py:395-590 signature."""

    @classmethod
    def from_out_size(cls, out_size: int, **kwargs):
        return cls(input_width=out_size, input_height=out_size, **kwargs)


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator(nn.Module):
    """StyleGAN2 D with minibatch-stddev. Ref stylegan2_arch.py:736-805."""
    input_width: int = 256
    input_height: int = 256
    channel_multiplier: float = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        channels = stylegan_channels(self.channel_multiplier, self.narrow)
        out_size = min(self.input_width, self.input_height)
        log_size = int(math.log2(out_size))

        out = ConvLayer(channels[out_size], 1, use_bias=True, activate=True,
                        name="conv_body_0", dtype=self.dtype)(x)
        idx = 1
        for i in range(log_size, 2, -1):
            out = ResBlock(channels[2 ** (i - 1)], self.resample_kernel,
                           name=f"conv_body_{idx}", dtype=self.dtype)(out)
            idx += 1

        b, h, w, c = out.shape
        group = min(b, self.stddev_group)
        m = b // group
        grouped = out.reshape(group, m, h, w, c)
        stddev = jnp.sqrt(jnp.var(grouped, axis=0) + 1e-8)  # (m, h, w, c)
        stddev = jnp.mean(stddev, axis=(1, 2, 3))  # (m,)
        stat = jnp.tile(stddev, (group,))[:, None, None, None]
        stat = jnp.broadcast_to(stat, (b, h, w, 1)).astype(out.dtype)
        out = jnp.concatenate([out, stat], axis=-1)

        out = ConvLayer(channels[4], 3, use_bias=True, activate=True,
                        name="final_conv", dtype=self.dtype)(out)
        out = out.reshape(b, -1)  # (h, w, c) flatten — converter permutes
        out = EqualLinear(channels[4], activation="fused_lrelu",
                          name="final_linear_0", dtype=self.dtype)(out)
        out = EqualLinear(1, activation=None,
                          name="final_linear_1", dtype=self.dtype)(out)
        return out
