"""GFPGANv1OCR — the production license-plate restoration generator.

Parity with Car_Plate-Restoration/basicsr/archs/gfpganv1_ocr_arch.py:
StyleGAN2OCRGeneratorSFT (:14-136 — SFT merge between conv1/conv2 of each
resolution, sft_half channel split), ConvUpLayer (:139-203, bilinear ×2 +
equalized conv), ResUpBlock (:206-225), GFPGANv1OCR (:228-393 — UNet encoder
→ style code → SFT condition branches → StyleGAN2 decoder, per-scale toRGB
pyramid for the pyramid loss).

flax/NHWC; the decoder reuses the TPU-native StyleGAN2 block set. The SFT
merge itself lives in StyleGAN2OCRGenerator.__call__ (conditions argument),
so no subclass is needed — `sft_half` is a generator field.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from ..ops.modulated_conv import conv2d
from ..ops.resize import resize
from .stylegan2_arch import (ConvLayer, EqualConv2d, EqualLinear, ResBlock,
                             StyleGAN2OCRGenerator)

Dtype = Any


class ConvUpLayer(nn.Module):
    """Bilinear ×2 upsample + equalized conv (+ fused/scaled lrelu).

    Ref gfpganv1_ocr_arch.py:139-203.
    """
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.0
    activate: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None and x.dtype != self.dtype:
            x = x.astype(self.dtype)  # mixed-precision compute cast
        in_ch = x.shape[-1]
        k = self.kernel_size
        n, h, w, _ = x.shape
        out = resize(x, (2 * h, 2 * w), "bilinear")
        weight = self.param("weight", jax.nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_channels))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        out = conv2d(out, weight * scale, stride=self.stride,
                     padding=self.padding)
        if self.use_bias and not self.activate:
            bias = self.param("bias",
                              nn.initializers.constant(self.bias_init_val),
                              (self.out_channels,))
            out = out + bias.astype(out.dtype)
        if self.activate:
            if self.use_bias:
                act_bias = self.param("act_bias", nn.initializers.zeros,
                                      (self.out_channels,))
                out = fused_leaky_relu(out, act_bias)
            else:
                out = scaled_leaky_relu(out)
        return out


class ResUpBlock(nn.Module):
    """Residual block with ×2 upsampling. Ref gfpganv1_ocr_arch.py:206-225."""
    out_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = ConvLayer(in_ch, 3, use_bias=True, activate=True,
                        name="conv1", dtype=self.dtype)(x)
        out = ConvUpLayer(self.out_channels, 3, stride=1, padding=1,
                          use_bias=True, activate=True, name="conv2",
                          dtype=self.dtype)(out)
        skip = ConvUpLayer(self.out_channels, 1, use_bias=False,
                           activate=False, name="skip", dtype=self.dtype)(x)
        return (out + skip) / math.sqrt(2)


class SFTCondition(nn.Module):
    """EqualConv2d → ScaledLeakyReLU → EqualConv2d condition branch.

    Ref gfpganv1_ocr_arch.py condition_scale/shift Sequentials (:352-372).
    """
    mid_channels: int
    out_channels: int
    final_bias_init: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out = EqualConv2d(self.mid_channels, 3, stride=1, padding=1,
                          use_bias=True, bias_init_val=0.0, name="layer0",
                          dtype=self.dtype)(x)
        out = scaled_leaky_relu(out)
        return EqualConv2d(self.out_channels, 3, stride=1, padding=1,
                           use_bias=True,
                           bias_init_val=self.final_bias_init,
                           name="layer2", dtype=self.dtype)(out)


@ARCH_REGISTRY.register()
class GFPGANv1OCR(nn.Module):
    """UNet + StyleGAN2 decoder with SFT. Ref gfpganv1_ocr_arch.py:228-393.

    __call__ returns (image in (−1,1), out_rgbs pyramid list).
    """
    input_width: int = 768
    input_height: int = 32
    num_style_feat: int = 512
    channel_multiplier: float = 1
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    decoder_load_path: Optional[str] = None  # handled by weight import
    fix_decoder: bool = True                 # handled by optimizer masking
    num_mlp: int = 8
    lr_mlp: float = 0.01
    input_is_latent: bool = False
    different_w: bool = False
    narrow: float = 1.0
    sft_half: bool = False
    dtype: Dtype = None

    @property
    def log_size(self) -> int:
        return int(math.log2(min(self.input_width, self.input_height)))

    @property
    def ratio(self) -> int:
        return int(self.input_width / self.input_height)

    def setup(self):
        unet_narrow = self.narrow * 0.5
        channels = {
            4: int(512 * unet_narrow), 8: int(512 * unet_narrow),
            16: int(512 * unet_narrow), 32: int(512 * unet_narrow),
            64: int(256 * self.channel_multiplier * unet_narrow),
            128: int(128 * self.channel_multiplier * unet_narrow),
            256: int(64 * self.channel_multiplier * unet_narrow),
            512: int(32 * self.channel_multiplier * unet_narrow),
            1024: int(16 * self.channel_multiplier * unet_narrow),
        }
        log_size = self.log_size
        first_out_size = 2 ** log_size

        self.conv_body_first = ConvLayer(channels[first_out_size], 1,
                                         use_bias=True, activate=True,
                                         name="conv_body_first",
                                         dtype=self.dtype)
        self.conv_body_down = [
            ResBlock(channels[2 ** (i - 1)], self.resample_kernel,
                     name=f"conv_body_down_{log_size - i}", dtype=self.dtype)
            for i in range(log_size, 2, -1)]
        self.final_conv = ConvLayer(channels[4], 3, use_bias=True,
                                    activate=True, name="final_conv",
                                    dtype=self.dtype)
        self.conv_body_up = [
            ResUpBlock(channels[2 ** i], name=f"conv_body_up_{i - 3}",
                       dtype=self.dtype)
            for i in range(3, log_size + 1)]
        self.toRGB = [
            EqualConv2d(3, 1, stride=1, padding=0, use_bias=True,
                        bias_init_val=0.0, name=f"toRGB_{i - 3}",
                        dtype=self.dtype)
            for i in range(3, log_size + 1)]

        if self.different_w:
            linear_out = (log_size * 2 - 2) * self.num_style_feat
        else:
            linear_out = self.num_style_feat
        self.final_linear = EqualLinear(linear_out, use_bias=True,
                                        bias_init_val=0.0, lr_mul=1.0,
                                        activation=None, name="final_linear",
                                        dtype=self.dtype)

        self.stylegan_decoder = StyleGAN2OCRGenerator(
            input_width=self.input_width, input_height=self.input_height,
            num_style_feat=self.num_style_feat, num_mlp=self.num_mlp,
            channel_multiplier=self.channel_multiplier,
            resample_kernel=self.resample_kernel, lr_mlp=self.lr_mlp,
            narrow=self.narrow, sft_half=self.sft_half,
            name="stylegan_decoder", dtype=self.dtype)

        cond_scale, cond_shift = [], []
        for i in range(3, log_size + 1):
            out_ch = channels[2 ** i]
            sft_out = out_ch if self.sft_half else out_ch * 2
            cond_scale.append(SFTCondition(out_ch, sft_out,
                                           final_bias_init=1.0,
                                           name=f"condition_scale_{i - 3}",
                                           dtype=self.dtype))
            cond_shift.append(SFTCondition(out_ch, sft_out,
                                           final_bias_init=0.0,
                                           name=f"condition_shift_{i - 3}",
                                           dtype=self.dtype))
        self.condition_scale = cond_scale
        self.condition_shift = cond_shift

    def __call__(self, x, return_latents=False, return_rgb=True,
                 randomize_noise=True, noise=None):
        conditions = []
        unet_skips = []
        out_rgbs = []

        feat = self.conv_body_first(x)
        for i in range(self.log_size - 2):
            feat = self.conv_body_down[i](feat)
            unet_skips.insert(0, feat)
        feat = self.final_conv(feat)

        # style code: reference flattens NCHW (c,h,w); we flatten NHWC and the
        # weight importer permutes final_linear's input features to match.
        style_code = self.final_linear(feat.reshape(feat.shape[0], -1))
        if self.different_w:
            style_code = style_code.reshape(
                style_code.shape[0], -1, self.num_style_feat)

        for i in range(self.log_size - 2):
            feat = feat + unet_skips[i]
            feat = self.conv_body_up[i](feat)
            scale = self.condition_scale[i](feat)
            conditions.append(scale)
            shift = self.condition_shift[i](feat)
            conditions.append(shift)
            if return_rgb:
                out_rgbs.append(self.toRGB[i](feat))

        image, _ = self.stylegan_decoder(
            [style_code], conditions,
            input_is_latent=self.input_is_latent,
            randomize_noise=randomize_noise, noise=noise,
            return_latents=return_latents)
        return image, out_rgbs
