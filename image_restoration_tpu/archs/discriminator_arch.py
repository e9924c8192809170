"""VGG-style discriminators (SRGAN/ESRGAN) + UNet-SN discriminator.

Parity with Car_Plate-Restoration/basicsr/archs/discriminator_arch.py:
VGGStyleDiscriminator128 (:7-72, BatchNorm) and VGGStyleDiscriminator256
(:76-149, SyncBatchNorm). On TPU, SyncBatchNorm is ordinary BatchNorm with
an `axis_name` so batch statistics are psum'd across the data-parallel mesh
axis — no backend-specific layer needed.

Also provides UNetDiscriminatorSN (spectral-norm UNet D named in
BASELINE.json's GAN fine-tune config — the Real-ESRGAN discriminator).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.resize import resize
from .arch_util import conv_kaiming

Dtype = Any


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


class _VGGStyleDiscriminator(nn.Module):
    """Shared body: conv0_0 .. conv{n}_1 pyramid + 2 linear heads."""
    num_in_ch: int = 3
    num_feat: int = 64
    input_size: int = 128
    axis_name: Optional[str] = None  # set for cross-replica (sync) BN
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math
        num_stages = int(math.log2(self.input_size)) - 2  # 128→5, 256→6
        feat_mult = [1, 2, 4, 8, 8, 8, 8]

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                axis_name=self.axis_name if train else None,
                                name=name, dtype=self.dtype)(h)

        h = conv_kaiming(self.num_feat, 3, name="conv0_0", dtype=self.dtype)(x)
        h = _lrelu(h)
        h = conv_kaiming(self.num_feat, 4, stride=2, padding=1,
                         use_bias=False, name="conv0_1", dtype=self.dtype)(h)
        h = _lrelu(bn(h, "bn0_1"))
        for s in range(1, num_stages):
            f = self.num_feat * feat_mult[min(s, 3)]
            h = conv_kaiming(f, 3, use_bias=False, name=f"conv{s}_0",
                             dtype=self.dtype)(h)
            h = _lrelu(bn(h, f"bn{s}_0"))
            h = conv_kaiming(f, 4, stride=2, padding=1, use_bias=False,
                             name=f"conv{s}_1", dtype=self.dtype)(h)
            h = _lrelu(bn(h, f"bn{s}_1"))
        h = h.reshape(h.shape[0], -1)
        h = _lrelu(nn.Dense(100, name="linear1", dtype=self.dtype)(h))
        return nn.Dense(1, name="linear2", dtype=self.dtype)(h)


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator128(_VGGStyleDiscriminator):
    input_size: int = 128


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator256(_VGGStyleDiscriminator):
    input_size: int = 256


class SpectralConv(nn.Module):
    """Conv2d with spectral normalization.

    Stateless formulation: σ is estimated by `power_iters` power iterations
    from a fixed deterministic start vector each forward (torch SN keeps a
    persistent `u` and runs 1 iteration/step; a few fresh iterations reach
    the same σ and need no mutable collection under jit).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    power_iters: int = 3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", jax.nn.initializers.variance_scaling(
            2.0, "fan_in", "normal"), (k, k, in_ch, self.features))
        w = jax.lax.stop_gradient(kernel).reshape(-1, self.features)
        u = jnp.ones((self.features,), w.dtype) / jnp.sqrt(
            jnp.asarray(self.features, w.dtype))
        for _ in range(self.power_iters):
            v = w @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w.T @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        sigma = v @ (w @ u)
        w_sn = kernel / jax.lax.stop_gradient(sigma)
        out = jax.lax.conv_general_dilated(
            x, w_sn.astype(x.dtype), (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    """Real-ESRGAN UNet discriminator with spectral norm (BASELINE GAN cfg)."""
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        nf, d = self.num_feat, self.dtype
        x0 = _lrelu(conv_kaiming(nf, 3, name="conv0", dtype=d)(x))
        x1 = _lrelu(SpectralConv(nf * 2, 4, 2, 1, use_bias=False,
                                 name="conv1", dtype=d)(x0, update_sn))
        x2 = _lrelu(SpectralConv(nf * 4, 4, 2, 1, use_bias=False,
                                 name="conv2", dtype=d)(x1, update_sn))
        x3 = _lrelu(SpectralConv(nf * 8, 4, 2, 1, use_bias=False,
                                 name="conv3", dtype=d)(x2, update_sn))
        # upsample path
        h, w = x3.shape[1], x3.shape[2]
        x4 = resize(x3, (h * 2, w * 2), "bilinear")
        x4 = _lrelu(SpectralConv(nf * 4, 3, 1, 1, use_bias=False,
                                 name="conv4", dtype=d)(x4, update_sn))
        if self.skip_connection:
            x4 = x4 + x2
        h, w = x4.shape[1], x4.shape[2]
        x5 = resize(x4, (h * 2, w * 2), "bilinear")
        x5 = _lrelu(SpectralConv(nf * 2, 3, 1, 1, use_bias=False,
                                 name="conv5", dtype=d)(x5, update_sn))
        if self.skip_connection:
            x5 = x5 + x1
        h, w = x5.shape[1], x5.shape[2]
        x6 = resize(x5, (h * 2, w * 2), "bilinear")
        x6 = _lrelu(SpectralConv(nf, 3, 1, 1, use_bias=False,
                                 name="conv6", dtype=d)(x6, update_sn))
        if self.skip_connection:
            x6 = x6 + x0
        out = _lrelu(SpectralConv(nf, 3, 1, 1, name="conv7",
                                  dtype=d)(x6, update_sn))
        out = _lrelu(SpectralConv(nf, 3, 1, 1, name="conv8",
                                  dtype=d)(out, update_sn))
        return SpectralConv(1, 3, 1, 1, name="conv9", dtype=d)(out, update_sn)
