"""SRVGGNetCompact (Real-ESRGAN 'general' compact SR net) — flax/NHWC.

Named in BASELINE.json ("SRVGGNetCompact (realesr-general) tiled inference");
the reference repo's closest in-tree analog is MSRResNet (SURVEY §2.4). This
implements the standard compact VGG-style SR net: a plain stack of 3×3 convs
with PReLU, a final conv to out·r² channels, pixel shuffle, and a nearest-
upsampled global skip — the fastest member of the model zoo and the primary
512² x4 tile benchmark subject alongside RRDBNet.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from ..ops.pixel_ops import pixel_shuffle
from .arch_util import conv_kaiming

Dtype = Any


@ARCH_REGISTRY.register()
class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"
    dtype: Dtype = None

    def _act(self, x, idx):
        if self.act_type == "relu":
            return jnp.maximum(x, 0)
        if self.act_type == "leakyrelu":
            return jnp.where(x >= 0, x, 0.1 * x)
        # prelu: learned per-channel negative slope
        alpha = self.param(f"prelu_{idx}",
                           lambda k, s: jnp.full(s, 0.25, jnp.float32),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        out = conv_kaiming(self.num_feat, 3, name="body_0", dtype=d)(x)
        out = self._act(out, 0)
        for i in range(self.num_conv):
            out = conv_kaiming(self.num_feat, 3, name=f"body_{i + 1}",
                               dtype=d)(out)
            out = self._act(out, i + 1)
        out = conv_kaiming(self.num_out_ch * self.upscale ** 2, 3,
                           name="conv_last", dtype=d)(out)
        out = pixel_shuffle(out, self.upscale)
        # nearest-upsample global skip
        n, h, w, c = x.shape
        r = self.upscale
        base = jnp.broadcast_to(x[:, :, None, :, None, :],
                                (n, h, r, w, r, c)).reshape(n, h * r, w * r, c)
        return out + base
