"""RetinaFace-style license-plate detector — flax/NHWC.

Parity with Plate_Detect/Retina-License-Plate/models/{retinaface.py,net.py}:
ResNet backbone with layer2/3/4 taps (IntermediateLayerGetter,
retinaface.py:107), FPN (net.py:68-101), 3×SSH (net.py:40-66), and 1×1-conv
Class/Bbox/Landmark heads with 2 anchors (retinaface.py:32-64,120-140).
Test phase applies softmax to classifications (:161).

torchvision resnet18/50 weights import via convert/resnet_import.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        identity = x
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
                      dtype=self.dtype)(x)
        out = jax.nn.relu(bn(out, "bn1"))
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = bn(out, "bn2")
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name="downsample_0", dtype=self.dtype)(x)
            identity = bn(identity, "downsample_1")
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1",
                      dtype=self.dtype)(x)
        out = jax.nn.relu(bn(out, "bn1"))
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
                      dtype=self.dtype)(out)
        out = jax.nn.relu(bn(out, "bn2"))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      name="conv3", dtype=self.dtype)(out)
        out = bn(out, "bn3")
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            identity = nn.Conv(self.features * 4, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name="downsample_0", dtype=self.dtype)(x)
            identity = bn(identity, "downsample_1")
        return jax.nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """torchvision-compatible resnet18/50 trunk returning layer2/3/4 taps."""
    depth: int = 18
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = ((BasicBlock, (2, 2, 2, 2)) if self.depth == 18
                         else (Bottleneck, (3, 4, 6, 3)))
        h = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype)(h)
        h = jax.nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        taps = {}
        feats = (64, 128, 256, 512)
        for li, (f, n) in enumerate(zip(feats, layers), start=1):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 1) else 1
                h = block(f, stride, name=f"layer{li}_{bi}",
                          dtype=self.dtype)(h, train)
            if li >= 2:
                taps[f"layer{li}"] = h
        return taps


def _conv_bn(x, features, name, train, stride=1, ksize=3, leaky=0.0,
             relu=True, dtype=None):
    pad = ksize // 2
    h = nn.Conv(features, (ksize, ksize), (stride, stride),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                name=f"{name}_conv", dtype=dtype)(x)
    h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, name=f"{name}_bn", dtype=dtype)(h)
    if relu:
        h = jnp.where(h >= 0, h, h * leaky)
    return h


class SSH(nn.Module):
    """3/5/7-receptive-field conv fusion (ref net.py:40-66)."""
    out_channel: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channel
        leaky = 0.1 if oc <= 64 else 0.0
        c3 = _conv_bn(x, oc // 2, "conv3X3", train, relu=False,
                      dtype=self.dtype)
        c5_1 = _conv_bn(x, oc // 4, "conv5X5_1", train, leaky=leaky,
                        dtype=self.dtype)
        c5 = _conv_bn(c5_1, oc // 4, "conv5X5_2", train, relu=False,
                      dtype=self.dtype)
        c7_2 = _conv_bn(c5_1, oc // 4, "conv7X7_2", train, leaky=leaky,
                        dtype=self.dtype)
        c7 = _conv_bn(c7_2, oc // 4, "conv7x7_3", train, relu=False,
                      dtype=self.dtype)
        return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    """Top-down feature pyramid (ref net.py:68-101)."""
    out_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        oc = self.out_channels
        leaky = 0.1 if oc <= 64 else 0.0
        o1 = _conv_bn(inputs[0], oc, "output1", train, ksize=1, leaky=leaky,
                      dtype=self.dtype)
        o2 = _conv_bn(inputs[1], oc, "output2", train, ksize=1, leaky=leaky,
                      dtype=self.dtype)
        o3 = _conv_bn(inputs[2], oc, "output3", train, ksize=1, leaky=leaky,
                      dtype=self.dtype)

        def up_nearest(x, hw):
            n, h, w, c = x.shape
            oh, ow = hw
            ry, rx = oh // h, ow // w
            if ry * h == oh and rx * w == ow:
                x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                     (n, h, ry, w, rx, c))
                return x.reshape(n, oh, ow, c)
            return jax.image.resize(x, (n, oh, ow, c), "nearest")

        o2 = o2 + up_nearest(o3, o2.shape[1:3])
        o2 = _conv_bn(o2, oc, "merge2", train, leaky=leaky, dtype=self.dtype)
        o1 = o1 + up_nearest(o2, o1.shape[1:3])
        o1 = _conv_bn(o1, oc, "merge1", train, leaky=leaky, dtype=self.dtype)
        return [o1, o2, o3]


@ARCH_REGISTRY.register()
class RetinaFace(nn.Module):
    """Backbone → FPN → SSH → per-level 1×1 heads (2 anchors)."""
    backbone: str = "Resnet18"
    out_channel: int = 256
    phase: str = "train"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth = 18 if "18" in self.backbone else 50
        taps = ResNetBackbone(depth, name="body", dtype=self.dtype)(x, train)
        feats = [taps["layer2"], taps["layer3"], taps["layer4"]]
        feats = FPN(self.out_channel, name="fpn",
                    dtype=self.dtype)(feats, train)
        feats = [SSH(self.out_channel, name=f"ssh{i + 1}",
                     dtype=self.dtype)(f, train)
                 for i, f in enumerate(feats)]

        locs, confs, landmss = [], [], []
        n = x.shape[0]
        for i, f in enumerate(feats):
            loc = nn.Conv(2 * 4, (1, 1), name=f"BboxHead_{i}",
                          dtype=self.dtype)(f)
            conf = nn.Conv(2 * 2, (1, 1), name=f"ClassHead_{i}",
                           dtype=self.dtype)(f)
            landm = nn.Conv(2 * 10, (1, 1), name=f"LandmarkHead_{i}",
                            dtype=self.dtype)(f)
            locs.append(loc.reshape(n, -1, 4))
            confs.append(conf.reshape(n, -1, 2))
            landmss.append(landm.reshape(n, -1, 10))
        bbox = jnp.concatenate(locs, axis=1)
        classif = jnp.concatenate(confs, axis=1)
        ldm = jnp.concatenate(landmss, axis=1)
        if self.phase != "train":
            classif = jax.nn.softmax(classif, axis=-1)
        return bbox, classif, ldm
