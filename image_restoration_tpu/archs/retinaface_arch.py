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


class MobileNetV1Backbone(nn.Module):
    """Width-0.25 MobileNetV1 trunk (ref net.py:103-140): conv_bn +
    depthwise-separable conv_dw blocks; taps stage1/stage2/stage3 at
    strides 8/16/32 with 64/128/256 channels."""
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        def lrelu(h, slope):
            return jnp.where(h >= 0, h, h * slope)

        def conv_bn(h, oup, stride, name, leaky=0.1):
            h = nn.Conv(oup, (3, 3), (stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"{name}_conv", dtype=self.dtype)(h)
            return lrelu(bn(h, f"{name}_bn"), leaky)

        def conv_dw(h, oup, stride, name, leaky=0.1):
            inp = h.shape[-1]
            h = nn.Conv(inp, (3, 3), (stride, stride),
                        padding=((1, 1), (1, 1)), feature_group_count=inp,
                        use_bias=False, name=f"{name}_dw",
                        dtype=self.dtype)(h)
            h = lrelu(bn(h, f"{name}_dw_bn"), leaky)
            h = nn.Conv(oup, (1, 1), use_bias=False, name=f"{name}_pw",
                        dtype=self.dtype)(h)
            return lrelu(bn(h, f"{name}_pw_bn"), leaky)

        taps = {}
        h = conv_bn(x, 8, 2, "stage1_0")
        h = conv_dw(h, 16, 1, "stage1_1")
        h = conv_dw(h, 32, 2, "stage1_2")
        h = conv_dw(h, 32, 1, "stage1_3")
        h = conv_dw(h, 64, 2, "stage1_4")
        h = conv_dw(h, 64, 1, "stage1_5")
        taps["stage1"] = h
        for i, (oup, s) in enumerate([(128, 2)] + [(128, 1)] * 5):
            h = conv_dw(h, oup, s, f"stage2_{i}")
        taps["stage2"] = h
        h = conv_dw(h, 256, 2, "stage3_0")
        h = conv_dw(h, 256, 1, "stage3_1")
        taps["stage3"] = h
        return taps


class MobileNetV3Backbone(nn.Module):
    """MobileNetV3-style trunk for cfg_mobilenetv3.

    The reference's own V3 path is dead: retinaface.py:100-105 is commented
    out, so cfg 'MobilenetV3' leaves backbone=None and crashes upstream.
    This is a WORKING equivalent with the cfg's expected tap channels
    (in_channel 64 → 128/256/512 at strides 8/16/32): inverted-residual
    blocks with hard-swish, squeeze-excite omitted (detector-scale trunk).
    """
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        def hswish(h):
            return h * jax.nn.relu6(h + 3.0) / 6.0

        def inverted(h, oup, stride, expand, name):
            inp = h.shape[-1]
            mid = inp * expand
            r = nn.Conv(mid, (1, 1), use_bias=False, name=f"{name}_pw1",
                        dtype=self.dtype)(h)
            r = hswish(bn(r, f"{name}_bn1"))
            r = nn.Conv(mid, (3, 3), (stride, stride),
                        padding=((1, 1), (1, 1)), feature_group_count=mid,
                        use_bias=False, name=f"{name}_dw",
                        dtype=self.dtype)(r)
            r = hswish(bn(r, f"{name}_bn2"))
            r = nn.Conv(oup, (1, 1), use_bias=False, name=f"{name}_pw2",
                        dtype=self.dtype)(r)
            r = bn(r, f"{name}_bn3")
            if stride == 1 and inp == oup:
                r = r + h
            return r

        h = nn.Conv(16, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem_conv", dtype=self.dtype)(x)
        h = hswish(bn(h, "stem_bn"))
        h = inverted(h, 24, 2, 4, "block0")      # stride 4
        h = inverted(h, 24, 1, 3, "block1")
        taps = {}
        h = inverted(h, 128, 2, 3, "block2")     # stride 8
        h = inverted(h, 128, 1, 3, "block3")
        taps["layer2"] = h
        h = inverted(h, 256, 2, 3, "block4")     # stride 16
        h = inverted(h, 256, 1, 3, "block5")
        taps["layer3"] = h
        h = inverted(h, 512, 2, 3, "block6")     # stride 32
        h = inverted(h, 512, 1, 3, "block7")
        taps["layer4"] = h
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
        if self.backbone == "mobilenet0.25":
            taps = MobileNetV1Backbone(name="body",
                                       dtype=self.dtype)(x, train)
            feats = [taps["stage1"], taps["stage2"], taps["stage3"]]
        elif self.backbone == "MobilenetV3":
            taps = MobileNetV3Backbone(name="body",
                                       dtype=self.dtype)(x, train)
            feats = [taps["layer2"], taps["layer3"], taps["layer4"]]
        else:
            depth = 18 if "18" in self.backbone else 50
            taps = ResNetBackbone(depth, name="body",
                                  dtype=self.dtype)(x, train)
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
