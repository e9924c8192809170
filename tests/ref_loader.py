"""Load reference PyTorch arch modules (read-only, /root/reference) for
golden-parity testing, WITHOUT executing the package __init__ chain (which
would try to build CUDA extensions).

We pre-register stub `basicsr.*` modules providing pure-PyTorch equivalents
of the CUDA ops (our own formulations — the same math the CPU fallbacks
compute), then import individual arch files through the package machinery so
their relative imports resolve.
"""

import logging
import math
import sys
import types

import torch
from torch import nn
import torch.nn.functional as F

REF_ROOT = "/root/reference/Car_Plate-Restoration"


def _fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        shape = [1, -1] + [1] * (x.dim() - 2)
        x = x + bias.view(*shape)
    return F.leaky_relu(x, negative_slope) * scale


class _FusedLeakyReLU(nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return _fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)


def _upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Pure-torch upfirdn2d (zero-insert → pad → conv(flipped) → subsample)."""
    b, c, h, w = x.shape
    x = x.reshape(b * c, 1, h, w)
    out = torch.zeros(b * c, 1, h * up, w * up, dtype=x.dtype)
    out[:, :, ::up, ::up] = x
    p0, p1 = pad
    out = F.pad(out, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
    if p0 < 0 or p1 < 0:
        out = out[:, :, max(-p0, 0):out.shape[2] - max(-p1, 0),
                  max(-p0, 0):out.shape[3] - max(-p1, 0)]
    k = torch.flip(kernel, [0, 1])[None, None]
    out = F.conv2d(out, k)
    out = out[:, :, ::down, ::down]
    return out.reshape(b, c, out.shape[2], out.shape[3])


def _modulated_deform_conv(x, offset, mask, weight, bias=None, stride=1,
                           padding=0, dilation=1, groups=1,
                           deformable_groups=1):
    """Pure-torch DCNv2 matching the reference CUDA semantics
    (ops/dcn/src/deform_conv_cuda_kernel.cu modulated_deformable_im2col):
    per deformable group g and tap t, sample position = base + dilation·t
    − padding + (offset[g·2K+2t], offset[g·2K+2t+1]) with zero-padded
    bilinear; multiply by mask[g·K+t]; contract with the weights."""
    if isinstance(stride, tuple):
        stride = stride[0]
    if isinstance(padding, tuple):
        padding = padding[0]
    assert groups == 1, "stub supports weight groups == 1"
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    k = kh * kw
    dg = deformable_groups
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = torch.arange(ho, dtype=x.dtype) * stride - padding
    base_x = torch.arange(wo, dtype=x.dtype) * stride - padding
    out = torch.zeros(b, cout, ho, wo, dtype=x.dtype)
    cpg = cin // dg
    for g in range(dg):
        xg = x[:, g * cpg:(g + 1) * cpg]
        for t in range(k):
            ty, tx = divmod(t, kw)
            sy = (base_y.view(1, -1, 1) + ty * dilation +
                  offset[:, g * 2 * k + 2 * t])
            sx = (base_x.view(1, 1, -1) + tx * dilation +
                  offset[:, g * 2 * k + 2 * t + 1])
            y0, x0 = torch.floor(sy), torch.floor(sx)
            wy, wx = sy - y0, sx - x0
            samp = 0
            for yy, wyy in ((y0, 1 - wy), (y0 + 1, wy)):
                for xx, wxx in ((x0, 1 - wx), (x0 + 1, wx)):
                    ok = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) &
                          (xx <= w - 1)).to(x.dtype)
                    yi = yy.clamp(0, h - 1).long()
                    xi = xx.clamp(0, w - 1).long()
                    idx = (yi * w + xi).view(b, 1, -1).expand(b, cpg, -1)
                    v = torch.gather(xg.reshape(b, cpg, h * w), 2, idx)
                    samp = samp + (v.view(b, cpg, ho, wo) *
                                   (ok * wyy * wxx).unsqueeze(1))
            samp = samp * mask[:, g * k + t].unsqueeze(1)
            wt = weight[:, g * cpg:(g + 1) * cpg, ty, tx]  # (cout, cpg)
            out = out + torch.einsum("oc,bchw->bohw", wt, samp)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class _ModulatedDeformConvPack(nn.Module):
    """Pure-torch ModulatedDeformConvPack (ref deform_conv.py:293-383)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=True):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deformable_groups = deformable_groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *kernel_size))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        n = in_channels * kernel_size[0] * kernel_size[1]
        self.weight.data.uniform_(-1 / math.sqrt(n), 1 / math.sqrt(n))
        self.conv_offset = nn.Conv2d(
            in_channels,
            deformable_groups * 3 * kernel_size[0] * kernel_size[1],
            kernel_size=kernel_size, stride=stride, padding=padding,
            dilation=dilation, bias=True)
        self.conv_offset.weight.data.zero_()
        self.conv_offset.bias.data.zero_()

    def forward(self, x):
        out = self.conv_offset(x)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return _modulated_deform_conv(
            x, offset, mask, self.weight, self.bias, self.stride,
            self.padding, self.dilation, self.groups,
            self.deformable_groups)


def install_stubs():
    if "basicsr" in sys.modules:
        return

    def pkg(name, path=None):
        mod = types.ModuleType(name)
        if path:
            mod.__path__ = [path]
        sys.modules[name] = mod
        return mod

    pkg("basicsr", f"{REF_ROOT}/basicsr")
    pkg("basicsr.archs", f"{REF_ROOT}/basicsr/archs")
    pkg("basicsr.ops")
    utils = pkg("basicsr.utils", f"{REF_ROOT}/basicsr/utils")
    utils.get_root_logger = lambda *a, **k: logging.getLogger("ref")

    registry = pkg("basicsr.utils.registry")

    class _Registry:
        def register(self, obj=None, suffix=None):
            if obj is None:
                return lambda f: f
            return obj

        def get(self, name):
            raise KeyError(name)

    for rname in ("ARCH_REGISTRY", "MODEL_REGISTRY", "DATASET_REGISTRY",
                  "LOSS_REGISTRY", "METRIC_REGISTRY"):
        setattr(registry, rname, _Registry())
    utils.registry = registry

    fused = pkg("basicsr.ops.fused_act")
    fused.fused_leaky_relu = _fused_leaky_relu
    fused.FusedLeakyReLU = _FusedLeakyReLU

    up = pkg("basicsr.ops.upfirdn2d")
    up.upfirdn2d = _upfirdn2d

    dcn = pkg("basicsr.ops.dcn")
    dcn.ModulatedDeformConvPack = _ModulatedDeformConvPack
    dcn.modulated_deform_conv = _modulated_deform_conv
    dcn.DeformConv = object
    dcn.DeformConvPack = object
    dcn.deform_conv = None
    dcn.ModulatedDeformConv = object

    pkg("basicsr.losses", f"{REF_ROOT}/basicsr/losses")
    pkg("basicsr.metrics", f"{REF_ROOT}/basicsr/metrics")
    pkg("basicsr.data", f"{REF_ROOT}/basicsr/data")

    # torchvision is not installed; vgg_arch needs importability plus a
    # constructible (random-init) vgg19 for the DFDNet golden test
    if "torchvision" not in sys.modules:
        import torch.nn as _tnn

        def _vgg19(weights=None, pretrained=False):
            cfg_e = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                     512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
            layers, in_ch = [], 3
            for v in cfg_e:
                if v == "M":
                    layers.append(_tnn.MaxPool2d(2, 2))
                else:
                    layers.append(_tnn.Conv2d(in_ch, v, 3, padding=1))
                    layers.append(_tnn.ReLU(inplace=True))
                    in_ch = v
            net = _tnn.Module()
            net.features = _tnn.Sequential(*layers)
            return net

        tv = pkg("torchvision")
        tvm = pkg("torchvision.models")
        tv.models = tvm
        tvm.vgg = types.SimpleNamespace(vgg19=_vgg19)
        tvm.VGG19_Weights = types.SimpleNamespace(DEFAULT=None)
        # plain-torch inception blocks so the reference FID backbone
        # (basicsr/archs/inception.py) is constructible at random init
        import tv_inception_stub as _tvi
        tvm.inception = _tvi
        tvm.inception_v3 = _tvi.inception_v3
        sys.modules["torchvision.models.inception"] = _tvi
        tvt = pkg("torchvision.transforms")
        tvf = pkg("torchvision.transforms.functional_tensor")
        tvf.rgb_to_grayscale = lambda x: (
            0.299 * x[..., 0:1, :, :] + 0.587 * x[..., 1:2, :, :] +
            0.114 * x[..., 2:3, :, :])
        tvt.functional_tensor = tvf

    if "pyblur" not in sys.modules:
        pb = pkg("pyblur")
        pb.RandomizedBlur = lambda img: img
        pb.RandomMotion = lambda img: img
        pb.RandomCover = lambda img: img
        pb.LinearMotionBlur = lambda img, *a, **k: img


def load_ref_module(dotted: str):
    """e.g. load_ref_module('losses.losses') / ('metrics.psnr_ssim')."""
    install_stubs()
    import importlib
    return importlib.import_module(f"basicsr.{dotted}")


def load_ref_arch(module_name: str):
    """e.g. load_ref_arch('rrdbnet_arch') → the reference torch module."""
    install_stubs()
    import importlib
    return importlib.import_module(f"basicsr.archs.{module_name}")
