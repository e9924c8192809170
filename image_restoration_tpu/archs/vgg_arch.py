"""VGG feature extractor for perceptual losses — flax/NHWC.

Parity with Car_Plate-Restoration/basicsr/archs/vgg_arch.py:56-161: VGG
convnet truncated at named taps (e.g. conv5_4), ImageNet mean/std input
normalization, optional (−1,1)→(0,1) range_norm, optional input resize.

torchvision is not a dependency: weights are imported from a torchvision
VGG19 state_dict .pth via convert/torch_import.py when available; with no
pretrained file the extractor still runs (random init) so the loss is
well-defined in tests.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY

Dtype = Any

# layer name → (conv features) walk; 'M' = maxpool
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
_CFGS = {"vgg19": VGG19_CFG, "vgg16": VGG16_CFG}


def vgg_layer_names(vgg_type: str = "vgg19"):
    names = []
    block, conv = 1, 0
    for v in _CFGS[vgg_type]:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            conv = 0
        else:
            conv += 1
            names.append(f"conv{block}_{conv}")
            names.append(f"relu{block}_{conv}")
    return names


def vgg19_layer_names():
    return vgg_layer_names("vgg19")


@ARCH_REGISTRY.register()
class VGGFeatureExtractor(nn.Module):
    """Run VGG19 and return features at `layer_name_list` taps."""
    layer_name_list: Sequence[str] = ("conv5_4",)
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        """x: NHWC RGB in [0,1] (or (−1,1) with range_norm)."""
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
            x = (x - mean) / std

        wanted = set(self.layer_name_list)
        # stop at the deepest requested tap
        names_seq = vgg_layer_names(self.vgg_type)
        last_idx = max(names_seq.index(n) for n in wanted)

        out = {}
        h = x
        block, conv = 1, 0
        idx = 0
        for v in _CFGS[self.vgg_type]:
            if idx > last_idx:
                break
            if v == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                name = f"pool{block}"
                if name in wanted:
                    out[name] = h
                block += 1
                conv = 0
                idx += 1
            else:
                conv += 1
                cname = f"conv{block}_{conv}"
                h = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                            name=cname, dtype=self.dtype)(h)
                if cname in wanted:
                    out[cname] = h
                idx += 1
                if idx > last_idx:
                    break
                h = jax.nn.relu(h)
                rname = f"relu{block}_{conv}"
                if rname in wanted:
                    out[rname] = h
                idx += 1
        return out
