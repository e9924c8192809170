"""Import torchvision VGG19 weights into the flax VGGFeatureExtractor.

torchvision state_dict keys are `features.<seq_idx>.{weight,bias}`; we map
sequential indices to conv{block}_{conv} names (the reference's NAMES_VGG19
layout, basicsr/archs/vgg_arch.py:9-52).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..archs.vgg_arch import _CFGS, VGG19_CFG  # noqa: F401


def _seq_index_to_name(vgg_type: str = "vgg19"):
    mapping = {}
    idx = 0
    block, conv = 1, 0
    for v in _CFGS[vgg_type]:
        if v == "M":
            block += 1
            conv = 0
            idx += 1  # pool layer
        else:
            conv += 1
            mapping[idx] = f"conv{block}_{conv}"
            idx += 2  # conv + relu
    return mapping


def load_torchvision_vgg(path: str, variables, vgg_type: str = "vgg19"):
    from .torch_import import load_pth
    sd = load_pth(path, param_key=None)
    mapping = _seq_index_to_name(vgg_type)
    params = dict(variables["params"])
    for idx, name in mapping.items():
        wkey, bkey = f"features.{idx}.weight", f"features.{idx}.bias"
        if wkey not in sd or name not in params:
            continue
        params[name] = {
            "kernel": jnp.asarray(
                np.asarray(sd[wkey]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[bkey])),
        }
    out = dict(variables)
    out["params"] = params
    return out


def load_torchvision_vgg19(path: str, variables):
    return load_torchvision_vgg(path, variables, "vgg19")
