"""Import torchvision resnet18/50 weights into the RetinaFace backbone.

Splits the torch state_dict into parameter and running-stat tensors and maps
each onto the flax 'params' / 'batch_stats' collections (the detector's
pretrained trunk, Plate_Detect retinaface.py:95-100).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .torch_import import convert_state_dict, load_pth


def load_torchvision_resnet(path: str, variables: Dict,
                            backbone_name: str = "body") -> Dict:
    sd = load_pth(path, param_key=None)
    params_sd, stats_sd = {}, {}
    for k, v in sd.items():
        if k.startswith("fc."):
            continue  # classification head unused
        key = f"{backbone_name}.{k}"
        if k.endswith(("running_mean", "running_var")):
            stats_sd[key] = v
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            params_sd[key] = v

    out = dict(variables)
    out["params"] = convert_state_dict(params_sd, variables["params"],
                                       strict=False)
    if "batch_stats" in variables:
        out["batch_stats"] = convert_state_dict(
            stats_sd, variables["batch_stats"], strict=False)
    return out
