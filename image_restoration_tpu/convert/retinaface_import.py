"""Import reference RetinaFace torch weights into the flax RetinaFace.

Covers all three backbones (Plate_Detect/Retina-License-Plate/models/
{retinaface.py,net.py}): torchvision resnet18/50 bodies resolve through the
generic structure-driven converter; the MobileNetV1 body and the
FPN/SSH/head Sequentials need key rules mapping torch's numeric
Sequential indices onto this repo's named conv/bn pairs.
"""

from __future__ import annotations

from typing import Dict

from .torch_import import convert_state_dict, load_pth

# torch Sequential index → our layer-name suffix
_RULES = [
    # FPN: Sequential(conv, bn, lrelu)
    (r"^fpn\.(output\d|merge\d)\.0\.", r"fpn.\1_conv."),
    (r"^fpn\.(output\d|merge\d)\.1\.", r"fpn.\1_bn."),
    # SSH branches
    (r"^(ssh\d)\.(conv3X3|conv5X5_1|conv5X5_2|conv7X7_2|conv7x7_3)\.0\.",
     r"\1.\2_conv."),
    (r"^(ssh\d)\.(conv3X3|conv5X5_1|conv5X5_2|conv7X7_2|conv7x7_3)\.1\.",
     r"\1.\2_bn."),
    # per-level 1×1 heads
    (r"^(ClassHead|BboxHead|LandmarkHead)\.(\d)\.conv1x1\.", r"\1_\2."),
    # MobileNetV1 body — stage1.0 is conv_bn(conv, bn, lrelu) ...
    (r"^body\.stage1\.0\.0\.", r"body.stage1_0_conv."),
    (r"^body\.stage1\.0\.1\.", r"body.stage1_0_bn."),
    # ... all other blocks are conv_dw(dw, bn, lrelu, pw, bn, lrelu)
    (r"^body\.stage(\d)\.(\d+)\.0\.", r"body.stage\1_\2_dw."),
    (r"^body\.stage(\d)\.(\d+)\.1\.", r"body.stage\1_\2_dw_bn."),
    (r"^body\.stage(\d)\.(\d+)\.3\.", r"body.stage\1_\2_pw."),
    (r"^body\.stage(\d)\.(\d+)\.4\.", r"body.stage\1_\2_pw_bn."),
]


def load_torch_retinaface(state_dict: Dict, variables: Dict) -> Dict:
    """state_dict: torch name → array (or a .pth path); variables: flax
    init variables (params [+ batch_stats]). Returns updated variables."""
    if isinstance(state_dict, str):
        state_dict = load_pth(state_dict, param_key=None)
    params_sd, stats_sd = {}, {}
    for k, v in state_dict.items():
        if k.startswith(("body.fc.", "body.avg", "fc.")) or \
                k.endswith("num_batches_tracked"):
            continue
        if k.endswith(("running_mean", "running_var")):
            stats_sd[k] = v
        else:
            params_sd[k] = v
    out = dict(variables)
    out["params"] = convert_state_dict(params_sd, variables["params"],
                                       key_rules=_RULES, strict=True)
    if "batch_stats" in variables:
        out["batch_stats"] = convert_state_dict(
            stats_sd, variables["batch_stats"], key_rules=_RULES,
            strict=True)
    return out
