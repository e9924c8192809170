"""Import insightface/arcface `iresnetXX` torch weights into IResNet.

Folds every BatchNorm (γ, β, running_mean, running_var, ε=1e-5) into the
FoldedBN scale/shift pair (the net is eval-only — see archs/iresnet_arch),
transposes conv kernels OIHW→HWIO, and permutes the fc input dim from the
torch NCHW flatten order (C,H,W) to our NHWC flatten order (H,W,C).

Reference context: basicsr/models/gfpgan_model.py:198 loads
`backbones.iresnet18` + `pretrain_network_identity` — broken upstream;
this importer is the working path for those same checkpoints.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_EPS = 1e-5


def _fold_bn(sd, prefix):
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + _EPS)
    return {"scale": jnp.asarray(scale),
            "shift": jnp.asarray(beta - mean * scale)}


def _conv(sd, key):
    w = np.asarray(sd[key], np.float32)  # (O,I,kh,kw)
    return jnp.asarray(w.transpose(2, 3, 1, 0))


def import_iresnet(state_dict, layers=(2, 2, 2, 2), feat_hw=7):
    """torch state_dict (or .pth path) → IResNet params pytree."""
    if isinstance(state_dict, str):
        import torch
        state_dict = torch.load(state_dict, map_location="cpu")
        if "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
        state_dict = {k: v.numpy() for k, v in state_dict.items()}
    sd = state_dict
    params = {
        "conv1": {"kernel": _conv(sd, "conv1.weight")},
        "bn1": _fold_bn(sd, "bn1"),
        "prelu": jnp.asarray(np.asarray(sd["prelu.weight"], np.float32)),
        "bn2": _fold_bn(sd, "bn2"),
        "features": _fold_bn(sd, "features"),
    }
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            t = f"layer{li + 1}.{bi}"
            blk = {
                "bn1": _fold_bn(sd, f"{t}.bn1"),
                "conv1": {"kernel": _conv(sd, f"{t}.conv1.weight")},
                "bn2": _fold_bn(sd, f"{t}.bn2"),
                "prelu": jnp.asarray(
                    np.asarray(sd[f"{t}.prelu.weight"], np.float32)),
                "conv2": {"kernel": _conv(sd, f"{t}.conv2.weight")},
                "bn3": _fold_bn(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd, f"{t}.downsample.0.weight")}
                blk["downsample_bn"] = _fold_bn(sd, f"{t}.downsample.1")
            params[f"layer{li + 1}_{bi}"] = blk
    # fc: torch (out, C*H*W) over NCHW flatten; ours consumes NHWC flatten
    w = np.asarray(sd["fc.weight"], np.float32)
    out_f, in_f = w.shape
    c = in_f // (feat_hw * feat_hw)
    w = w.reshape(out_f, c, feat_hw, feat_hw).transpose(2, 3, 1, 0)
    params["fc"] = {"kernel": jnp.asarray(w.reshape(in_f, out_f)),
                    "bias": jnp.asarray(np.asarray(sd["fc.bias"],
                                                   np.float32))}
    return params
