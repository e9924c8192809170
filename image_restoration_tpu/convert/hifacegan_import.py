"""Import reference HiFaceGAN SPADE-block torch weights.

The reference wraps its convs in torch spectral_norm
(hifacegan_util.py:78-90), so checkpoints store `weight_orig` plus the
power-iteration vectors `weight_u`/`weight_v`. At eval torch computes the
effective weight W_orig / σ with σ = uᵀ·W·v from the STORED vectors —
`fold_spectral_norm` materializes exactly that, after which the generic
structure-driven converter maps the plain conv weights onto the flax
SPADE/SPADEResnetBlock params.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .torch_import import convert_state_dict, load_pth


def fold_spectral_norm(state_dict: Dict) -> Dict:
    """Replace (weight_orig, weight_u, weight_v) triples with the effective
    spectral-normalized weight; other keys pass through."""
    out = {}
    for k, v in state_dict.items():
        if k.endswith("weight_orig"):
            base = k[: -len("_orig")]
            w = np.asarray(v, np.float64)
            u = np.asarray(state_dict[base + "_u"], np.float64)
            vv = np.asarray(state_dict[base + "_v"], np.float64)
            sigma = u @ w.reshape(w.shape[0], -1) @ vv
            out[base] = (w / sigma).astype(np.float32)
        elif k.endswith(("weight_u", "weight_v")):
            continue
        else:
            out[k] = v
    return out


def load_torch_hifacegan_block(state_dict, flax_params):
    """torch SPADEResnetBlock/SPADE state dict (or .pth path) → flax params
    template (archs/hifacegan_arch.py SPADEResnetBlock)."""
    if isinstance(state_dict, str):
        state_dict = load_pth(state_dict, param_key=None)
    state_dict = fold_spectral_norm(
        {k: np.asarray(v) for k, v in state_dict.items()})
    return convert_state_dict(state_dict, flax_params, strict=True)
