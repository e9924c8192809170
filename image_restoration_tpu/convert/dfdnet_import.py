"""Import reference DFDNet torch weights (basicsr/archs/dfdnet_arch.py:50).

Every conv in the reference is spectral_norm-wrapped, so checkpoints carry
(weight_orig, weight_u, weight_v) triples — folded to the effective W/σ
first. The VGG face encoder's Sequential is named by layer
('vgg_extractor.vgg_net.conv1_1.*'), which maps onto this repo's
VGGFeatureExtractor once the '.vgg_net' level is stripped; its mean/std
normalization buffers are constants here and are dropped.

The part dictionaries live OUTSIDE the state_dict in the reference
(`self.dict = torch.load(dict_path)`, :69) — convert them separately with
`convert_dfdnet_dict` (NCHW → NHWC per atom).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .torch_import import convert_state_dict, load_pth
from .hifacegan_import import fold_spectral_norm


def load_torch_dfdnet(state_dict, flax_params) -> Dict:
    """torch DFDNet state dict (or .pth path) → flax params tree."""
    if isinstance(state_dict, str):
        state_dict = load_pth(state_dict, param_key=None)
    state_dict = fold_spectral_norm(
        {k: np.asarray(v) for k, v in state_dict.items()})
    key_rules = (
        (r"^vgg_extractor\.vgg_net\.", "vgg_extractor."),
        (r"^vgg_extractor\.(mean|std)$", None),
    )
    return convert_state_dict(state_dict, flax_params, key_rules=key_rules,
                              strict=True)


def convert_dfdnet_dict(torch_dict) -> Dict:
    """Reference dict_path pickle {'256': {part: (K,C,h,w) tensor}} →
    {'256': {part: (K,h,w,C) float32}} for DFDNet.__call__."""
    out = {}
    for size, parts in torch_dict.items():
        out[str(size)] = {
            part: np.ascontiguousarray(
                np.asarray(v, np.float32).transpose(0, 2, 3, 1))
            for part, v in parts.items()}
    return out
