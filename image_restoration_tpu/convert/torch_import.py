"""PyTorch state_dict → flax params importer.

Lets reference checkpoints (`net_g_*.pth` holding {'params', 'params_ema'} —
see Car_Plate-Restoration/basicsr/models/base_model.py:170-214) load into the
TPU-native networks, which is how BASELINE's "parity at matching weights" is
scored.

Mechanics: we walk each torch key against the *flax params template* (from
`module.init`), so the importer is structure-driven rather than a hand-written
per-arch table:
  * numeric segments from nn.Sequential are skipped or merged into flax's
    `name_{i}` list convention,
  * `weight` maps to `weight` (our equalized layers keep torch's name) or
    `kernel` (flax Conv/Dense), transposed OIHW→HWIO / (O,I)→(I,O),
  * activation-bias params of fused LeakyReLU land in `act_bias`,
  * flatten-boundary linears (features viewed as (C,H,W) in torch but
    (H,W,C) here) get their input features permuted via `flatten_fixes`.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_pth(path: str, param_key: Optional[str] = "params"):
    """Load a .pth checkpoint to a {key: np.ndarray} dict (CPU, no grad)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if param_key is not None and param_key in ckpt:
            ckpt = ckpt[param_key]
        elif "params_ema" in ckpt and param_key == "params":
            ckpt = ckpt["params_ema"]
        elif "state_dict" in ckpt:
            ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):  # strip DDP prefix (base_model.py:216-277)
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _template_paths(params: Dict) -> Dict:
    return params


def _resolve(tree: Dict, tokens: List[str]) -> Optional[Tuple[List[str], str]]:
    """Resolve torch key tokens against a flax template tree.

    Returns (path_to_submodule, leaf_name) or None if unresolvable.
    """
    path: List[str] = []
    node = tree
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        is_last = i == len(tokens) - 1
        if is_last:
            # leaf resolution
            if tok in node and not isinstance(node[tok], dict):
                return path, tok
            if tok == "weight":
                for cand in ("weight", "kernel", "scale"):  # scale = BN gamma
                    if cand in node and not isinstance(node[cand], dict):
                        return path, cand
            if tok == "bias":
                for cand in ("bias", "act_bias"):
                    if cand in node and not isinstance(node[cand], dict):
                        return path, cand
            if tok in ("running_mean", "running_var"):
                cand = {"running_mean": "mean", "running_var": "var"}[tok]
                if cand in node:
                    return path, cand
            return None
        nxt = tokens[i + 1]
        merged = f"{tok}_{nxt}"
        if merged in node and isinstance(node[merged], dict):
            path.append(merged)
            node = node[merged]
            i += 2
            continue
        if tok in node and isinstance(node[tok], dict):
            path.append(tok)
            node = node[tok]
            i += 1
            continue
        if tok.isdigit():
            layer = f"layer{tok}"
            if layer in node and isinstance(node[layer], dict):
                path.append(layer)
                node = node[layer]
                i += 1
                continue
            # bare Sequential index (ConvLayer etc.) — skip it
            i += 1
            continue
        if tok in ("activate", "activation"):
            # fused-lrelu submodule in torch; bias lives flat here
            i += 1
            continue
        return None
    return None


def _fit(value: np.ndarray, target_shape: Tuple[int, ...],
         flat_chw: Optional[Tuple[int, int, int]] = None) -> np.ndarray:
    """Transpose/reshape a torch tensor to the flax template shape."""
    v = value
    if flat_chw is not None and v.ndim == 2:
        # linear over a flattened (C,H,W): permute input features to (H,W,C)
        c, h, w = flat_chw
        out_dim = v.shape[0]
        v = v.reshape(out_dim, c, h, w).transpose(0, 2, 3, 1).reshape(
            out_dim, c * h * w)
    if v.shape == target_shape:
        return v
    if v.ndim == 5:  # Conv3d (O,I,D,H,W) → (D,H,W,I,O)
        t = v.transpose(2, 3, 4, 1, 0)
        if t.shape == target_shape:
            return t
    if v.ndim == 4:
        for perm in [(2, 3, 1, 0), (0, 2, 3, 1)]:
            t = v.transpose(perm)
            if t.shape == target_shape:
                return t
        # modulated conv weight with leading 1: (1,O,I,k,k)
        if v.ndim == 4 and v.shape[0] == 1:
            t = v[0]
            if t.shape == target_shape:
                return t
    if v.ndim == 5 and v.shape[0] == 1:
        t = v[0].transpose(2, 3, 1, 0)  # (O,I,k,k)→HWIO
        if t.shape == target_shape:
            return t
    if v.ndim == 2:
        t = v.transpose(1, 0)
        if t.shape == target_shape:
            return t
    if v.size == int(np.prod(target_shape)):
        return v.reshape(target_shape)
    raise ValueError(f"cannot fit torch tensor {value.shape} into "
                     f"flax param {target_shape}")


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       flax_params: Dict,
                       key_rules: Sequence[Tuple[str, Any]] = (),
                       flatten_fixes: Optional[Dict[str, Tuple[int, int, int]]] = None,
                       strict: bool = True) -> Dict:
    """Map a torch state_dict onto a flax params template.

    Args:
      state_dict: torch name → numpy array.
      flax_params: template pytree (nested dicts) from module.init.
      key_rules: list of (regex, repl) applied to torch keys first; a repl of
        None drops the key (e.g. noise buffers handled elsewhere).
      flatten_fixes: flax path prefix (joined by '/') → (C,H,W) of the torch
        flatten so linear input features can be permuted.
      strict: raise on unmatched torch keys or unfilled flax leaves.
    """
    import jax.numpy as jnp

    flatten_fixes = flatten_fixes or {}
    new_params = {}  # path tuple → array
    unmatched = []
    for key, value in state_dict.items():
        k = key
        dropped = False
        for pattern, repl in key_rules:
            if re.search(pattern, k):
                if repl is None:
                    dropped = True
                    break
                k = re.sub(pattern, repl, k)
        if dropped:
            continue
        res = _resolve(flax_params, k.split("."))
        if res is None:
            unmatched.append(key)
            continue
        path, leaf = res
        node = flax_params
        for p in path:
            node = node[p]
        target = node[leaf]
        prefix = "/".join(path + [leaf])
        flat_chw = None
        for fk, chw in flatten_fixes.items():
            if prefix.startswith(fk):
                flat_chw = chw
        fitted = _fit(np.asarray(value), tuple(target.shape), flat_chw)
        new_params[tuple(path + [leaf])] = jnp.asarray(
            fitted, dtype=target.dtype)

    if strict and unmatched:
        raise KeyError(f"{len(unmatched)} torch keys unmatched: "
                       f"{unmatched[:10]}")

    # fill the template
    filled_count = [0]

    def fill(node, path):
        out = {}
        for name, child in node.items():
            p = path + (name,)
            if isinstance(child, dict):
                out[name] = fill(child, p)
            elif p in new_params:
                out[name] = new_params[p]
                filled_count[0] += 1
            else:
                if strict:
                    raise KeyError(f"flax param {'/'.join(p)} not present in "
                                   "torch checkpoint")
                out[name] = child
        return out

    result = fill(flax_params, ())
    if strict and filled_count[0] != len(new_params):
        raise KeyError("some converted tensors did not land in the template")
    return result


# ------------------------------------------------------- per-arch presets

def gfpgan_key_rules(input_is_latent: bool = True):
    rules = [
        (r"^stylegan_decoder\.noises\..*", None),
        (r"^noises\..*", None),
    ]
    if input_is_latent:
        # style MLP is bypassed (production config input_is_latent: true),
        # so its params never materialize in the flax template — drop them.
        rules.append((r"\.style_mlp\.\d+\.", None))
    else:
        rules.append((r"style_mlp\.(\d+)",
                      lambda m: f"style_mlp_{int(m.group(1)) - 1}"))
    return rules


def stylegan_gen_key_rules():
    return [
        (r"^noises\..*", None),
        (r"^style_mlp\.(\d+)",
         lambda m: f"style_mlp_{int(m.group(1)) - 1}"),
    ]


def fold_conv_bn_pairs(state_dict: Dict, conv_re: str,
                       eps: float = 1e-5) -> Dict:
    """Fold `Conv(bias=False) → BatchNorm` Sequential pairs into a single
    conv weight+bias (eval semantics: scale = γ/√(var+ε),
    bias = β − mean·scale). `conv_re` must capture (prefix, index); the BN
    is expected at index+1. Non-matching keys pass through."""
    out = dict(state_dict)
    for key in list(state_dict):
        m = re.match(conv_re, key)
        if not m:
            continue
        prefix, idx = m.group(1), int(m.group(2))
        bn = f"{prefix}.{idx + 1}"
        if f"{bn}.running_mean" not in state_dict:
            continue  # final conv without BN
        gamma = np.asarray(state_dict[f"{bn}.weight"], np.float32)
        beta = np.asarray(state_dict[f"{bn}.bias"], np.float32)
        mean = np.asarray(state_dict[f"{bn}.running_mean"], np.float32)
        var = np.asarray(state_dict[f"{bn}.running_var"], np.float32)
        scale = gamma / np.sqrt(var + eps)
        w = np.asarray(state_dict[key], np.float32)  # (O,I,kh,kw)
        out[key] = w * scale[:, None, None, None]
        out[f"{prefix}.{idx}.bias"] = beta - mean * scale
        for suffix in ("weight", "bias", "running_mean", "running_var",
                       "num_batches_tracked"):
            out.pop(f"{bn}.{suffix}", None)
    return out


def import_network(arch_name: str, module, variables, state_dict):
    """Convert `state_dict` for a known arch into `variables`' params tree."""
    params = variables["params"]
    rules: Sequence = ()
    fixes: Dict[str, Tuple[int, int, int]] = {}
    if arch_name in ("GFPGANv1OCR",):
        rules = gfpgan_key_rules(module.input_is_latent)
        c4 = int(512 * module.narrow * 0.5)
        fixes = {"final_linear": (c4, 4, 4 * module.ratio)}
    elif arch_name in ("StyleGAN2OCRGenerator", "StyleGAN2Generator"):
        rules = stylegan_gen_key_rules()
    elif arch_name == "StyleGAN2Discriminator":
        from ..archs.stylegan2_arch import stylegan_channels
        channels = stylegan_channels(module.channel_multiplier, module.narrow)
        ratio = int(module.input_width / module.input_height)
        fixes = {"final_linear_0": (channels[4], 4, 4 * ratio)}
    elif arch_name in ("EDSR", "RCAN"):
        # arch_util.Upsample Sequential: convs at even indices
        rules = [
            (r"upsample\.(\d+)\.",
             lambda m: f"upsample.conv_{int(m.group(1)) // 2}."),
            # RCAN nesting: body.G.residual_group.B.rcab.{0,2,3.attention}
            (r"^body\.(\d+)\.residual_group\.(\d+)\.rcab\.0\.",
             r"group_\1.rcab_\2.conv1."),
            (r"^body\.(\d+)\.residual_group\.(\d+)\.rcab\.2\.",
             r"group_\1.rcab_\2.conv2."),
            (r"^body\.(\d+)\.residual_group\.(\d+)\.rcab\.3\.attention\.1\.",
             r"group_\1.rcab_\2.attention.fc1."),
            (r"^body\.(\d+)\.residual_group\.(\d+)\.rcab\.3\.attention\.3\.",
             r"group_\1.rcab_\2.attention.fc2."),
            (r"^body\.(\d+)\.conv\.", r"group_\1.conv."),
        ]
    elif arch_name == "RIDNet":
        rules = [
            (r"^(sub_mean|add_mean)\..*", None),
            (r"^body\.(\d+)\.", lambda m: f"body_{m.group(1)}."),
            (r"merge\.dilation1\.0\.", "merge.d1_conv1."),
            (r"merge\.dilation1\.2\.", "merge.d1_conv2."),
            (r"merge\.dilation2\.0\.", "merge.d2_conv1."),
            (r"merge\.dilation2\.2\.", "merge.d2_conv2."),
            (r"merge\.aggregation\.0\.", "merge.agg."),
            (r"block2\.body\.0\.", "block2.conv1."),
            (r"block2\.body\.2\.", "block2.conv2."),
            (r"block2\.body\.4\.", "block2.conv3."),
            (r"ca\.attention\.1\.", "ca.fc1."),
            (r"ca\.attention\.3\.", "ca.fc2."),
        ]
    elif arch_name == "SRVGGNetCompact":
        # Real-ESRGAN layout: body ModuleList interleaves convs (even
        # indices) and PReLU (odd); the final conv is the last entry.
        nlast = 2 * (module.num_conv + 1)

        def _body(m):
            i = int(m.group(1))
            if i == nlast:
                return f"conv_last.{m.group(2)}"
            if i % 2:
                return f"prelu_{i // 2}"  # PReLU alpha leaf
            return f"body_{i // 2}.{m.group(2)}"

        rules = [(r"^body\.(\d+)\.(weight|bias)$", _body)]
    elif arch_name == "DUF":
        # dense blocks: Sequential [BN,ReLU,conv1x1,BN,ReLU,conv3x3]
        rules = [
            (r"dense_block1\.dense_blocks\.(\d+)\.0\.",
             r"dense_block1.bn1_\1.bn."),
            (r"dense_block1\.dense_blocks\.(\d+)\.2\.",
             r"dense_block1.conv1_\1."),
            (r"dense_block1\.dense_blocks\.(\d+)\.3\.",
             r"dense_block1.bn2_\1.bn."),
            (r"dense_block1\.dense_blocks\.(\d+)\.5\.",
             r"dense_block1.conv2_\1."),
            (r"dense_block2\.temporal_reduce(\d)\.0\.",
             lambda m: f"dense_block2.bn1_{int(m.group(1)) - 1}.bn."),
            (r"dense_block2\.temporal_reduce(\d)\.2\.",
             lambda m: f"dense_block2.conv1_{int(m.group(1)) - 1}."),
            (r"dense_block2\.temporal_reduce(\d)\.3\.",
             lambda m: f"dense_block2.bn2_{int(m.group(1)) - 1}.bn."),
            (r"dense_block2\.temporal_reduce(\d)\.5\.",
             lambda m: f"dense_block2.conv2_{int(m.group(1)) - 1}."),
            (r"^bn3d2\.", "bn3d2.bn."),
        ]
    elif arch_name == "TOFlow":
        # SPyNetTOF interleaves bias-free convs with BatchNorm (tof_arch
        # BasicModule :16-29); our module is the eval-only folded form, so
        # fold γ/β/stats into each conv's kernel+bias at import.
        state_dict = fold_conv_bn_pairs(
            state_dict, conv_re=r"(spynet\.basic_module\.\d+\."
                                r"basic_module)\.(\d+)\.weight$")
        rules = [
            (r"spynet\.basic_module\.(\d+)\.basic_module\.(\d+)\.",
             lambda m: (f"spynet.basic_module_{m.group(1)}."
                        f"conv{int(m.group(2)) // 3}.")),
            (r"^(mean|std)$", None),
        ]
    elif arch_name in ("BasicVSR", "IconVSR"):
        # SpyNet submodule: torch basic_module.N.basic_module.M Sequential
        # → flax basic_module_N.conv{M//2}; mean/std are constants here
        rules = [
            (r"spynet\.basic_module\.(\d+)\.basic_module\.(\d+)",
             lambda m: (f"spynet.basic_module_{m.group(1)}."
                        f"conv{int(m.group(2)) // 2}")),
            (r"spynet\.(mean|std)$", None),
            # ConvResidualBlocks: main.0 conv + main.2.N residual blocks
            (r"\.main\.0\.", ".conv_first."),
            (r"\.main\.2\.(\d+)\.", lambda m: f".block_{m.group(1)}."),
        ]
    elif arch_name in ("HiFaceGAN", "SPADEGenerator",
                       "HiFaceGANDiscriminator"):
        # spectral-norm triples fold to W/σ; HiFaceGAN keeps the (unused)
        # inherited fc and all 4 to_rgbs heads in its checkpoints — drop
        # whatever the flax tree (built at a fixed phase) doesn't hold.
        from .hifacegan_import import fold_spectral_norm
        state_dict = fold_spectral_norm(state_dict)
        drop = []
        if "fc" not in params:
            drop.append((r"^fc\.", None))
        for i in range(4):
            if f"to_rgbs_{i}" not in params:
                drop.append((rf"^to_rgbs\.{i}\.", None))
        rules = drop
    # BN archs: route running statistics into the batch_stats collection
    # (flax leaf names mean/var), everything else into params.
    bs = variables.get("batch_stats")
    stats_keys = tuple(k for k in state_dict
                       if k.endswith(("running_mean", "running_var")))
    out = dict(variables)
    if bs is not None and stats_keys:
        out["batch_stats"] = convert_state_dict(
            {k: state_dict[k] for k in stats_keys}, bs, rules)
    if stats_keys or any(k.endswith("num_batches_tracked")
                         for k in state_dict):
        state_dict = {k: v for k, v in state_dict.items()
                      if not k.endswith(("running_mean", "running_var",
                                         "num_batches_tracked"))}
    out["params"] = convert_state_dict(state_dict, params, rules, fixes)
    return out
