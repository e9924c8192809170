#!/usr/bin/env python
"""Convert official DFDNet checkpoints (+ facial dictionary) to orbax.

Parity role: scripts/model_conversion/convert_dfdnet.py. The official net
wraps every conv in spectral_norm; convert/dfdnet_import.py folds the
(weight_orig, u, v) triples to W/σ and maps the key layout onto the flax
tree; the part dictionary converts to NHWC feature banks.

Usage:
  python scripts/model_conversion/convert_dfdnet.py \
      --ckpt DFDNet_official.pth --dict DFDNet_dict_512.pth --out ckpt/
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..",
                                           "..")))

import argparse
import os.path as osp

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dict", required=True,
                   help="facial dictionary .pth (DFDNet_dict_512)")
    p.add_argument("--num_feat", type=int, default=64)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch
    import orbax.checkpoint as ocp
    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.convert.dfdnet_import import (
        convert_dfdnet_dict, load_torch_dfdnet)
    from image_restoration_tpu.convert.torch_import import load_pth

    tdict = torch.load(args.dict, map_location="cpu")
    dicts = jax.tree_util.tree_map(jnp.asarray, convert_dfdnet_dict(tdict))
    net = build_network(dict(type="DFDNet", num_feat=args.num_feat))
    boxes = [np.asarray([128, 128, 160, 160], np.float32)] * 4
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 512, 512, 3)), boxes, dicts)
    params = load_torch_dfdnet(load_pth(args.ckpt, param_key="params"),
                               variables["params"])

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(args.out),
               jax.tree.map(np.asarray,
                            {"params": params, "dictionary": dicts}),
               force=True)
    ckptr.wait_until_finished()
    n = sum(a.size for a in jax.tree.leaves(params))
    print(f"converted {args.ckpt} + {args.dict} → {args.out} "
          f"({n / 1e6:.2f}M params)")


if __name__ == "__main__":
    main()
