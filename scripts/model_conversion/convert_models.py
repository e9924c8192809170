#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to native orbax checkpoints.

Parity role: scripts/model_conversion/convert_models.py (official→BasicSR
key remapping) — here the remapping target is the flax parameter tree.

Usage:
  python scripts/model_conversion/convert_models.py \
      --arch GFPGANv1OCR --ckpt net_g.pth --param_key params_ema \
      --config '{"input_width":256,"input_height":256,...}' --out ckpt_dir
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import json
import os.path as osp

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--param_key", default="params")
    p.add_argument("--config", default="{}",
                   help="JSON kwargs for the arch constructor")
    p.add_argument("--out", required=True)
    p.add_argument("--input_hw", type=int, nargs=2, default=[256, 256])
    args = p.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.convert.torch_import import (import_network,
                                                            load_pth)

    # the axon plugin overrides the JAX_PLATFORMS env var; re-apply it so
    # CPU conversion works in subprocesses
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    cfg = json.loads(args.config)
    cfg["type"] = args.arch
    net = build_network(cfg)
    h, w = args.input_hw
    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, h, w, 3)))
    sd = load_pth(args.ckpt, args.param_key)
    variables = import_network(args.arch, net, variables, sd)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(args.out),
               jax.tree.map(np.asarray, variables), force=True)
    ckptr.wait_until_finished()
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"converted {args.ckpt} ({args.param_key}) → {args.out} "
          f"({n / 1e6:.2f}M params)")


if __name__ == "__main__":
    main()
