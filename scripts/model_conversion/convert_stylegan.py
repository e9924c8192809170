#!/usr/bin/env python
"""Convert official StyleGAN2 generator checkpoints to orbax.

Parity role: scripts/model_conversion/convert_stylegan.py — the generic
importer carries the StyleGAN2 key rules (noise buffers, modulated conv
shapes, equalized-linear transposes); this CLI inits the generator from a
latent example (unlike the image-input convert_models.py).

Usage:
  python scripts/model_conversion/convert_stylegan.py \
      --ckpt stylegan2_ffhq.pth --param_key params_ema --out ckpt_dir \
      [--size 256] [--channel_multiplier 2]
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
    p.add_argument("--param_key", default="params_ema")
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--channel_multiplier", type=float, default=2)
    p.add_argument("--num_style_feat", type=int, default=512)
    p.add_argument("--num_mlp", type=int, default=8)
    p.add_argument("--narrow", type=float, default=1.0)
    args = p.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.convert.torch_import import (import_network,
                                                            load_pth)

    if os.environ.get("JAX_PLATFORMS"):  # axon overrides the env var
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    net = build_network(dict(type="StyleGAN2Generator",
                             out_size=args.size,
                             num_style_feat=args.num_style_feat,
                             channel_multiplier=args.channel_multiplier,
                             num_mlp=args.num_mlp, narrow=args.narrow))
    latent = [jnp.zeros((1, args.num_style_feat))]
    variables = jax.jit(
        lambda k, z: net.init(k, z, randomize_noise=False))(
        jax.random.PRNGKey(0), latent)
    sd = load_pth(args.ckpt, args.param_key)
    variables = import_network("StyleGAN2Generator", net, variables, sd)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(args.out), jax.tree.map(np.asarray, variables),
               force=True)
    ckptr.wait_until_finished()
    n = sum(a.size for a in jax.tree.leaves(variables["params"]))
    print(f"converted {args.ckpt} ({args.param_key}) → {args.out} "
          f"({n / 1e6:.2f}M params)")


if __name__ == "__main__":
    main()
