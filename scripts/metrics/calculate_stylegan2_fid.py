#!/usr/bin/env python
"""FID of a StyleGAN2 generator against dataset statistics — parity with
scripts/metrics/calculate_stylegan2_fid.py. Samples the flax
StyleGAN2Generator (params_ema from an orbax dir or torch .pth), extracts
inception features, and reports the Fréchet distance."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..", "..")))


import argparse
import math

import numpy as np

from image_restoration_tpu.metrics.fid import (calculate_fid,
                                               extract_inception_features,
                                               load_patched_inception_v3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="orbax checkpoint dir or torch .pth")
    p.add_argument("fid_stats", help=".npz (or torch .pth) dataset stats")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_sample", type=int, default=50000)
    p.add_argument("--truncation", type=float, default=1)
    p.add_argument("--truncation_mean", type=int, default=4096)
    p.add_argument("--inception_weights", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from image_restoration_tpu.archs import build_network

    net = build_network(dict(type="StyleGAN2OCRGenerator",
                             input_width=args.size, input_height=args.size,
                             num_style_feat=512, num_mlp=8,
                             channel_multiplier=args.channel_multiplier))
    z = jnp.zeros((1, 512), jnp.float32)
    variables = jax.jit(lambda k, x: net.init(k, [x]))(
        jax.random.PRNGKey(0), z)
    params = variables["params"]
    if args.ckpt.endswith((".pth", ".pt")):
        from image_restoration_tpu.convert.torch_import import (
            load_pth, convert_state_dict)
        params = convert_state_dict(load_pth(args.ckpt, "params_ema"),
                                    params)
    else:
        import orbax.checkpoint as ocp
        params = ocp.StandardCheckpointer().restore(args.ckpt, params)

    trunc_latent = None
    if args.truncation < 1:
        keys = jax.random.normal(jax.random.PRNGKey(1),
                                 (args.truncation_mean, 512))
        latent = jax.jit(lambda p, x: net.apply(
            {"params": p}, [x], return_latents=True,
            randomize_noise=False)[1])(params, keys)
        trunc_latent = latent[:, 0, :].mean(0)

    @jax.jit
    def sample(p, z):
        img, _ = net.apply({"params": p}, [z],
                           truncation=args.truncation,
                           truncation_latent=trunc_latent,
                           randomize_noise=False)
        # [-1,1] → [0,1], resize to 299 for inception
        from image_restoration_tpu.ops.resize import resize
        img = jnp.clip((img + 1) / 2, 0, 1)
        return resize(img, (299, 299), "bilinear")

    total_batch = math.ceil(args.num_sample / args.batch_size)

    def gen():
        for i in range(total_batch):
            z = jax.random.normal(jax.random.PRNGKey(100 + i),
                                  (args.batch_size, 512))
            yield sample(params, z)

    extract = load_patched_inception_v3(args.inception_weights)
    features = extract_inception_features(gen(), extract, total_batch)
    features = features[:args.num_sample]
    sample_mean = np.mean(features, 0)
    sample_cov = np.cov(features, rowvar=False)

    if args.fid_stats.endswith(".npz"):
        stats = np.load(args.fid_stats)
        real_mean, real_cov = stats["mean"], stats["cov"]
    else:
        from image_restoration_tpu.convert.torch_import import load_pth
        stats = load_pth(args.fid_stats, param_key=None)
        real_mean = np.asarray(stats["mean"])
        real_cov = np.asarray(stats["cov"])

    fid = calculate_fid(sample_mean, sample_cov, real_mean, real_cov)
    print(f"fid: {fid:.4f}")


if __name__ == "__main__":
    main()
