#!/usr/bin/env python
"""Sub-stage profile of the on-device FFHQ degradation (r5).

The r5 roofline showed the degradation stage costs ~17 ms/step at bs=8
AND bs=16 — batch-independent, i.e. a serial/latency-bound chain of
small ops, 80× off its 0.22 ms HBM roofline (train_roofline.json).
This script times each sub-stage of `make_ffhq_degradation` as its own
on-chip scan to find where the serial time lives, and a couple of
counterfactuals (fewer nonlinear slots, no jpeg) to price the knobs.

Writes docs/assets/degrade_profile.json (chip only).
Usage: python scripts/profile_degrade.py [--bs 8] [--tiny]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

ASSETS = os.path.join(REPO, "docs", "assets")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_scan(body, carry0, iters=16, reps=3):
    """Best ms/iter of jit(scan(body)) — same probe as profile_train."""
    @jax.jit
    def loop(carry):
        return jax.lax.scan(lambda c, i: (body(c, i), None), carry,
                            jnp.arange(iters))[0]
    out = loop(carry0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.bs, args.iters = 2, 2
    from bench import guard_backend
    # first dispatch through the tunnel has been observed at 70-330 s
    guard_backend(probe_timeout_s=600, total_timeout_s=7200)
    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"devices: {jax.devices()}")

    import bench_train as bt
    from image_restoration_tpu.data.pipelines import (
        FFHQDegradationConfig, make_ffhq_degradation)
    from image_restoration_tpu.data import degradations as D
    from image_restoration_tpu.data.pipelines import _make_banks

    hw = 64 if args.tiny else 256
    bs = args.bs
    rng_np = np.random.default_rng(0)
    pool = jnp.asarray(bt.real_crops(hw, bs, rng_np), jnp.float32)
    key0 = jax.random.PRNGKey(0)

    base_cfg = dict(nonlinear_slots=6)
    cfgs = {
        "production": FFHQDegradationConfig(**base_cfg),
        "slots3": FFHQDegradationConfig(nonlinear_slots=3),
        "slots0_linear_only": FFHQDegradationConfig(
            nonlinear_slots=6, kernel_list=("iso", "aniso"),
            kernel_prob=(0.5, 0.5)),
        "no_jpeg": FFHQDegradationConfig(**base_cfg, jpeg_range=None),
        "no_noise": FFHQDegradationConfig(**base_cfg, noise_range=None),
    }
    if args.tiny:
        cfgs = {k: cfgs[k] for k in ("production", "no_jpeg")}

    out = {"date": time.strftime("%Y-%m-%d"), "bs": bs, "hw": hw,
           "full_chain_ms": {}, "sub_stages_ms": {}}

    # ---- full chains under each config
    for name, cfg in cfgs.items():
        degrade = make_ffhq_degradation(cfg)

        def body(c, i, degrade=degrade):
            lq, gt = degrade(jax.random.fold_in(key0, i), pool + c)
            return (jnp.mean(lq) + jnp.mean(gt)).astype(jnp.float32) * 1e-6

        ms = time_scan(body, jnp.float32(0.0), args.iters)
        out["full_chain_ms"][name] = round(ms, 2)
        log(f"  full[{name:18s}] {ms:7.2f} ms")

    # ---- sub-stages of the production chain (mirrors pipelines.py)
    cfg = cfgs["production"]
    bank = _make_banks(cfg.kernel_list)

    def draw(k):
        return D.random_mixed_kernel(
            k, cfg.kernel_list, cfg.kernel_prob,
            pad_to=cfg.blur_kernel_size,
            kernel_size_range=(cfg.min_kernel_size, cfg.blur_kernel_size),
            sigma_x_range=cfg.blur_sigma, sigma_y_range=cfg.blur_sigma,
            extra_bank=bank)

    from image_restoration_tpu.ops.filter2d import filter2d

    def s_draw(c, i):
        kernels, t = jax.vmap(draw)(
            jax.random.split(jax.random.fold_in(key0, i), bs))
        return (jnp.mean(kernels) + jnp.sum(t).astype(kernels.dtype)
                ).astype(jnp.float32) * 1e-6 + c * 0

    def s_filter(c, i):
        kernels, _ = jax.vmap(draw)(
            jax.random.split(jax.random.fold_in(key0, i), bs))
        lq = filter2d(pool + c, kernels)
        return jnp.mean(lq).astype(jnp.float32) * 1e-6

    def s_nonlinear(c, i):
        k = jax.random.fold_in(key0, i)
        kernels, t = jax.vmap(draw)(jax.random.split(k, bs))
        lq = D.apply_nonlinear_blur(pool + c, t, cfg.kernel_list, k,
                                    ksize=min(cfg.blur_kernel_size, 15),
                                    slots=cfg.nonlinear_slots)
        return jnp.mean(lq).astype(jnp.float32) * 1e-6

    def s_downup(c, i):
        k = jax.random.fold_in(key0, i)
        lq, _, _ = D.random_down_up(k, pool + c, cfg.downsample_range,
                                    "bilinear")
        return jnp.mean(lq).astype(jnp.float32) * 1e-6

    def s_jpeg(c, i):
        k = jax.random.fold_in(key0, i)
        lq = D.add_jpeg_compression(k, pool + c, cfg.jpeg_range)
        return jnp.mean(lq).astype(jnp.float32) * 1e-6

    def s_noise(c, i):
        k = jax.random.fold_in(key0, i)
        lq = D.add_gaussian_noise(k, pool + c, cfg.noise_range,
                                  gray_prob=0.0)
        return jnp.mean(lq).astype(jnp.float32) * 1e-6

    def s_color(c, i):
        k = jax.random.fold_in(key0, i)
        lq = D.color_jitter(k, jnp.clip(pool + c, 0, 1),
                            cfg.color_jitter_shift)
        lq = D.color_jitter_pt(k, lq)
        lq = D.random_grayscale(k, lq, 0.01)
        return jnp.mean(lq).astype(jnp.float32) * 1e-6

    subs = {"draw_kernels": s_draw, "draw+filter2d": s_filter,
            "draw+nonlinear_blur": s_nonlinear, "down_up": s_downup,
            "jpeg": s_jpeg, "gauss_noise": s_noise, "color_ops": s_color}
    for name, body in subs.items():
        try:
            ms = time_scan(body, jnp.float32(0.0), args.iters)
            out["sub_stages_ms"][name] = round(ms, 2)
            log(f"  sub [{name:18s}] {ms:7.2f} ms")
        except Exception as e:
            out["sub_stages_ms"][name] = repr(e)
            log(f"  sub [{name}] FAILED {e!r}")

    if on_tpu and not args.tiny:
        os.makedirs(ASSETS, exist_ok=True)
        path = os.path.join(ASSETS, "degrade_profile.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        log(f"wrote {path}")
    else:
        log("tiny/off-TPU: artifact NOT written")
    print(json.dumps({"metric": "degrade_full_ms",
                      "value": out["full_chain_ms"].get("production")}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
