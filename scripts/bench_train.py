#!/usr/bin/env python
"""On-chip TRAINING benchmark + convergence smoke (BASELINE configs #4-5).

Round-2 verdict: the two training configs in BASELINE.json were the only
scored surface with zero hardware numbers. This measures them on the real
chip:

  * GFPGAN production GAN step (config #5 — "Full GAN fine-tune: L1 + VGG
    perceptual + discriminator"): 256² production generator
    (num_style_feat 256, channel_multiplier 0.5, sft_half) +
    StyleGAN2Discriminator, on-device FFHQ degradation synthesis (full
    production kernel list incl. the measured pyblur PSF bank), G
    forward+backward with pyramid + perceptual + wgan_softplus losses, G
    Adam update + EMA(0.5^(32/10⁴)), D logistic update; R1 every 16 iters
    amortized INSIDE the timed loop via lax.cond — exactly what
    training_config/train_gfpgan_v4_square_license_basic.yml:138-217 runs
    per iteration (ref basicsr/models/gfpgan_model.py:494-796).
  * SRModel L1 step (config #4 — "L1-pretrain fine-tune with on-device
    second-order degradation synthesis"): SRVGGNetCompact x4 under the
    two-stage Real-ESRGAN chain (ref realsr_degradation_dataset.py:151-291).

Timing: ON-CHIP lax.scan of ITERS full train steps inside one jit, fresh
RNG per iter (the degradation resamples kernels/noise/JPEG quality every
step), min over repeats — the axon tunnel's 40ms-1.3s dispatch latency
never enters. Achieved FLOP/s comes from XLA's compiled cost analysis
(flops of the whole step graph incl. backward / measured step time) when
the backend reports it.

The VGG19 perceptual backbone runs at random init (torchvision weights are
unobtainable in this zero-egress environment) — computationally identical
to the calibrated net.

`--convergence` runs a few-hundred-iter smoke on REAL reference
test_images content (256² crops as GT): loss descends and held-out val
PSNR (EMA net, fixed degraded val batch) rises. Artifacts:
docs/assets/train_convergence.json + docs/TRAINING.md.

Results land in docs/assets/train_bench.json; bench.py (default mode)
echoes the summary into its diagnostics so BENCH_r{N}.json carries them.
"""

import argparse
import glob
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

try:  # persistent compile cache (see bench.py)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")
# 16 iters per timed scan = exactly one R1 step per window (every
# timed window starts from the same state with iter=0, where R1 fires),
# so the measured amortization matches the production 1/net_d_reg_every
ITERS = 16
REPEATS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------------------------------- builders

def build_gfpgan_trainer(batch, dtype=None, perceptual=True, remat=False,
                         img_hw=256, gan_weight=0.1, tiny_net=False,
                         total_iter=200000, milestones=(100000, 150000),
                         remove_pyramid_loss=50000, grad_clip=None):
    """Production GFPGANModel + on-device FFHQ degradation, ready to step.

    Mirrors configs/train_gfpgan_plate_256.yml (the TPU port of the
    reference production yml) at the real 256² scale.

    gan_weight=0.0 (with perceptual=False) is the pure-pixel ablation
    arm: the step graph is unchanged — D still trains — but the G
    gradient carries only the pixel/pyramid losses, isolating what the
    adversarial+perceptual stack contributes
    (ref basicsr/models/gfpgan_model.py:494-796).

    tiny_net=True swaps in the small CPU-sanity net shapes (same code
    path as __graft_entry__.dryrun_multichip) — the production 256-feat
    GAN scan step takes >15 min to compile on CPU."""
    from image_restoration_tpu.models import build_model
    from image_restoration_tpu.data.pipelines import (
        FFHQDegradationConfig, make_ffhq_degradation)

    clip = {"grad_clip": float(grad_clip)} if grad_clip else {}
    train = {
        "optim_g": {"type": "Adam", "lr": 2e-3, **clip},
        "optim_d": {"type": "Adam", "lr": 2e-3, **clip},
        "scheduler": {"type": "MultiStepLR", "milestones": list(milestones),
                      "gamma": 0.5},
        "total_iter": total_iter,
        "pixel_opt": {"type": "L1Loss", "loss_weight": 0.1},
        "L1_opt": {"type": "L1Loss", "loss_weight": 1.0},
        "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                    "loss_weight": gan_weight},
        "pyramid_loss_weight": 1.0,
        "remove_pyramid_loss": remove_pyramid_loss,
        "r1_reg_weight": 10,
        "net_d_iters": 1, "net_d_init_iters": 0, "net_d_reg_every": 16,
        "remat": remat,
    }
    if perceptual:
        train["perceptual_opt"] = {
            "type": "PerceptualLoss",
            "layer_weights": {"conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1,
                              "conv4_4": 1, "conv5_4": 1},
            "vgg_type": "vgg19", "use_input_norm": True,
            "perceptual_weight": 1.0, "style_weight": 50,
            "range_norm": True, "criterion": "l1"}
        if dtype is not None:  # bf16 trainer -> bf16 VGG taps (f32 loss)
            train["perceptual_opt"]["compute_dtype"] = "bf16"
    opt = {
        "is_train": True, "manual_seed": 0, "num_devices": 1, "scale": 1,
        "path": {"models": "/tmp/bench_train/models",
                 "visualization": "/tmp/bench_train/vis"},
        "logger": {"print_freq": 100},
        "model_type": "GFPGANModel",
        "network_g": dict(type="GFPGANv1OCR", input_width=img_hw,
                          input_height=img_hw,
                          num_style_feat=16 if tiny_net else 256,
                          channel_multiplier=0.25 if tiny_net else 0.5,
                          num_mlp=2 if tiny_net else 4,
                          input_is_latent=True, different_w=True,
                          narrow=0.5 if tiny_net else 1,
                          sft_half=True, fix_decoder=False, dtype=dtype),
        "network_d": dict(type="StyleGAN2Discriminator", input_width=img_hw,
                          input_height=img_hw,
                          channel_multiplier=0.25 if tiny_net else 1,
                          **({"narrow": 0.25} if tiny_net else {}),
                          dtype=dtype),
        "train": train,
    }
    model = build_model(opt)
    # production defaults (full kernel list); on TPU cap the median/
    # bilateral filters to 6 slots (P(overflow) ~0.1%/step at bs<=16 —
    # see FFHQDegradationConfig.nonlinear_slots)
    cfg = FFHQDegradationConfig(
        nonlinear_slots=6 if dtype is not None else None,
        **(dict(kernel_list=("iso", "aniso"), kernel_prob=(0.5, 0.5),
                downsample_range=(2.0, 4.0)) if tiny_net else {}))
    model.set_degradation_pipeline(make_ffhq_degradation(cfg))
    return model


def build_sr_trainer(batch, dtype=None, scale=4, gt_hw=256, num_feat=64,
                     num_conv=32, quant=False, lr=2e-4, weight_bits=8):
    """SRVGG x4 L1 trainer + second-order Real-ESRGAN degradation.

    quant=True adds train.quant_opt (QAT: the step trains the fake-quant
    twin of the int8 serving graph, ops/qat.py); weight_bits < 8 trains
    the sub-8-bit weight regime (w4a8 etc.)."""
    from image_restoration_tpu.models import build_model
    from image_restoration_tpu.data.pipelines import (
        RealESRGANDegradationConfig, make_realesrgan_degradation)

    opt = {
        "is_train": True, "manual_seed": 0, "num_devices": 1,
        "scale": scale, "gt_size": gt_hw,
        "path": {"models": "/tmp/bench_train/models",
                 "visualization": "/tmp/bench_train/vis"},
        "logger": {"print_freq": 100},
        "model_type": "SRModel",
        "network_g": dict(type="SRVGGNetCompact", num_feat=num_feat,
                          num_conv=num_conv, upscale=scale, dtype=dtype),
        "train": {
            "optim_g": {"type": "Adam", "lr": lr},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                          "gamma": 0.5},
            "total_iter": 400000,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "ema_decay": 0.999,
            **({"quant_opt": {"weight_bits": weight_bits}}
               if quant else {}),
        },
    }
    model = build_model(opt)
    cfg = RealESRGANDegradationConfig(scale=scale)
    model.set_degradation_pipeline(make_realesrgan_degradation(cfg))
    return model


# ----------------------------------------------------------- scan drivers

def gfpgan_scan_loop(model, iters=ITERS):
    """jit(scan) of `iters` FULL GAN train steps with amortized R1."""
    gd = model._build_gd_step()
    r1 = model._build_r1_step()
    pyr_w = jnp.float32(model.pyramid_loss_weight)
    reg_every = model.net_d_reg_every

    @partial(jax.jit, static_argnames=("bs",))
    def loop(state, pool, rng, bs):
        def body(carry, i):
            state = carry
            step_rng = jax.random.fold_in(rng, i)
            # rotate through the gt pool so every iter sees fresh images
            n_pool = pool.shape[0]
            start = (i * bs) % n_pool
            gt = jax.lax.dynamic_slice_in_dim(pool, start, bs, axis=0)
            # the GLOBAL iteration counter (state['iter'], carried across
            # scan chunks) drives the R1 cadence, matching the production
            # every-`net_d_reg_every`-iters schedule exactly — a scan-
            # local `i % reg_every` would fire once per chunk instead
            it = state["iter"]
            state, losses, gt_n = gd(state, {"gt": gt}, step_rng, pyr_w,
                                     update_g=True)
            state, l_r1 = jax.lax.cond(
                it % reg_every == 0,
                lambda s: r1(s, gt_n),
                lambda s: (s, jnp.float32(0.0)), state)
            out = (losses["l_g_pix"].astype(jnp.float32),
                   losses["l_d"].astype(jnp.float32))
            return state, out

        state, (l_pix, l_d) = jax.lax.scan(body, state, jnp.arange(iters))
        return state, l_pix, l_d

    def run(state, pool, rng, bs):
        return loop(state, pool, rng, bs=bs)

    run.jit_loop = loop
    return run


def sr_scan_loop(model, iters=ITERS):
    step = model._build_train_step()

    @partial(jax.jit, static_argnames=("bs",))
    def loop(state, pool, rng, bs):
        def body(carry, i):
            state = carry
            step_rng = jax.random.fold_in(rng, i)
            n_pool = pool.shape[0]
            start = (i * bs) % n_pool
            gt = jax.lax.dynamic_slice_in_dim(pool, start, bs, axis=0)
            state, losses = step(state, {"gt": gt}, step_rng)
            return state, losses["l_pix"].astype(jnp.float32)

        state, l_pix = jax.lax.scan(body, state, jnp.arange(iters))
        return state, l_pix

    def run(state, pool, rng, bs):
        return loop(state, pool, rng, bs=bs)

    run.jit_loop = loop
    return run


def time_loop(run, state, pool, rng, bs, iters=ITERS, repeats=REPEATS):
    """Seconds per train step, on-chip (compile excluded)."""
    out = run(state, pool, rng, bs)
    jax.block_until_ready(out[1])
    l_last = np.asarray(out[1])
    assert np.all(np.isfinite(l_last)), f"non-finite losses: {l_last}"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(state, pool, rng, bs)
        _ = float(np.asarray(out[1])[-1])  # fetch forces completion
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, l_last


# ------------------------------------------------------------- real data

def real_crops(size, n, rng, paths=None):
    """256² GT crops from the reference test photos (real content)."""
    import cv2
    paths = paths or sorted(
        glob.glob("/root/reference/Car_Plate-Restoration/test_images/*.jpg"))
    if not paths:
        return rng.random((n, size, size, 3)).astype(np.float32)
    crops = []
    while len(crops) < n:
        for p in paths:
            img = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
            ih, iw = img.shape[:2]
            if ih < size or iw < size:
                img = cv2.resize(img, (max(size, iw), max(size, ih)))
                ih, iw = img.shape[:2]
            y = rng.integers(0, ih - size + 1)
            x = rng.integers(0, iw - size + 1)
            crops.append(img[y:y + size, x:x + size])
            if len(crops) >= n:
                break
    return np.stack(crops)


# ------------------------------------------------------------ cost model

def compiled_step_flops(run, state, pool, rng, iters, bs):
    """FLOPs per train step from XLA's compiled cost analysis (or None)."""
    try:
        ca = run.jit_loop.lower(state, pool, rng,
                                bs=bs).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"]) / iters
    except Exception as e:
        log(f"  cost_analysis unavailable: {type(e).__name__}: {e}")
        return None


def analytic_gfpgan_flops(bs, hw=256):
    """Rough FLOP count per GAN train step (fwd 1x + bwd 2x for G, D ×2
    fwd + bwd, VGG fwd+bwd on 2 streams, pyramid/deg negligible)."""
    # measured param counts: G ≈ 41M with most FLOPs in decoder convs.
    # Use conv-sum estimate: G fwd ≈ 85 GFLOP at 256² bs1 (counted from
    # arch shapes), D fwd ≈ 18 GFLOP, VGG19 fwd ≈ 39 GFLOP @224 ≈ 51 @256.
    g_fwd, d_fwd, vgg_fwd = 85e9, 18e9, 51e9
    g = g_fwd * 3          # fwd + 2x bwd
    d_updates = d_fwd * 3 * 2 + d_fwd  # real+fake bwd, fake fwd in G loss
    vgg = vgg_fwd * (2 + 2)  # two streams fwd, bwd through output stream
    return bs * (g + d_updates + vgg)


# ------------------------------------------------------------------ main

def bench_steps(batch_sizes=(4, 8, 16), mode="both", dtype="bf16",
                iters=ITERS, pool_mult=2, remat=False):
    dt = {"bf16": jnp.bfloat16, "f32": None}[dtype]
    rng_np = np.random.default_rng(0)
    results = {"meta": {
        "device": str(jax.devices()[0]),
        "dtype": dtype, "iters_per_scan": iters,
        "date": time.strftime("%Y-%m-%d"),
        "timing": "on-chip lax.scan of full train steps, min of "
                  f"{REPEATS} runs",
    }}

    if mode in ("both", "gfpgan"):
        rows = []
        for bs in batch_sizes:
            model = build_gfpgan_trainer(bs, dtype=dt, remat=remat)
            run = gfpgan_scan_loop(model, iters)
            pool = jnp.asarray(real_crops(256, bs * pool_mult, rng_np),
                               jnp.float32)
            try:
                sec, losses = time_loop(run, model.state, pool,
                                        jax.random.PRNGKey(0), bs,
                                        iters)
            except Exception as e:
                log(f"GFPGAN bs={bs} failed: {type(e).__name__}: {e}")
                continue
            fl = compiled_step_flops(run, model.state, pool,
                                     jax.random.PRNGKey(0), iters, bs)
            src = "xla"
            if fl is None:
                fl, src = analytic_gfpgan_flops(bs), "est"
            tf = fl / sec / 1e12
            row = {"bs": bs, "ms_per_step": round(sec * 1e3, 2),
                   "steps_per_sec": round(1.0 / sec, 2),
                   "imgs_per_sec": round(bs / sec, 1),
                   "tflops": round(tf, 1), "flops_source": src}
            if remat:
                row["remat"] = True
            rows.append(row)
            log(f"GFPGAN GAN step bs={bs}{' remat' if remat else ''}: "
                f"{sec * 1e3:.1f} ms/step = "
                f"{1 / sec:.2f} steps/s ({bs / sec:.1f} imgs/s, "
                f"{tf:.0f} TFLOP/s {src})")
            del model
        results["gfpgan_gan_step"] = {
            "config": "GFPGANv1OCR 256² production + StyleGAN2 D + VGG19 "
                      "perceptual + on-device FFHQ degradation + EMA + "
                      "R1/16 amortized",
            "rows": rows}

    if mode in ("both", "sr"):
        rows = []
        for bs in batch_sizes:
            model = build_sr_trainer(bs, dtype=dt)
            run = sr_scan_loop(model, iters)
            pool = jnp.asarray(real_crops(256, bs * pool_mult, rng_np),
                               jnp.float32)
            try:
                sec, losses = time_loop(run, model.state, pool,
                                        jax.random.PRNGKey(0), bs, iters)
            except Exception as e:
                log(f"SRModel bs={bs} failed: {type(e).__name__}: {e}")
                continue
            fl = compiled_step_flops(run, model.state, pool,
                                     jax.random.PRNGKey(0), iters, bs)
            row = {"bs": bs, "ms_per_step": round(sec * 1e3, 2),
                   "steps_per_sec": round(1.0 / sec, 2),
                   "imgs_per_sec": round(bs / sec, 1)}
            extra = ""
            if fl is not None:
                row["tflops"] = round(fl / sec / 1e12, 1)
                row["flops_source"] = "xla"
                extra = f", {fl / sec / 1e12:.0f} TFLOP/s xla"
            rows.append(row)
            log(f"SRModel L1 step (SRVGG x4 + 2nd-order degradation) "
                f"bs={bs}: {sec * 1e3:.1f} ms/step = {1 / sec:.2f} steps/s "
                f"({bs / sec:.1f} imgs/s{extra})")
            del model
        results["sr_l1_step"] = {
            "config": "SRVGGNetCompact x4 (64f/32c) L1 + on-device "
                      "two-stage Real-ESRGAN degradation, gt 256²",
            "rows": rows}

    os.makedirs(ASSETS, exist_ok=True)
    out = os.path.join(ASSETS, "train_bench.json")
    if os.path.isfile(out):  # merge: keep rows for batch sizes not re-run
        old = json.load(open(out))
        old_date = old.get("meta", {}).get("date")
        for key in ("gfpgan_gan_step", "sr_l1_step"):
            if key in old and key in results:
                k = lambda r: (r["bs"], r.get("remat", False))
                seen = {k(r) for r in results[key]["rows"]}
                carried = [r for r in old[key]["rows"] if k(r) not in seen]
                for r in carried:  # keep the date they were measured at
                    r.setdefault("date", old_date)
                results[key]["rows"] += carried
                results[key]["rows"].sort(key=k)
        # any other artifact section (detector_step, ...) survives a
        # partial re-run untouched
        for key, val in old.items():
            if key not in results:
                results[key] = val
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {out}")
    return results


def _onchip_scan_ms(body, carry0, iters=ITERS, repeats=REPEATS):
    """ms per body() call, timed as one on-chip jit(scan) (see module doc:
    the axon dispatch latency must never enter). body(carry, i) -> carry;
    the returned carry must data-depend on the work or XLA deletes it."""
    @jax.jit
    def loop(carry):
        return jax.lax.scan(lambda c, i: (body(c, i), None), carry,
                            jnp.arange(iters))[0]

    out = loop(carry0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def breakdown(bs=16, dtype="bf16", iters=ITERS):
    """Where does the GFPGAN GAN-step time go? On-chip per-component scan
    timings at one batch size. Components overlap deliberately (e.g.
    g_update contains g_fwd), so read the table as a containment ladder,
    not a partition; `full - full_noperc` isolates the VGG perceptual+style
    cost the same way the reference pays it (basicsr/losses/losses.py:250-356).
    """
    import gc
    dt = {"bf16": jnp.bfloat16, "f32": None}[dtype]
    rng_np = np.random.default_rng(0)
    pool = jnp.asarray(real_crops(256, bs * 2, rng_np), jnp.float32)
    rows = {}

    model = build_gfpgan_trainer(bs, dtype=dt)
    degrade = model.degrade_fn
    net_g, net_d = model.net_g, model.net_d
    state = model.state
    tx_g, tx_d = model.tx_g, model.tx_d
    key0 = jax.random.PRNGKey(0)
    lq0, gt0 = jax.jit(degrade)(key0, pool[:bs])
    lq0 = jax.block_until_ready(lq0)

    def measure(name, fn):
        # each component isolated: an OOM/compile failure records and moves
        # on, and caches are dropped so executables don't accumulate HBM
        try:
            rows[name] = fn()
            log(f"  {name:16s} {rows[name]:8.2f} ms/step")
        except Exception as e:
            log(f"  {name} failed: {type(e).__name__}: {e}")
        gc.collect()
        jax.clear_caches()

    # 1. full production step (reference row)
    def m_full():
        run = gfpgan_scan_loop(model, iters)
        sec, _ = time_loop(run, state, pool, key0, bs, iters)
        return sec * 1e3
    measure("full", m_full)

    # 2. full production step without the perceptual term (same weights:
    # the step fn only reads param structure, which is identical)
    def m_noperc():
        m2 = build_gfpgan_trainer(bs, dtype=dt, perceptual=False)
        m2.state = None  # free its duplicate device state; we time `state`
        gc.collect()
        run_np = gfpgan_scan_loop(m2, iters)
        sec, _ = time_loop(run_np, state, pool, key0, bs, iters)
        return sec * 1e3
    measure("full_noperc", m_noperc)

    # 3. degradation synthesis alone (fresh kernels/noise/JPEG per iter)
    def m_degrade():
        def body(c, i):
            lq, _ = degrade(jax.random.fold_in(key0, i), pool[:bs] + c)
            return jnp.mean(lq) * 1e-6
        return _onchip_scan_ms(body, jnp.float32(0.0), iters)
    measure("degrade", m_degrade)

    # 4. G forward alone (production generator, noise rng per iter)
    def m_gfwd():
        def body(c, i):
            out, _ = net_g.apply({"params": state["params_g"]}, lq0 + c,
                                 return_rgb=True,
                                 rngs={"noise": jax.random.fold_in(key0, i)})
            return jnp.mean(out) * 1e-6
        return _onchip_scan_ms(body, jnp.float32(0.0), iters)
    measure("g_fwd", m_gfwd)

    # 5. G update with pixel loss only: fwd + bwd + Adam + EMA
    def m_gup():
        def body(c, i):
            pg, og, eg = c
            def loss(p):
                out, _ = net_g.apply(
                    {"params": p}, lq0, return_rgb=True,
                    rngs={"noise": jax.random.fold_in(key0, i)})
                return jnp.mean(jnp.abs(out - gt0))
            grads = jax.grad(loss)(pg)
            upd, og = tx_g.update(grads, og, pg)
            pg = optax.apply_updates(pg, upd)
            eg = model.ema_update(eg, pg, model.ema_decay)
            return (pg, og, eg)
        return _onchip_scan_ms(
            body, (state["params_g"], state["opt_g"], state["ema_g"]), iters)
    measure("g_update_pix", m_gup)

    # 6. D logistic update alone (real+fake fwd+bwd+Adam)
    def m_dup():
        fake0 = jnp.clip(gt0 + 0.01, -1, 1)
        def body(c, i):
            pd, od = c
            def loss(p):
                return (model.cri_gan(net_d.apply({"params": p}, gt0),
                                      True, is_disc=True) +
                        model.cri_gan(net_d.apply({"params": p}, fake0),
                                      False, is_disc=True))
            grads = jax.grad(loss)(pd)
            upd, od = tx_d.update(grads, od, pd)
            return (optax.apply_updates(pd, upd), od)
        return _onchip_scan_ms(
            body, (state["params_d"], state["opt_d"]), iters)
    measure("d_update", m_dup)

    # 7. perceptual+style loss alone: VGG19 two-stream fwd + bwd wrt output
    if model.cri_perceptual is not None:
        def m_perc():
            def body(c, i):
                def loss(x):
                    lp, ls = model.cri_perceptual(x, gt0)
                    t = 0.0
                    if lp is not None:
                        t += lp
                    if ls is not None:
                        t += ls
                    return t
                g = jax.grad(loss)(gt0 + c)
                return jnp.mean(g) * 1e-6
            return _onchip_scan_ms(body, jnp.float32(0.0), iters)
        measure("perceptual_grad", m_perc)

    out = {"bs": bs, "dtype": dtype,
           "rows": {k: round(v, 2) for k, v in rows.items()},
           "date": time.strftime("%Y-%m-%d"),
           "note": "containment ladder, not a partition; full-full_noperc "
                   "= VGG perceptual+style cost"}
    os.makedirs(ASSETS, exist_ok=True)
    with open(os.path.join(ASSETS, "train_breakdown.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


def bench_detector(batch_sizes=(24, 48, 96), iters=ITERS):
    """RetinaFace-ResNet18 train step at the reference's budget envelope
    (bs=24, SGD — Plate_Detect/.../data/config.py:43-60), on-chip scan."""
    from image_restoration_tpu.detect.train import DetectorTrainer
    tr = DetectorTrainer(backbone="Resnet18", image_size=224,
                         decay_steps=(), total_steps=10000)
    step = tr._train_step
    rng = np.random.default_rng(0)
    rows = []
    for bs in batch_sizes:
        imgs = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)) * 20.0,
                           jnp.float32)
        # synthetic padded targets (M=16): one valid box + landmarks/sample
        t = np.zeros((bs, 16, 15), np.float32)
        t[:, 0, :4] = [0.3, 0.3, 0.6, 0.5]
        t[:, 0, 4:14] = rng.uniform(0.3, 0.6, (bs, 10))
        t[:, 0, 14] = 1.0
        targets = jnp.asarray(t)

        @jax.jit
        def loop(state, imgs, targets):
            def body(c, i):
                s, _ = c
                s, losses = step(s, imgs +
                                 (i.astype(jnp.float32) * 1e-6), targets)
                return (s, losses["loss"].astype(jnp.float32)), None
            (s, last), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                        jnp.arange(iters))
            return s, last

        try:
            out = loop(tr.state, imgs, targets)
            jax.block_until_ready(out[1])
            assert np.isfinite(float(out[1]))
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                out = loop(tr.state, imgs, targets)
                _ = float(out[1])
                best = min(best, (time.perf_counter() - t0) / iters)
        except Exception as e:
            log(f"detector bs={bs} failed: {type(e).__name__}: {e}")
            continue
        rows.append({"bs": bs, "ms_per_step": round(best * 1e3, 2),
                     "imgs_per_sec": round(bs / best, 1)})
        log(f"Detector train step (RetinaFace-R18 224², SGD+BN) bs={bs}: "
            f"{best * 1e3:.1f} ms/step = {bs / best:.1f} imgs/s")
    out_path = os.path.join(ASSETS, "train_bench.json")
    data = json.load(open(out_path)) if os.path.isfile(out_path) else {}
    data["detector_step"] = {
        "config": "RetinaFace-Resnet18 224² MultiBoxLoss train step "
                  "(ref budget bs=24, SGD lr 1e-3)",
        "rows": rows, "date": time.strftime("%Y-%m-%d")}
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    log(f"wrote {out_path} (detector_step)")
    return rows


def convergence(model_kind="sr", total_iters=300, chunk=25, bs=8,
                val_every=None, dtype="f32", seed=0):
    """Few-hundred-iter smoke on REAL image content: loss ↓, val PSNR ↑."""
    dt = {"bf16": jnp.bfloat16, "f32": None}[dtype]
    rng_np = np.random.default_rng(seed)
    pool_np = real_crops(256, 64, rng_np)
    val_np = real_crops(256, 8, rng_np)
    pool = jnp.asarray(pool_np, jnp.float32)

    if model_kind == "gfpgan":
        model = build_gfpgan_trainer(bs, dtype=dt)
        run = gfpgan_scan_loop(model, chunk)
        min_max = (-1.0, 1.0)
    else:
        model = build_sr_trainer(bs, dtype=dt)
        run = sr_scan_loop(model, chunk)
        min_max = (0.0, 1.0)

    degrade = model.degrade_fn
    net = model.net_g

    is_gfpgan = model_kind == "gfpgan"

    # NOTE: val images and rng MUST be jit *arguments*, not closure
    # constants. The axon remote compiler miscompiles the fused
    # degrade+forward graph when the val batch is embedded as a constant:
    # the forward half silently produces ~18 dB-worse output (measured
    # 13.75 vs 31.69 dB on identical params/lq), while the same graph
    # compiled with the batch as an argument is correct.
    @jax.jit
    def val_psnr(params, imgs, key):
        lq, gt = degrade(key, imgs)
        if is_gfpgan:
            out = net.apply({"params": params}, lq, randomize_noise=False)
        else:
            out = net.apply({"params": params}, lq)
        if isinstance(out, tuple):
            out = out[0]
        out = jnp.clip(out.astype(jnp.float32), *min_max)
        span = min_max[1] - min_max[0]
        mse = jnp.mean((out - gt.astype(jnp.float32)) ** 2)
        return 10 * jnp.log10(span ** 2 / mse)

    val_imgs = jnp.asarray(val_np)
    val_key = jax.random.PRNGKey(123)

    curve = {"iters": [], "loss": [], "val_psnr": [], "val_psnr_live": []}
    state = model.state
    p0 = float(val_psnr(state["ema_g"], val_imgs, val_key))
    curve["iters"].append(0)
    curve["loss"].append(None)
    curve["val_psnr"].append(round(p0, 3))
    curve["val_psnr_live"].append(round(p0, 3))
    log(f"{model_kind} convergence: iter 0 val PSNR {p0:.2f} dB")
    rng = jax.random.PRNGKey(seed + 1)
    done = 0
    t0 = time.perf_counter()
    while done < total_iters:
        rng, sub = jax.random.split(rng)
        out = run(state, pool, sub, bs)
        state = out[0]
        losses = np.asarray(out[1])
        assert np.all(np.isfinite(losses)), f"non-finite at {done}"
        done += chunk
        p = float(val_psnr(state["ema_g"], val_imgs, val_key))
        p_live = float(val_psnr(state["params_g"], val_imgs, val_key))
        curve["iters"].append(done)
        curve["loss"].append(round(float(losses.mean()), 5))
        curve["val_psnr"].append(round(p, 3))
        curve["val_psnr_live"].append(round(p_live, 3))
        log(f"  iter {done:4d}: loss {losses.mean():.4f} "
            f"val PSNR {p:.2f} dB (ema) / {p_live:.2f} dB (live)")
    wall = time.perf_counter() - t0
    result = {
        "model": model_kind, "bs": bs, "dtype": dtype,
        "total_iters": total_iters,
        "wall_seconds": round(wall, 1),
        "data": "256² crops of the reference test_images (real content)",
        "curve": curve,
        "date": time.strftime("%Y-%m-%d"),
    }
    os.makedirs(ASSETS, exist_ok=True)
    out_path = os.path.join(ASSETS,
                            f"train_convergence_{model_kind}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {out_path}")
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["both", "gfpgan", "sr"])
    ap.add_argument("--batch-sizes", default="4,8,16")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--convergence", action="store_true")
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--breakdown-bs", type=int, default=16)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--detector", action="store_true")
    ap.add_argument("--conv-model", default="sr",
                    choices=["sr", "gfpgan"])
    ap.add_argument("--conv-iters", type=int, default=300)
    ap.add_argument("--conv-bs", type=int, default=8)
    ap.add_argument("--conv-dtype", default="f32",
                    choices=["bf16", "f32"])
    args = ap.parse_args()
    if args.detector:
        bench_detector(tuple(int(b) for b in args.batch_sizes.split(","))
                       if args.batch_sizes != "4,8,16" else (24, 48, 96),
                       args.iters)
    elif args.breakdown:
        breakdown(args.breakdown_bs, args.dtype, args.iters)
    elif args.convergence:
        convergence(args.conv_model, args.conv_iters, bs=args.conv_bs,
                    dtype=args.conv_dtype)
    else:
        bench_steps(tuple(int(b) for b in args.batch_sizes.split(",")),
                    args.mode, args.dtype, args.iters, remat=args.remat)
