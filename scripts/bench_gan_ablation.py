#!/usr/bin/env python
"""GAN-vs-L1 ablation on the real chip: show the adversarial stack works.

Round-3 verdict: GFPGAN convergence evidence was PSNR-only — a pure-L1
run could score similarly, so nothing yet PROVED the adversarial +
perceptual stack does its job. This trains two arms from the SAME
G/D init (manual_seed=0) on the SAME data stream (same rng seed → same
on-device FFHQ degradations, same gt pool rotation), same iteration
budget:

  arm "gan" — the production step: pixel + pyramid + perceptual(+style)
              + wgan_softplus adversarial, D updates + amortized R1
              (ref basicsr/models/gfpgan_model.py:494-796, weights from
              training_config/train_gfpgan_v4_square_license_basic.yml).
  arm "l1"  — identical graph with gan loss_weight=0 and no perceptual:
              the G gradient carries only the pixel/pyramid L1 terms.

Then compares on a held-out real-image val batch (fixed degradation,
jit-argument discipline — docs/TRAINING.md):
  * PSNR / SSIM vs GT (fidelity — L1 should win or tie here),
  * NIQE (no-reference perceptual quality, calibrated pristine params
    bundled at metrics/assets; ref basicsr/metrics/niqe.py:142-189) on a
    montage of the val outputs — lower is better; GAN should win,
  * gradient-magnitude similarity vs GT (GMS, c=170 on [0,255] — the
    sharpness/structure proxy; a blurred-but-accurate L1 output scores
    lower than a sharp GAN output),
  * saved triptych PNGs (lq | output | gt) for human inspection.

Artifacts (chip-measured only): docs/assets/gan_ablation.json +
docs/assets/gan_ablation_{gan,l1}.png. --tiny is the forced-CPU
structural sanity mode (no artifact writes).
"""

from __future__ import annotations

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

from bench import guard_backend, log
from bench_train import build_gfpgan_trainer, gfpgan_scan_loop, real_crops

ASSETS = os.path.join(REPO, "docs", "assets")


# -------------------------------------------------------------- metrics

def to_u8_rgb(img_m11: np.ndarray) -> np.ndarray:
    """[-1,1] float RGB → [0,255] uint8 RGB."""
    return np.clip((np.asarray(img_m11, np.float32) + 1.0) * 127.5,
                   0, 255).astype(np.uint8)


def gradient_similarity(out_u8: np.ndarray, gt_u8: np.ndarray) -> float:
    """Mean gradient-magnitude similarity (GMS, c=170) over a batch.

    GMS(x,y) = (2·m_x·m_y + c) / (m_x² + m_y² + c) with Sobel gradient
    magnitudes on the Y channel — 1.0 = identical edge structure. An
    L1-blurred output loses gradient mass and scores below a sharp one
    even at equal PSNR."""
    import cv2
    c = 170.0
    scores = []
    for o, g in zip(out_u8, gt_u8):
        oy = cv2.cvtColor(o, cv2.COLOR_RGB2GRAY).astype(np.float64)
        gy = cv2.cvtColor(g, cv2.COLOR_RGB2GRAY).astype(np.float64)
        mo = np.hypot(cv2.Sobel(oy, cv2.CV_64F, 1, 0, ksize=3),
                      cv2.Sobel(oy, cv2.CV_64F, 0, 1, ksize=3))
        mg = np.hypot(cv2.Sobel(gy, cv2.CV_64F, 1, 0, ksize=3),
                      cv2.Sobel(gy, cv2.CV_64F, 0, 1, ksize=3))
        scores.append(float(np.mean((2 * mo * mg + c) /
                                    (mo ** 2 + mg ** 2 + c))))
    return float(np.mean(scores))


def montage_niqe(batch_u8_rgb: np.ndarray) -> float:
    """NIQE over one montage of the whole val batch (more 96² blocks →
    a stabler covariance than per-256²-image scoring)."""
    from image_restoration_tpu.metrics import calculate_niqe
    n, h, w, _ = batch_u8_rgb.shape
    # exact divisor grid (no black filler cells — they would skew NIQE)
    cols = max(c for c in range(1, n + 1) if n % c == 0
               and c <= np.sqrt(n) * 2)
    rows = n // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(batch_u8_rgb):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    bgr = grid[..., ::-1].astype(np.float32)
    return float(calculate_niqe(bgr, crop_border=0, convert_to="y"))


def save_triptych(path, lq_u8, out_u8, gt_u8, max_rows=4):
    """Rows of (lq | output | gt) for human inspection."""
    import cv2
    rows = [np.concatenate([lq_u8[i], out_u8[i], gt_u8[i]], axis=1)
            for i in range(min(max_rows, len(out_u8)))]
    cv2.imwrite(path, np.concatenate(rows, axis=0)[..., ::-1])


# ------------------------------------------------------------------ main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--budget-s", type=float, default=1200.0,
                    help="per-arm wall budget (adaptive iteration count)")
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=256)
    args = ap.parse_args()

    tiny = args.tiny
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        args.iters, args.chunk, args.bs, args.hw = 2, 2, 2, 32
        args.budget_s = 1e9
    guard_backend()
    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform == "tpu"
    bs, hw = args.bs, args.hw

    rng_np = np.random.default_rng(0)
    pool = jnp.asarray(real_crops(hw, 8 if tiny else 64, rng_np),
                       jnp.float32)
    val_imgs = jnp.asarray(real_crops(hw, 2 if tiny else 8,
                                      np.random.default_rng(7)),
                           jnp.float32)
    val_key = jax.random.PRNGKey(123)

    out = {"date": time.strftime("%Y-%m-%d"), "bs": bs, "hw": hw,
           "setup": "same G/D init (manual_seed=0) + same data stream "
                    "(rng seed 5) + same iteration budget; arm 'gan' = "
                    "production pixel+pyramid+perceptual+wgan_softplus "
                    "(+D, R1/16); arm 'l1' = identical graph with "
                    "gan_weight=0, no perceptual",
           "val": "held-out real test_images crops, one fixed FFHQ "
                  "degradation (jit args only)"}

    arms_cfg = {"gan": dict(perceptual=True, gan_weight=0.1),
                "l1": dict(perceptual=False, gan_weight=0.0)}
    evals = {}
    for arm, cfg in arms_cfg.items():
        log(f"arm '{arm}': ≤{args.iters} iters, "
            f"≤{args.budget_s:.0f}s wall")
        model = build_gfpgan_trainer(bs, dtype=None, img_hw=hw,
                                     tiny_net=tiny, **cfg)
        net = model.net_g
        degrade = model.degrade_fn

        @jax.jit
        def val_out(params, imgs, key):
            lq, gt = degrade(key, imgs)
            o = net.apply({"params": params}, lq, randomize_noise=False)
            o = o[0] if isinstance(o, tuple) else o
            return (jnp.clip(o.astype(jnp.float32), -1, 1),
                    lq.astype(jnp.float32), gt.astype(jnp.float32))

        def val_psnr(params):
            o, _, gt = val_out(params, val_imgs, val_key)
            mse = float(jnp.mean((o - gt) ** 2))
            return 10 * np.log10(4.0 / max(mse, 1e-20))

        run = gfpgan_scan_loop(model, args.chunk)
        state = model.state
        rng = jax.random.PRNGKey(5)  # SAME stream both arms
        curve = {"iters": [], "l_pix": [], "l_d": [], "val_psnr_ema": [],
                 "val_psnr_live": []}
        out[f"{arm}_curve"] = curve
        done, t0, chunk_cost = 0, time.perf_counter(), None
        while done < args.iters:
            if chunk_cost is not None and (time.perf_counter() - t0 +
                                           chunk_cost > args.budget_s):
                log(f"  {arm}: wall budget hit at iter {done}")
                break
            tc = time.perf_counter()
            rng, sub = jax.random.split(rng)
            state, l_pix, l_d = run(state, pool, sub, bs)
            l_pix = np.asarray(l_pix)
            assert np.all(np.isfinite(l_pix)), f"{arm} non-finite @{done}"
            done += args.chunk
            dt = time.perf_counter() - tc
            chunk_cost = dt if chunk_cost is None else min(chunk_cost, dt)
            p_ema, p_live = val_psnr(state["ema_g"]), \
                val_psnr(state["params_g"])
            curve["iters"].append(done)
            curve["l_pix"].append(round(float(l_pix.mean()), 5))
            curve["l_d"].append(round(float(np.asarray(l_d).mean()), 5))
            curve["val_psnr_ema"].append(round(p_ema, 3))
            curve["val_psnr_live"].append(round(p_live, 3))
            log(f"  {arm} iter {done:5d}: l_pix {l_pix.mean():.4f} "
                f"val {p_ema:.2f} dB (ema) / {p_live:.2f} (live) "
                f"[{dt:.1f}s/chunk]")

        # final eval on the better head
        heads = {}
        for head in ("ema_g", "params_g"):
            o, lq, gt = (np.asarray(a) for a in
                         val_out(state[head], val_imgs, val_key))
            heads[head] = (o, lq, gt)
        psnr_of = {h: 10 * np.log10(4.0 / max(float(np.mean(
            (heads[h][0] - heads[h][2]) ** 2)), 1e-20)) for h in heads}
        head = max(psnr_of, key=psnr_of.get)
        o, lq, gt = heads[head]
        o_u8, lq_u8, gt_u8 = to_u8_rgb(o), to_u8_rgb(lq), to_u8_rgb(gt)

        from image_restoration_tpu.metrics import calculate_ssim
        ssim = float(np.mean([calculate_ssim(
            o_u8[i].astype(np.float32), gt_u8[i].astype(np.float32),
            crop_border=0) for i in range(len(o_u8))]))
        ev = {"iters": done, "head": head.replace("_g", ""),
              "psnr": round(psnr_of[head], 3), "ssim": round(ssim, 4),
              "gms_vs_gt": round(gradient_similarity(o_u8, gt_u8), 4)}
        try:
            ev["niqe"] = round(montage_niqe(o_u8), 3)
        except Exception as e:  # tiny 64² has no full 96² block
            log(f"  {arm} NIQE skipped: {e!r}")
        evals[arm] = (ev, o_u8, lq_u8, gt_u8)
        out[f"arm_{arm}"] = ev
        log(f"  {arm}: {ev}")
        del model, state

    gan_ev, l1_ev = out["arm_gan"], out["arm_l1"]
    out["gan_minus_l1_psnr_db"] = round(gan_ev["psnr"] - l1_ev["psnr"], 3)
    out["gan_minus_l1_gms"] = round(
        gan_ev["gms_vs_gt"] - l1_ev["gms_vs_gt"], 4)
    if "niqe" in gan_ev and "niqe" in l1_ev:
        # NIQE: lower = better perceptual quality → positive means GAN wins
        out["l1_minus_gan_niqe"] = round(l1_ev["niqe"] - gan_ev["niqe"], 3)
    try:
        _, _, _, gt_u8 = evals["gan"]
        out["niqe_gt_anchor"] = round(montage_niqe(gt_u8), 3)
    except Exception:
        pass

    if tiny or not on_tpu:
        log("tiny/off-TPU sanity only — NOT writing gan_ablation.json")
        print(json.dumps({"ok": True, "tiny": True}), flush=True)
        return

    os.makedirs(ASSETS, exist_ok=True)
    for arm, (_, o_u8, lq_u8, gt_u8) in evals.items():
        save_triptych(os.path.join(ASSETS, f"gan_ablation_{arm}.png"),
                      lq_u8, o_u8, gt_u8)
    with open(os.path.join(ASSETS, "gan_ablation.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("wrote docs/assets/gan_ablation.json + triptychs")
    print(json.dumps({
        "metric": "gan_vs_l1",
        "gan_minus_l1_psnr_db": out["gan_minus_l1_psnr_db"],
        "gan_minus_l1_gms": out["gan_minus_l1_gms"],
        "l1_minus_gan_niqe": out.get("l1_minus_gan_niqe"),
        "niqe_gt_anchor": out.get("niqe_gt_anchor")}), flush=True)


if __name__ == "__main__":
    main()
