#!/usr/bin/env python
"""Long-horizon GFPGAN production-stack stability run (VERDICT r4 next #5).

The reference's production recipe is 200k iters of the full GAN stack
(training_config/train_gfpgan_v4_square_license_basic.yml:4,138-153:
Adam lr 2e-3 G+D, MultiStepLR x0.5 @ [100k,150k], remove_pyramid_loss
50k, R1 every 16, EMA 0.5^(32/1e4)). Prior rounds demonstrated
convergence to 5.5k iters; this run scales the ENTIRE recipe by
1/`--recipe-scale` (default 10: 20k iters, milestones [10k,15k],
pyramid-loss removal crossing at 5k) and drives it end to end on chip
with every production loss active (L1 + pyramid + VGG perceptual/style +
wgan_softplus + R1/16 + EMA), grad-clipped (the r4 RRDB collapse lesson,
scripts/bench_distill_e2e.py:81-84).

Evidence produced:
  * docs/assets/gfpgan_longrun.json — loss + val PSNR (EMA/live) + NIQE
    curves across the pyramid-removal and lr-milestone crossings.
  * a mid-run snapshot at --snapshot-iter (default 5500, the old
    checkpoint horizon) and the final state both restore the real
    `test_images/`; per-image PSNR/NIQE deltas + a side-by-side strip
    (docs/assets/gfpgan_longrun_compare.png) answer "is 20k visibly
    better than 5.5k".
  * a served u8 engine exported from the final EMA params
    (experiments/gfpgan_longrun/engine/), round-trip gated like
    scripts/export_gfpgan.py.

Chunked jit(scan) with orbax persistence per chunk: a tunnel death loses
at most one chunk; re-running resumes from the newest checkpoint.
--tiny is the forced-CPU structural sanity mode (no artifact writes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax
import jax.numpy as jnp

from bench import guard_backend, log
import bench_train as bt

ASSETS = os.path.join(REPO, "docs", "assets")
EXP = os.path.join(REPO, "experiments", "gfpgan_longrun")


def scan_loop_pyr(model, iters):
    """gfpgan_scan_loop with pyr_w as a TRACED argument (the production
    remove_pyramid_loss crossing happens mid-run at a chunk boundary)."""
    gd = model._build_gd_step()
    r1 = model._build_r1_step()
    reg_every = model.net_d_reg_every

    @partial(jax.jit, static_argnames=("bs",))
    def loop(state, pool, rng, pyr_w, bs):
        def body(carry, i):
            state = carry
            step_rng = jax.random.fold_in(rng, i)
            n_pool = pool.shape[0]
            start = (i * bs) % n_pool
            gt = jax.lax.dynamic_slice_in_dim(pool, start, bs, axis=0)
            it = state["iter"]
            state, losses, gt_n = gd(state, {"gt": gt}, step_rng, pyr_w,
                                     update_g=True)
            state, l_r1 = jax.lax.cond(
                it % reg_every == 0,
                lambda s: r1(s, gt_n),
                lambda s: (s, jnp.float32(0.0)), state)
            out = (losses["l_g_pix"].astype(jnp.float32),
                   losses["l_d"].astype(jnp.float32),
                   losses.get("l_g_gan", jnp.float32(0.0))
                   .astype(jnp.float32))
            return state, out

        state, ls = jax.lax.scan(body, state, jnp.arange(iters))
        return state, ls

    return loop


def save_state(state, path):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, jax.device_get(state))
    # StandardCheckpointer.save is ASYNC: without the explicit wait the
    # rename below races the background commit (observed: FileNotFoundError
    # on the .tmp -> path swap, then "cannot schedule new futures after
    # shutdown" from the orphaned commit thread at interpreter exit)
    ckptr.wait_until_finished()
    ckptr.close()
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)


def load_state(path):
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--recipe-scale", type=int, default=10,
                    help="divide every production schedule constant by "
                         "this (200k recipe -> 20k at 10)")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--val-every", type=int, default=500)
    ap.add_argument("--niqe-every", type=int, default=2000)
    ap.add_argument("--snapshot-iter", type=int, default=5500)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--save-every", type=int, default=1000,
                    help="checkpoint cadence in iters (orbax save is a "
                         "full device_get over the ~14 MB/s tunnel — "
                         "per-chunk saves would dominate wall time; a "
                         "tunnel death loses at most save_every iters)")
    ap.add_argument("--budget-s", type=float, default=7200.0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no-export", action="store_true")
    args = ap.parse_args()

    tiny = args.tiny
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        args.iters, args.chunk, args.val_every = 4, 2, 2
        args.niqe_every, args.snapshot_iter = 2, 2
        args.bs, args.budget_s = 2, 1e9
    guard_backend(probe_timeout_s=480, total_timeout_s=14400)
    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform == "tpu"

    s = args.recipe_scale
    total = args.iters
    milestones = (100000 // s, 150000 // s)
    remove_pyr = 50000 // s
    dt = None if tiny else jnp.bfloat16

    hw = 64 if tiny else 256
    model = bt.build_gfpgan_trainer(
        args.bs, dtype=dt, tiny_net=tiny, img_hw=hw, total_iter=total,
        milestones=milestones, remove_pyramid_loss=remove_pyr,
        grad_clip=args.grad_clip)
    loop = scan_loop_pyr(model, args.chunk)

    rng_np = np.random.default_rng(0)
    pool = jnp.asarray(bt.real_crops(hw, 8 if tiny else 128, rng_np),
                       jnp.float32)
    val_imgs = jnp.asarray(bt.real_crops(hw, 2 if tiny else 8,
                                         np.random.default_rng(7)),
                           jnp.float32)
    val_key = jax.random.PRNGKey(123)
    degrade = model.degrade_fn
    net_g = model.net_g

    # fixed degraded val batch — jit ARGS only (docs/TRAINING.md axon
    # constant-embedding miscompile)
    @jax.jit
    def val_out(params, imgs, key):
        lq, gt = degrade(key, imgs)
        out = net_g.apply({"params": params}, lq, randomize_noise=False)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.clip(out.astype(jnp.float32), -1, 1), gt

    def val_psnr(params):
        out, gt = val_out(params, val_imgs, val_key)
        out, gt = np.asarray(out), np.asarray(gt, np.float32)
        mse = float(np.mean((out - gt) ** 2))
        return 10 * np.log10(4.0 / mse)

    def val_niqe(params, n=4):
        if hw < 96:  # NIQE works on 96² blocks — undefined at tiny scale
            return float("nan")
        from image_restoration_tpu.metrics import calculate_niqe
        out, _ = val_out(params, val_imgs, val_key)
        imgs = ((np.asarray(out[:n], np.float32) + 1) * 127.5)
        imgs = np.clip(imgs, 0, 255)[..., ::-1]  # BGR u8-range
        return float(np.mean([calculate_niqe(im, crop_border=0,
                                             convert_to="y")
                              for im in imgs]))

    # ------------------------------------------------- resume / fresh
    os.makedirs(EXP, exist_ok=True)
    ckpt = os.path.join(EXP, "state.ckpt")
    art_path = os.path.join(ASSETS, "gfpgan_longrun.json")
    curve = {"iters": [], "l_pix": [], "l_d": [], "l_gan": [],
             "val_psnr_ema": [], "val_psnr_live": [], "lr_g": []}
    niqe_curve = {"iters": [], "niqe_ema": []}
    done = 0
    if not tiny and os.path.isdir(ckpt):
        restored = load_state(ckpt)
        model.state = jax.tree.map(jnp.asarray, restored)
        done = int(np.asarray(model.state["iter"]))
        try:
            old = json.load(open(art_path))
            curve = old.get("curve", curve)
            niqe_curve = old.get("niqe_curve", niqe_curve)
        except Exception:
            pass
        log(f"resumed from {ckpt} at iter {done}")

    out = {
        "date": time.strftime("%Y-%m-%d"),
        "config": f"production recipe / {s}: {total} iters, "
                  f"MultiStepLR x0.5 @ {list(milestones)}, "
                  f"remove_pyramid_loss {remove_pyr}, R1/16, EMA, "
                  f"VGG perceptual+style, wgan_softplus, "
                  f"grad_clip {args.grad_clip}, bs {args.bs}, bf16",
        "data": "256² crops of the reference test_images, on-device "
                "production FFHQ degradation (fresh kernels each iter)",
        "curve": curve, "niqe_curve": niqe_curve,
    }

    def write_artifact(final=False):
        if tiny or not on_tpu:
            return
        os.makedirs(ASSETS, exist_ok=True)
        out["complete"] = bool(final)
        with open(art_path, "w") as f:
            json.dump(out, f, indent=1)

    def lr_at(it):
        lr = 2e-3
        for m in milestones:
            if it >= m:
                lr *= 0.5
        return lr

    # --------------------------------------------------------- train
    state = model.state
    rng = jax.random.PRNGKey(42)
    snap_path = os.path.join(EXP, "snapshot.ckpt")
    t_start = time.perf_counter()
    chunk_cost = None
    p0 = val_psnr(state["ema_g"])
    log(f"iter {done}: val PSNR {p0:.2f} dB (ema), "
        f"pyramid crossing at {remove_pyr}, milestones {milestones}")
    while done < total:
        if chunk_cost is not None and \
                time.perf_counter() - t_start + chunk_cost > args.budget_s:
            log(f"wall budget {args.budget_s:.0f}s reached at iter {done} "
                f"— resumable from the checkpoint")
            break
        t0 = time.perf_counter()
        pyr_w = model.pyramid_loss_weight if done < remove_pyr else 1e-12
        rng, sub = jax.random.split(rng)
        state, (l_pix, l_d, l_gan) = loop(state, pool, sub,
                                          jnp.float32(pyr_w), bs=args.bs)
        l_pix, l_d, l_gan = (np.asarray(a) for a in (l_pix, l_d, l_gan))
        assert np.all(np.isfinite(l_pix)) and np.all(np.isfinite(l_d)), \
            f"non-finite losses at iter {done}"
        done += args.chunk
        dtm = time.perf_counter() - t0
        chunk_cost = dtm if chunk_cost is None else min(chunk_cost, dtm)
        if done % args.val_every < args.chunk:
            p_ema = val_psnr(state["ema_g"])
            p_live = val_psnr(state["params_g"])
            curve["iters"].append(done)
            curve["l_pix"].append(round(float(l_pix.mean()), 5))
            curve["l_d"].append(round(float(l_d.mean()), 5))
            curve["l_gan"].append(round(float(l_gan.mean()), 5))
            curve["val_psnr_ema"].append(round(p_ema, 3))
            curve["val_psnr_live"].append(round(p_live, 3))
            curve["lr_g"].append(lr_at(done))
            log(f"iter {done:6d}: l_pix {l_pix.mean():.4f} "
                f"l_d {l_d.mean():.4f} l_gan {l_gan.mean():.4f} "
                f"val {p_ema:.2f} dB (ema) / {p_live:.2f} (live) "
                f"lr {lr_at(done):.1e} pyr_w {pyr_w:g} [{dtm:.1f}s/chunk]")
        if done % args.niqe_every < args.chunk:
            nq = val_niqe(state["ema_g"])
            niqe_curve["iters"].append(done)
            niqe_curve["niqe_ema"].append(round(nq, 3))
            log(f"  NIQE(ema) at {done}: {nq:.3f}")
        if not tiny:
            model.state = state
            if done % args.save_every < args.chunk or done >= total:
                save_state(state, ckpt)
            if abs(done - args.snapshot_iter) < args.chunk and \
                    not os.path.isdir(snap_path):
                save_state({"ema_g": state["ema_g"],
                            "iter": state["iter"]}, snap_path)
                log(f"  snapshot saved at iter {done}")
            write_artifact()

    if not tiny and done > 0:
        save_state(state, ckpt)  # budget break may land between save points

    out["iters_done"] = done
    out["wall_minutes"] = round((time.perf_counter() - t_start) / 60, 1)

    # ------------------------------------------- snapshot vs final eval
    if os.path.isdir(snap_path) and done > args.snapshot_iter:
        snap = load_state(snap_path)
        comp = {"snapshot_iter": int(np.asarray(snap["iter"]))}
        outs = {}
        for name, params in (("snapshot", snap["ema_g"]),
                             ("final", state["ema_g"])):
            o, gt = val_out(jax.tree.map(jnp.asarray, params),
                            val_imgs, val_key)
            o, gt = np.asarray(o), np.asarray(gt, np.float32)
            mse = float(np.mean((o - gt) ** 2))
            comp[f"{name}_psnr"] = round(10 * np.log10(4.0 / mse), 3)
            comp[f"{name}_niqe"] = round(val_niqe(
                jax.tree.map(jnp.asarray, params)), 3)
            outs[name] = o
        comp["final_minus_snapshot_psnr_db"] = round(
            comp["final_psnr"] - comp["snapshot_psnr"], 3)
        out["snapshot_vs_final"] = comp
        log(f"snapshot@{comp['snapshot_iter']} vs final@{done}: "
            f"{comp['snapshot_psnr']} -> {comp['final_psnr']} dB "
            f"({comp['final_minus_snapshot_psnr_db']:+.3f}); NIQE "
            f"{comp['snapshot_niqe']} -> {comp['final_niqe']}")
        if not tiny and on_tpu:
            try:  # side-by-side strip: lq | snapshot | final | gt
                import cv2
                lq, gt = jax.jit(degrade)(val_key, val_imgs)
                def u8(a, lo=-1.0, hi=1.0):
                    a = (np.asarray(a, np.float32) - lo) / (hi - lo)
                    return (np.clip(a, 0, 1) * 255).astype(np.uint8)
                n = min(4, val_imgs.shape[0])
                up = [cv2.resize(u8(np.asarray(lq)[i], 0, 1),
                                 (hw, hw), interpolation=cv2.INTER_NEAREST)
                      for i in range(n)]
                rows = [np.concatenate(
                    [up[i], u8(outs["snapshot"][i]), u8(outs["final"][i]),
                     u8(np.asarray(gt, np.float32)[i], 0, 1)], axis=1)
                    for i in range(n)]
                strip = np.concatenate(rows, axis=0)[..., ::-1]
                cv2.imwrite(os.path.join(
                    ASSETS, "gfpgan_longrun_compare.png"), strip)
                out["compare_png"] = "docs/assets/gfpgan_longrun_compare" \
                                     ".png (lq|snapshot|final|gt)"
            except Exception as e:
                log(f"compare strip failed: {e!r}")

    # ------------------------------------------------- engine export
    if not args.no_export and not tiny and done >= total:
        try:
            from jax import export as jexport
            from image_restoration_tpu.infer import (Restorer,
                                                     PRODUCTION_GFPGAN)
            restorer = Restorer(dict(PRODUCTION_GFPGAN), dtype=jnp.bfloat16)
            ema = jax.device_get(state["ema_g"])
            restorer.variables = {"params": jax.tree.map(
                lambda a, b: jnp.asarray(a, b.dtype), ema,
                restorer.variables["params"])}
            bsz = 8
            x_spec = jax.ShapeDtypeStruct((bsz, hw, hw, 3), jnp.uint8)
            params = restorer.variables["params"]
            exported = jexport.export(jax.jit(
                lambda x: restorer._fwd_u8(params, x)))(x_spec)
            ser = exported.serialize()
            x = (np.random.default_rng(0).random((bsz, hw, hw, 3))
                 * 255).astype(np.uint8)
            got = np.asarray(jexport.deserialize(ser).call(jnp.asarray(x)),
                             np.float32)
            want = restorer.restore_batch_u8(x).astype(np.float32)
            mse = float(np.mean((got - want) ** 2))
            gate = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
            eng_dir = os.path.join(EXP, "engine")
            os.makedirs(eng_dir, exist_ok=True)
            with open(os.path.join(eng_dir, "engine.bin"), "wb") as f:
                f.write(ser)
            with open(os.path.join(eng_dir, "engine.json"), "w") as f:
                json.dump({"model": "GFPGANv1OCR",
                           "net_opt": dict(PRODUCTION_GFPGAN),
                           "batch": bsz, "input_shape": [bsz, hw, hw, 3],
                           "input_dtype": "uint8", "io": "u8",
                           "quant": None, "mean": [0.5] * 3,
                           "std": [0.5] * 3, "out_min_max": [-1, 1],
                           "geometry": False, "trained_iters": done,
                           "roundtrip_db": round(gate, 1),
                           "platforms": list(exported.platforms)},
                          f, indent=1)
            out["engine"] = {"dir": "experiments/gfpgan_longrun/engine",
                             "roundtrip_db": round(gate, 1)}
            log(f"engine exported ({gate:.1f} dB round-trip) -> {eng_dir}")
        except Exception as e:
            out["engine_error"] = repr(e)
            log(f"engine export failed: {e!r}")

    write_artifact(final=done >= total)

    def _num(x):  # NaN is not valid JSON
        return None if x is None or (isinstance(x, float)
                                     and not np.isfinite(x)) else x
    print(json.dumps({
        "metric": "gfpgan_longrun_val_psnr_ema_db",
        "value": _num(curve["val_psnr_ema"][-1] if curve["val_psnr_ema"]
                      else None),
        "iters": done,
        "niqe": _num(niqe_curve["niqe_ema"][-1] if niqe_curve["niqe_ema"]
                     else None)}), flush=True)


if __name__ == "__main__":
    main()
