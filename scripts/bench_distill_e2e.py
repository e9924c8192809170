#!/usr/bin/env python
"""Distillation END TO END on the real chip: close BASELINE config #1.

The measured RRDB kernel study (docs/PERFORMANCE.md) caps RRDBNet-23
serving at ~3.1 tiles/s (dense-block output-width starvation on the MXU)
while SRVGG serves at ~222 tiles/s; docs/PARITY.md names distillation
(configs/train_distill_rrdb_to_srvgg.yml) as the answer. Round 3 measured
only the distill STEP cost; this script produces the missing quality
evidence, on real `test_images/` content:

  stage T   — train the RRDB-23 teacher (SRModel, L1, on-device
              second-order Real-ESRGAN degradation) under an adaptive
              wall budget; checkpoint to experiments/distill_e2e/.
  stage S   — from the SAME student init and data stream, train
              (a) plain-L1 SRVGG and (b) distilled SRVGG (DistillModel,
              frozen teacher forward inside the jitted step).
  stage E   — held-out val crops, ONE fixed degradation (jit args only —
              docs/TRAINING.md axon constant-embedding miscompile):
              PSNR/SSIM vs GT for teacher/both students (EMA and live),
              student-vs-teacher-output PSNR, then PTQ-export the
              distilled student to the pack-2 int8 serving graph and
              report its SERVED quality + on-chip 528² bs=8 tiles/s
              (the bench.py headline geometry).

Every stage persists: the teacher checkpoint is orbax-saved per
validation chunk and the artifact (docs/assets/distill_e2e.json) is
rewritten after every stage, so a mid-run tunnel death loses at most one
chunk. Re-running skips completed stages.

Reference anchor: the distilled student replaces serving RRDBNet
(ref Car_Plate-Restoration/basicsr/archs/rrdbnet_arch.py:66-119) with
SRVGG (ref basicsr/archs/srvgg_arch.py:9-70) at the teacher's quality.
--tiny is the forced-CPU structural sanity mode (no artifact writes).
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

from bench import guard_backend, log, onchip_ms
from bench_train import real_crops, sr_scan_loop

ASSETS = os.path.join(REPO, "docs", "assets")
EXP = os.path.join(REPO, "experiments", "distill_e2e")


# ------------------------------------------------------------- builders

def build_teacher_trainer(bs, num_block, gt_hw, scale=4, lr=2e-4):
    """SRModel with an RRDBNet generator: the quality-reference teacher.

    Mirrors the reference ESRGAN production recipe's L1 phase
    (ref basicsr/options/train/train_esrgan_x4.yml) through the same
    on-device degradation the students see."""
    from image_restoration_tpu.models import build_model
    from image_restoration_tpu.data.pipelines import (
        RealESRGANDegradationConfig, make_realesrgan_degradation)

    opt = {
        "is_train": True, "manual_seed": 0, "num_devices": 1,
        "scale": scale, "gt_size": gt_hw,
        "path": {"models": "/tmp/distill_e2e/models"},
        "logger": {},
        "model_type": "SRModel",
        "network_g": dict(type="RRDBNet", scale=scale, num_feat=64,
                          num_block=num_block),
        "train": {
            # grad_clip: one bad batch at iter 3500 of the unclipped run
            # measured a 60x L1 spike that collapsed live PSNR 31.6 → 6.7
            # dB and poisoned the EMA — deep RRDB stacks need the bound
            "optim_g": {"type": "Adam", "lr": lr, "grad_clip": 1.0},
            "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                          "gamma": 0.5},
            "total_iter": 400000,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "ema_decay": 0.999,
        },
    }
    model = build_model(opt)
    model.set_degradation_pipeline(make_realesrgan_degradation(
        RealESRGANDegradationConfig(scale=scale)))
    return model


def build_student_trainer(bs, num_feat, num_conv, gt_hw, scale=4, lr=1e-3,
                          teacher_block=None, distill_w=1.0, pixel_w=0.5):
    """SRVGG student: plain SRModel (teacher_block=None) or DistillModel.

    Both arms share manual_seed=0 → bit-identical network_g init; the
    caller feeds both the same data stream."""
    from image_restoration_tpu.models import build_model
    from image_restoration_tpu.data.pipelines import (
        RealESRGANDegradationConfig, make_realesrgan_degradation)

    train = {
        # grad_clip for the students too: the r5 seed-3 replicate run
        # measured the UNCLIPPED distill arm diverging at ~iter 150
        # (loss 0.018 -> 4e3, live val 31.9 -> 5.1 dB, then a slow
        # 1800-iter recovery) — same failure mode as the r4 teacher
        # collapse, same bound
        "optim_g": {"type": "Adam", "lr": lr, "grad_clip": 1.0},
        "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                      "gamma": 0.5},
        "total_iter": 400000, "ema_decay": 0.999,
        "pixel_opt": {"type": "L1Loss",
                      "loss_weight": pixel_w if teacher_block else 1.0},
    }
    opt = {
        "is_train": True, "manual_seed": 0, "num_devices": 1,
        "scale": scale, "gt_size": gt_hw,
        "path": {"models": "/tmp/distill_e2e/models"},
        "logger": {},
        "model_type": "SRModel",
        "network_g": dict(type="SRVGGNetCompact", num_feat=num_feat,
                          num_conv=num_conv, upscale=scale),
        "train": train,
    }
    if teacher_block:
        opt["model_type"] = "DistillModel"
        # bf16 teacher forward inside the student's step (weights are
        # installed post-build via set_teacher_params)
        opt["network_t"] = dict(type="RRDBNet", scale=scale, num_feat=64,
                                num_block=teacher_block, dtype="bf16")
        train["allow_random_teacher"] = True
        train["distill_opt"] = {"type": "L1Loss", "loss_weight": distill_w}
    model = build_model(opt)
    model.set_degradation_pipeline(make_realesrgan_degradation(
        RealESRGANDegradationConfig(scale=scale)))
    return model


# ------------------------------------------------------------- plumbing

def save_params(tree, path):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import shutil
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree))
    # save is ASYNC; dropping the checkpointer before its background
    # commit finishes can kill the save at interpreter/GC shutdown
    # (observed in bench_gfpgan_longrun's tmp-rename variant)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path):
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def write_artifact(out, final=False):
    if out.get("_tiny"):
        return
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, "distill_e2e.json")
    rec = {k: v for k, v in out.items() if not k.startswith("_")}
    rec["complete"] = bool(final)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    if final:
        log(f"wrote {path}")


def train_loop(model, pool, bs, total_iters, chunk, seed, val_fn,
               label, out, curve_key, budget_s=None, ckpt_path=None,
               iter_offset=0):
    """Chunked scan training with per-chunk val + artifact persistence.

    Returns (state, iters_done). With budget_s, the iteration count
    adapts: after the first (compile-inclusive) chunk, remaining chunks
    are bounded by measured chunk wall time. iter_offset shifts the
    recorded/checkpointed iteration numbers when extending a restored
    teacher (--extend-teacher)."""
    run = sr_scan_loop(model, chunk)
    state = model.state
    rng = jax.random.PRNGKey(seed)
    curve = {"iters": [], "loss": [], "val_psnr_ema": [],
             "val_psnr_live": []}
    out[curve_key] = curve
    done = 0
    t_start = time.perf_counter()
    chunk_cost = None
    while done < total_iters:
        if budget_s is not None and chunk_cost is not None and \
                time.perf_counter() - t_start + chunk_cost > budget_s:
            log(f"  {label}: wall budget {budget_s:.0f}s reached at "
                f"iter {done} (chunk costs {chunk_cost:.1f}s)")
            break
        t0 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        res = run(state, pool, sub, bs)
        state = res[0]
        losses = np.asarray(res[1])
        assert np.all(np.isfinite(losses)), f"{label} non-finite at {done}"
        done += chunk
        dt = time.perf_counter() - t0
        chunk_cost = dt if chunk_cost is None else min(chunk_cost, dt)
        p_ema = float(val_fn(state["ema_g"]))
        p_live = float(val_fn(state["params_g"]))
        curve["iters"].append(done + iter_offset)
        curve["loss"].append(round(float(losses.mean()), 5))
        curve["val_psnr_ema"].append(round(p_ema, 3))
        curve["val_psnr_live"].append(round(p_live, 3))
        log(f"  {label} iter {done + iter_offset:5d}: "
            f"loss {losses.mean():.4f} "
            f"val {p_ema:.2f} dB (ema) / {p_live:.2f} dB (live) "
            f"[{dt:.1f}s/chunk]")
        if ckpt_path:  # survive a tunnel death mid-stage
            save_params({"params_g": state["params_g"],
                         "ema_g": state["ema_g"],
                         "iters": np.asarray(done + iter_offset)},
                        ckpt_path)
        write_artifact(out)
    return state, done


# ------------------------------------------------------------------ main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="forced-CPU structural sanity (no artifacts)")
    ap.add_argument("--teacher-iters", type=int, default=4000)
    ap.add_argument("--teacher-budget-s", type=float, default=1500.0,
                    help="teacher stage wall budget (adaptive iters)")
    ap.add_argument("--student-iters", type=int, default=2000)
    ap.add_argument("--student-budget-s", type=float, default=480.0)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--gt", type=int, default=256)
    ap.add_argument("--teacher-blocks", type=int, default=23)
    ap.add_argument("--teacher-only", action="store_true",
                    help="stop after stage T (teacher train + eval): use "
                         "with --extend-teacher windows so each window "
                         "does not retrain the students; a final full "
                         "run produces the student/eval stages")
    ap.add_argument("--student-seed", type=int, default=2,
                    help="data-stream seed shared by BOTH student arms; "
                         "vary to replicate the distill-vs-L1 delta "
                         "(single-run noise check, VERDICT r4 weak #5)")
    ap.add_argument("--extend-teacher", action="store_true",
                    help="resume the teacher checkpoint and train it "
                         "FURTHER for --teacher-budget-s (the RRDB-23 "
                         "teacher learns slower than the SRVGG student "
                         "early on — it needs several budget windows to "
                         "pull ahead); students/eval then rerun against "
                         "the stronger teacher")
    args = ap.parse_args()

    tiny = args.tiny
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        args.teacher_iters, args.student_iters = 4, 4
        args.teacher_budget_s = args.student_budget_s = 1e9
        args.bs, args.chunk, args.gt, args.teacher_blocks = 2, 2, 64, 1
    # teacher 2400s + two students + compiles exceeds the default 3600s
    # watchdog; the tunnel also stalls O(minutes) under load, so give the
    # liveness probe headroom too (observed 134s for a warm tiny op)
    guard_backend(probe_timeout_s=480, total_timeout_s=10800)
    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform == "tpu"

    num_feat, num_conv = (8, 2) if tiny else (64, 32)
    scale = 4
    bs, gt_hw = args.bs, args.gt

    rng_np = np.random.default_rng(0)
    pool = jnp.asarray(real_crops(gt_hw, 8 if tiny else 64, rng_np),
                       jnp.float32)
    val_imgs = jnp.asarray(real_crops(gt_hw, 2 if tiny else 8,
                                      np.random.default_rng(7)),
                           jnp.float32)
    val_key = jax.random.PRNGKey(123)

    out = {"date": time.strftime("%Y-%m-%d"), "_tiny": tiny,
           "bs": bs, "gt": gt_hw,
           "teacher": f"RRDBNet-{args.teacher_blocks} L1, lr 2e-4",
           "student": f"SRVGG {num_feat}f/{num_conv}c x4, lr 1e-3, "
                      f"same init + data stream both arms",
           "val": "held-out real test_images crops, one fixed "
                  "2nd-order degradation",
           "timing": "on-chip lax.scan, jit-argument discipline"}
    if not tiny:
        # carry the earlier windows' curves so the full teacher history
        # survives the whole-artifact rewrite (--extend-teacher appends
        # the prior window's curve; a restore-only full run keeps the
        # history as-is)
        try:
            old = json.load(open(os.path.join(ASSETS, "distill_e2e.json")))
            hist = old.get("teacher_curve_history", [])
            if old.get("teacher_curve") and (args.extend_teacher or
                                             not hist):
                hist = hist + [old["teacher_curve"]]
            if hist:
                out["teacher_curve_history"] = hist
            # gap-vs-budget: prior completed runs become budget POINTS that
            # survive the whole-artifact rewrite (VERDICT r4 weak #5: the
            # "budget knob" claim needs more than one measured point)
            pts = old.get("budget_points", [])
            if old.get("student_l1") and old.get("student_distill"):
                pt = {"student_iters": old["student_l1"]["iters"],
                      "student_seed": old.get("student_seed", 2),
                      "teacher_psnr": old.get("teacher_psnr"),
                      "l1_psnr": old["student_l1"]["psnr"],
                      "distill_psnr": old["student_distill"]["psnr"],
                      "distill_minus_l1_db": old.get("distill_minus_l1_db"),
                      "distill_gap_to_teacher_db":
                          old["student_distill"]["gap_to_teacher_db"],
                      "int8_gap_to_teacher_db":
                          old.get("student_distill_int8",
                                  {}).get("gap_to_teacher_db"),
                      "date": old.get("date")}
                key = (pt["student_iters"], pt["student_seed"])
                if key not in [(p["student_iters"],
                                p.get("student_seed", 2)) for p in pts]:
                    pts = pts + [pt]
            if pts:
                out["budget_points"] = pts
        except Exception:
            pass
    out["student_seed"] = args.student_seed

    # one fixed degraded val pair shared by every arm (jit ARGS only)
    probe = build_student_trainer(bs, num_feat, num_conv, gt_hw, scale)
    lq_val, gt_val = jax.jit(probe.degrade_fn)(val_key, val_imgs)
    lq_val = jax.block_until_ready(lq_val)
    degrade_fn = probe.degrade_fn
    student_net = probe.net_g
    del probe

    def span_psnr(ref, got):
        ref = np.asarray(ref, np.float64)
        got = np.clip(np.asarray(got, np.float64), 0, 1)
        span = max(ref.max() - ref.min(), 1e-9)
        return 10 * np.log10(span ** 2 /
                             max(float(np.mean((ref - got) ** 2)), 1e-20))

    gt_val_np = np.asarray(gt_val, np.float32)

    def quality(out_arr):
        """PSNR (span) + mean SSIM vs the val GT, basicsr conventions."""
        from image_restoration_tpu.metrics import calculate_ssim
        got = np.clip(np.asarray(out_arr, np.float32), 0, 1)
        ssim = float(np.mean([calculate_ssim(
            got[i] * 255.0, gt_val_np[i] * 255.0, crop_border=scale)
            for i in range(got.shape[0])]))
        return round(span_psnr(gt_val_np, got), 3), round(ssim, 4)

    # ---------------------------------------------------- stage T: teacher
    os.makedirs(EXP, exist_ok=True)
    t_ckpt = os.path.join(EXP, "teacher.ckpt")
    teacher = build_teacher_trainer(bs, args.teacher_blocks, gt_hw, scale)
    t_net = teacher.net_g

    @jax.jit
    def teacher_out(params, lq):
        o = t_net.apply({"params": params}, lq)
        return o[0] if isinstance(o, tuple) else o

    @jax.jit
    def teacher_val_psnr(params, imgs, key):
        lq, gt = degrade_fn(key, imgs)
        o = t_net.apply({"params": params}, lq)
        o = jnp.clip((o[0] if isinstance(o, tuple) else o)
                     .astype(jnp.float32), 0, 1)
        mse = jnp.mean((o - gt.astype(jnp.float32)) ** 2)
        return 10 * jnp.log10(1.0 / mse)

    prev = load_params(t_ckpt) if os.path.isdir(t_ckpt) and not tiny \
        else None
    if prev is not None and not args.extend_teacher:
        t_params = {"params_g": prev["params_g"],
                    "ema_g": prev["ema_g"]}
        out["teacher_iters"] = int(np.asarray(prev["iters"]))
        log(f"stage T: restored teacher at iter {out['teacher_iters']} "
            f"from {t_ckpt}")
    else:
        off = 0
        if prev is not None:  # --extend-teacher: warm-start params + EMA
            off = int(np.asarray(prev["iters"]))
            # Adam moments reset (the ckpt carries params only): a ~100-
            # iter transient at constant lr, irrelevant over a budget
            # window of thousands of iters
            teacher.state["params_g"] = jax.tree.map(jnp.asarray,
                                                     prev["params_g"])
            teacher.state["ema_g"] = jax.tree.map(jnp.asarray,
                                                  prev["ema_g"])
            log(f"stage T: extending teacher from iter {off} "
                f"(fresh optimizer moments, fresh data-stream seed)")
        log(f"stage T: training RRDB-{args.teacher_blocks} teacher "
            f"(≤{args.teacher_iters} iters, ≤{args.teacher_budget_s:.0f}s)")
        t_state, t_done = train_loop(
            teacher, pool, bs, args.teacher_iters, args.chunk,
            seed=1 + off,  # fresh degradation stream per extension window
            val_fn=lambda p: teacher_val_psnr(p, val_imgs, val_key),
            label="teacher", out=out, curve_key="teacher_curve",
            budget_s=args.teacher_budget_s,
            ckpt_path=None if tiny else t_ckpt, iter_offset=off)
        t_params = {"params_g": jax.device_get(t_state["params_g"]),
                    "ema_g": jax.device_get(t_state["ema_g"])}
        out["teacher_iters"] = off + t_done
        if not tiny:
            save_params({**t_params, "iters": np.asarray(off + t_done)},
                        t_ckpt)
    del teacher

    # pick the better teacher head (EMA lags badly at short horizons)
    p_ema, s_ema = quality(teacher_out(t_params["ema_g"], lq_val))
    p_live, s_live = quality(teacher_out(t_params["params_g"], lq_val))
    use_ema = p_ema >= p_live
    teacher_params = t_params["ema_g" if use_ema else "params_g"]
    out["teacher_psnr"], out["teacher_ssim"] = max(
        (p_ema, s_ema), (p_live, s_live))
    out["teacher_head"] = "ema" if use_ema else "live"
    t_out_val = np.asarray(teacher_out(teacher_params, lq_val), np.float32)
    log(f"teacher val: {out['teacher_psnr']} dB / SSIM "
        f"{out['teacher_ssim']} ({out['teacher_head']} head)")
    write_artifact(out)
    if args.teacher_only:
        log("--teacher-only: stopping after stage T (students/eval in a "
            "later full run)")
        print(json.dumps({"ok": True, "teacher_only": True,
                          "teacher_iters": out["teacher_iters"],
                          "teacher_psnr": out["teacher_psnr"]}),
              flush=True)
        return

    # --------------------------------------------- stage S: student arms
    def student_val_psnr(params, imgs, key):
        lq, gt = degrade_fn(key, imgs)
        o = student_net.apply({"params": params}, lq)
        o = jnp.clip((o[0] if isinstance(o, tuple) else o)
                     .astype(jnp.float32), 0, 1)
        mse = jnp.mean((o - gt.astype(jnp.float32)) ** 2)
        return 10 * jnp.log10(1.0 / mse)

    student_val_psnr = jax.jit(student_val_psnr)

    arms = {}
    for arm in ("l1", "distill"):
        log(f"stage S: student arm '{arm}' (≤{args.student_iters} iters)")
        model = build_student_trainer(
            bs, num_feat, num_conv, gt_hw, scale,
            teacher_block=args.teacher_blocks if arm == "distill" else None)
        if arm == "distill":
            # teacher forward rides bf16 inside the student step
            model.set_teacher_params(jax.tree.map(
                lambda a: jnp.asarray(a), teacher_params))
        state, done = train_loop(
            model, pool, bs, args.student_iters, args.chunk,
            seed=args.student_seed,  # SAME data stream for both arms
            val_fn=lambda p: student_val_psnr(p, val_imgs, val_key),
            label=f"student-{arm}", out=out,
            curve_key=f"student_{arm}_curve",
            budget_s=args.student_budget_s)
        arms[arm] = {"ema_g": jax.device_get(state["ema_g"]),
                     "params_g": jax.device_get(state["params_g"]),
                     "iters": done}
        del model

    @jax.jit
    def student_out(params, lq):
        o = student_net.apply({"params": params}, lq)
        return o[0] if isinstance(o, tuple) else o

    # ------------------------------------------------------ stage E: eval
    for arm, blob in arms.items():
        p_e, s_e = quality(student_out(blob["ema_g"], lq_val))
        p_l, s_l = quality(student_out(blob["params_g"], lq_val))
        head = "ema" if p_e >= p_l else "live"
        psnr, ssim = max((p_e, s_e), (p_l, s_l))
        sel = blob["ema_g" if head == "ema" else "params_g"]
        vs_teacher = round(span_psnr(
            t_out_val, np.asarray(student_out(sel, lq_val), np.float32)), 3)
        out[f"student_{arm}"] = {
            "iters": blob["iters"], "head": head, "psnr": psnr,
            "ssim": ssim, "vs_teacher_out_psnr": vs_teacher,
            "gap_to_teacher_db": round(out["teacher_psnr"] - psnr, 3)}
        blob["selected"] = sel
        log(f"student-{arm}: {psnr} dB / SSIM {ssim} ({head}), "
            f"{out[f'student_{arm}']['gap_to_teacher_db']:+.3f} dB below "
            f"teacher, {vs_teacher} dB vs teacher output")
    out["distill_minus_l1_db"] = round(
        out["student_distill"]["psnr"] - out["student_l1"]["psnr"], 3)
    write_artifact(out)

    # served int8 path for the distilled student (the headline serving
    # graph: PTQ per-out-channel weights + calibrated act scales, pack-2)
    from image_restoration_tpu.ops.quantized_inference import (
        calibrate_srvgg_act_scales, quantize_srvgg_params,
        quantized_srvgg_forward)

    sel = arms["distill"]["selected"]
    calib_lq, _ = jax.jit(degrade_fn)(jax.random.PRNGKey(99), pool[:4])
    scales = jax.device_get(jax.jit(
        lambda p, x: calibrate_srvgg_act_scales(p, x, num_conv))(
        sel, calib_lq))
    qparams = quantize_srvgg_params(sel, [float(s) for s in scales],
                                    num_conv, pack=2)

    @jax.jit
    def int8_out(q, lq):
        return quantized_srvgg_forward(q, lq, num_conv, upscale=scale,
                                       pack=2)

    p_q, s_q = quality(int8_out(qparams, lq_val))
    out["student_distill_int8"] = {
        "psnr": p_q, "ssim": s_q,
        "gap_to_teacher_db": round(out["teacher_psnr"] - p_q, 3)}
    log(f"student-distill SERVED int8: {p_q} dB / SSIM {s_q} "
        f"({out['student_distill_int8']['gap_to_teacher_db']:+.3f} dB "
        f"below teacher)")

    # this run's point joins the gap-vs-budget series
    out.setdefault("budget_points", []).append({
        "student_iters": out["student_l1"]["iters"],
        "student_seed": args.student_seed,
        "teacher_psnr": out["teacher_psnr"],
        "l1_psnr": out["student_l1"]["psnr"],
        "distill_psnr": out["student_distill"]["psnr"],
        "distill_minus_l1_db": out["distill_minus_l1_db"],
        "distill_gap_to_teacher_db":
            out["student_distill"]["gap_to_teacher_db"],
        "int8_gap_to_teacher_db":
            out["student_distill_int8"]["gap_to_teacher_db"],
        "date": out["date"]})

    # serving rate of THIS student through the headline tiler geometry
    if on_tpu or tiny:
        tile, halo, sbs = (32, 8, 2) if tiny else (512, 8, 8)
        s = tile + 2 * halo
        x = jnp.asarray(np.random.default_rng(3).random(
            (sbs, s, s, 3), np.float32), jnp.bfloat16)
        try:
            ms = onchip_ms(lambda q, a: int8_out(q, a), qparams, x,
                           iters=2 if tiny else 20, repeats=1 if tiny else 3)
            tps = sbs / (ms / 1e3)
            out["served_tiles_per_sec"] = round(tps, 2)
            out["served_geometry"] = f"tile={tile} halo={halo} bs={sbs} " \
                                     f"packed2-int8"
            log(f"distilled student serving: {tps:.1f} tiles/s "
                f"({out['served_geometry']})")
        except Exception as e:
            log(f"serving timing failed: {e!r}")

    # the ratio this whole exercise exists for
    rl = os.path.join(ASSETS, "rrdb_ladder.json")
    if os.path.isfile(rl) and "served_tiles_per_sec" in out:
        d = json.load(open(rl))
        if d.get("rows"):
            rrdb_tps = max(r["tiles_per_sec"] for r in d["rows"])
            out["speedup_vs_rrdb_serving"] = round(
                out["served_tiles_per_sec"] / rrdb_tps, 1)
            log(f"distilled student vs direct RRDB serving: "
                f"{out['speedup_vs_rrdb_serving']}× "
                f"({out['served_tiles_per_sec']} vs {rrdb_tps} tiles/s)")

    if tiny or not on_tpu:
        log("tiny/off-TPU sanity only — NOT writing distill_e2e.json")
        print(json.dumps({"ok": True, "tiny": True}), flush=True)
        return
    write_artifact(out, final=True)
    print(json.dumps({
        "metric": "distill_gap_to_teacher_db_served_int8",
        "value": out["student_distill_int8"]["gap_to_teacher_db"],
        "unit": "dB", "tiles_per_sec": out.get("served_tiles_per_sec"),
        "distill_minus_l1_db": out["distill_minus_l1_db"]}), flush=True)


if __name__ == "__main__":
    main()
