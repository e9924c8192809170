#!/usr/bin/env python
"""Generate docs/BENCHMARKS.md — one consolidated table of every measured
number (from docs/assets/*.json + BENCH_r*.json), with measurement dates
and pending-queue status. Pure file reads; re-run after any measurement:

    python scripts/gen_benchmark_table.py
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "docs", "assets")

# TPU v5e nominal peaks (docs/PERFORMANCE.md roofline; the chip-calibrated
# large-GEMM ceiling is ~122 TFLOP/s bf16 — see "Chip calibration")
PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.0
# SRVGG-general x4 @ 528² (512 tile + 2×8 halo) per-tile issued T-ops in
# the served pack-2 int8 mode, incl. the 2× block-diagonal packing
# overhead: 0.62 TFLOP dense × 2 (PERFORMANCE.md "Roofline of the
# remaining gap": 8 tiles × 0.62 × 2 = 9.9 T-ops)
HEADLINE_TOPS_PER_TILE = 1.24


def mfu(tflops, peak, unit="TFLOP/s"):
    return f"{tflops:.1f} {unit} ({100 * tflops / peak:.0f}% of " \
           f"{peak:.0f} peak)"


def load(name):
    path = os.path.join(ASSETS, name)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def main():
    rows = []  # (section, metric, value, date/status)

    def add(section, metric, value, date):
        rows.append((section, metric, value, date))

    # ---- headline history
    for bench_file in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            d = json.load(open(bench_file))
            d = d.get("parsed", d)
            add("Headline", f"`{os.path.basename(bench_file)}` "
                            f"{d['metric'][:70]}…",
                f"{d['value']} {d.get('unit', '')} "
                f"({d.get('vs_baseline', '?')}× baseline), "
                f"{mfu(d['value'] * HEADLINE_TOPS_PER_TILE, PEAK_INT8_TOPS, "TOPS")}",
                "round record")
        except Exception:
            pass
    lh = load("last_headline.json")
    if lh:
        add("Headline", "last live-measured headline",
            f"{lh['value']} {lh.get('unit', '')} "
            f"({lh.get('vs_baseline', '?')}× baseline), "
            f"{mfu(lh['value'] * HEADLINE_TOPS_PER_TILE, PEAK_INT8_TOPS, "TOPS")}",
            lh.get("measured_at", "?"))

    # ---- serving
    gq = load("gfpgan_ptq.json")
    if gq:
        for row in gq.get("rows", []):
            if row.get("bs") == 32 and "bf16" in row and "dyn-int8" in row:
                add("Serving", "GFPGAN 256² bs=32 bf16",
                    f"{row['bf16']['imgs_per_sec']} imgs/s", gq["date"])
                add("Serving", "GFPGAN 256² bs=32 dyn-int8 "
                    f"({gq['quality_db_vs_f32']} dB gate)",
                    f"{row['dyn-int8']['imgs_per_sec']} imgs/s", gq["date"])
    rl = load("rrdb_ladder.json")
    if rl and rl.get("rows"):
        best = max(rl["rows"], key=lambda r: r["tiles_per_sec"])
        add("Serving", f"RRDB-23 x4 528² best ({best['mode']}, "
            f"bs={best['bs']})", f"{best['tiles_per_sec']} tiles/s",
            rl["date"])
    vb = load("video_bench.json")
    if vb:
        for k, v in vb.items():
            if isinstance(v, dict) and "frames_per_s" in v:
                add("Serving", f"video SR {k} ({vb.get('geometry', '')})",
                    f"{v['frames_per_s']} frames/s", vb["date"])
    else:
        add("Serving", "video SR BasicVSR/IconVSR/EDVR", "queued",
            "scripts/bench_video.py")
    mb = load("microbatch_bench.json")
    if mb:
        r = mb.get("results", {})
        if "per_request" in r and "microbatch" in r:
            auto = mb.get("auto", {})
            sel = (f"; auto-select → {auto['selected']} "
                   f"(calib {auto['calibration']['speedup']}×)"
                   if auto.get("calibration") else "")
            add("Serving", f"micro-batching ({mb['clients']} clients)",
                f"{r['per_request']['imgs_per_s']:.0f} → "
                f"{r['microbatch']['imgs_per_s']:.0f} imgs/s "
                f"({mb['speedup']}×){sel}", mb["date"])
    else:
        add("Serving", "micro-batching coalesced throughput", "queued",
            "scripts/bench_microbatch.py")

    # ---- end-to-end product
    e2e = load("e2e_latency.json")
    if e2e:
        e = e2e["e2e_ms_per_image"]
        add("E2E product", "/Vehicle_Resolution_GFPGAN/ sequential",
            f"{e['sequential_restores']} ms/img", e2e["date"])
        add("E2E product", "fused bs=2 restore",
            f"{e['fused_bs2_restore']} ms/img", e2e["date"])
        add("E2E product", "batched N=8",
            f"{e['batched_n8']} ms/img", e2e["date"])
        pb = e2e.get("process_batch_real_wall_ms_per_image")
        if pb:
            add("E2E product", "process_batch wall (chunk=8 vs per-image)",
                f"{pb['batched_chunk8']} vs {pb['per_image']} ms/img",
                e2e["date"])
        else:
            add("E2E product", "process_batch wall", "queued",
                "scripts/bench_e2e.py")
        geo = e2e.get("device_geometry") or {}
        if "e2e_ms_per_image_bs8" in geo:
            add("E2E product", "device-geometry (1 dispatch/chunk after "
                "detect)", f"{geo['e2e_ms_per_image_bs8']} ms/img bs8, "
                f"host {geo['host_ms_remaining']} ms", e2e["date"])
        else:
            add("E2E product", "device-geometry latency", "queued",
                "scripts/bench_e2e.py (device_geometry section)")

    # ---- training
    tb = load("train_bench.json")
    if tb:
        for key, label in (("gfpgan_gan_step", "GFPGAN GAN step"),
                           ("sr_l1_step", "SRModel L1 step"),
                           ("detector_step", "detector step")):
            blk = tb.get(key) or {}
            for r in blk.get("rows", []) or []:
                variant = " (remat)" if r.get("remat") else ""
                perf = ""
                if "tflops" in r:
                    # XLA cost-analysis FLOPs / measured step — a known
                    # ~11x post-fusion UNDERCOUNT at these conv shapes;
                    # true MFU is in the roofline section (utils/flops.py
                    # exact-jaxpr numerator)
                    perf = (f", {r['tflops']:.1f} TFLOP/s xla-counted "
                            f"(see Training roofline for true MFU)")
                add("Training", f"{label} bs={r['bs']}{variant}",
                    f"{r['imgs_per_sec']} imgs/s ({r['ms_per_step']} "
                    f"ms/step){perf}",
                    r.get("date") or blk.get("date")
                    or tb.get("meta", {}).get("date", "?"))
    for kind in ("sr", "gfpgan"):
        cv = load(f"train_convergence_{kind}.json")
        if cv:
            c = cv["curve"]
            add("Training", f"{kind.upper()} convergence "
                f"({cv['total_iters']} iters)",
                f"val PSNR {c['val_psnr'][0]} → {c['val_psnr'][-1]} dB",
                cv["date"])
    dc = load("detector_convergence.json")
    if dc:
        add("Training", f"detector convergence ({dc['iters']} iters, "
            f"engine-eval)",
            f"IoU {dc['eval_random_init']['mean_iou']} → "
            f"{dc['eval_trained']['mean_iou']}, det rate "
            f"{dc['eval_trained']['det_rate']}", dc["date"])
    else:
        add("Training", "detector convergence (engine-eval IoU)", "queued",
            "scripts/bench_detector_convergence.py")
    qd = load("qat_distill_bench.json")
    if qd:
        vp = qd.get("qat_vs_ptq") or {}
        if "qat_minus_ptq_db" in vp:
            add("Training", f"QAT vs PTQ served-int8 val PSNR "
                f"({vp.get('iters')} iters, same init/data)",
                f"{vp.get('ptq_int8_psnr')} → {vp.get('qat_int8_psnr')} dB "
                f"({vp['qat_minus_ptq_db']:+} dB)", qd["date"])
        for key, lbl in (("qat4_vs_ptq4", "w4a8"), ("qat2_vs_ptq2",
                                                    "w2a8")):
            w4 = qd.get(key) or {}
            if "qat_minus_ptq_db" in w4:
                add("Training", f"QAT vs PTQ at {lbl} ({w4.get('iters')} "
                    f"iters, same init/data)",
                    f"{w4.get('ptq_w4a8_psnr')} → "
                    f"{w4.get('qat_w4a8_psnr')} dB "
                    f"({w4['qat_minus_ptq_db']:+} dB; float "
                    f"{w4.get('float_psnr')} dB)", qd["date"])
        qs = (qd.get("qat_step") or {})
        if len(qs.get("rows") or []) == 2:
            add("Training", f"QAT step overhead (bs={qs['rows'][0]['bs']})",
                f"{qs['rows'][0]['ms_per_step']} → "
                f"{qs['rows'][1]['ms_per_step']} ms/step "
                f"({qs.get('overhead_pct')}%)", qd["date"])
        for r in (qd.get("distill_step") or {}).get("rows") or []:
            add("Training", f"distill step RRDB-23→SRVGG bs={r['bs']}",
                f"{r['imgs_per_sec']} imgs/s ({r['ms_per_step']} ms/step)",
                qd["date"])
    else:
        add("Training", "QAT/distill trainer steps + QAT-vs-PTQ", "queued",
            "scripts/bench_qat_distill.py")
    de = load("distill_e2e.json")
    if de and de.get("complete"):
        si = de.get("student_distill_int8") or {}
        add("Training", f"distill E2E: {de.get('teacher')} "
            f"({de.get('teacher_iters')} iters) → SRVGG student, "
            f"served int8",
            f"teacher {de.get('teacher_psnr')} dB → student "
            f"{si.get('psnr')} dB ({si.get('gap_to_teacher_db')} dB gap) "
            f"at {de.get('served_tiles_per_sec')} tiles/s "
            f"({de.get('speedup_vs_rrdb_serving')}× vs direct RRDB); "
            f"distill−L1 {de.get('distill_minus_l1_db'):+} dB",
            de["date"])
    else:
        add("Training", "distill E2E (BASELINE config #1 via student)",
            "queued", "scripts/bench_distill_e2e.py")
    ga = load("gan_ablation.json")
    if ga and "arm_gan" in ga and "arm_l1" in ga:
        g, l1 = ga["arm_gan"], ga["arm_l1"]
        add("Training", f"GAN-vs-L1 ablation ({g.get('iters')} iters "
            f"each, same init/data)",
            f"PSNR {g.get('psnr')} vs {l1.get('psnr')} dB; GMS "
            f"{g.get('gms_vs_gt')} vs {l1.get('gms_vs_gt')}; NIQE "
            f"{g.get('niqe')} vs {l1.get('niqe')} (GT "
            f"{ga.get('niqe_gt_anchor')}; lower better)", ga["date"])
    else:
        add("Training", "GAN-vs-L1 ablation (PSNR/GMS/NIQE + triptychs)",
            "queued", "scripts/bench_gan_ablation.py")
    if de:
        for p in de.get("budget_points") or []:
            add("Training", f"distill gap-vs-budget point "
                f"({p['student_iters']} student iters, "
                f"seed {p.get('student_seed', 2)})",
                f"distill gap to teacher {p['distill_gap_to_teacher_db']} "
                f"dB (distill−L1 {p.get('distill_minus_l1_db'):+} dB; "
                f"served-int8 gap {p.get('int8_gap_to_teacher_db')} dB)",
                p.get("date", de["date"]))
    rf = load("train_roofline.json")
    if rf:
        for fam, label in (("gfpgan", "GFPGAN GAN step"),
                           ("sr", "SRModel L1 step")):
            for bskey, st in sorted((rf.get(fam) or {}).items()):
                full = st.get("full") if isinstance(st, dict) else None
                if full:
                    add("Training roofline", f"{label} {bskey}",
                        f"{full['measured_ms']} ms measured vs "
                        f"{full.get('roofline_ms', '?')} ms roofline "
                        f"({full.get('bound', '?')}-bound; "
                        f"{full['jaxpr_gflops']} GF exact-jaxpr, MFU "
                        f"{full.get('mfu_true', 0) * 100:.1f}%; HBM "
                        f"{full.get('hbm_gbytes', '?')} GB/step)",
                        st.get("date") or rf["meta"]["date"])
        tk = ((rf.get("gfpgan") or {}).get("bs16") or
              (rf.get("gfpgan") or {}).get("bs8") or {}).get("top_kernels")
        if tk:
            top3 = "; ".join(f"{r['pct']}% {r['kernel'][:48]}"
                             for r in tk["top"][:3])
            add("Training roofline", "GFPGAN step top kernels (xplane)",
                top3, rf["meta"]["date"])
    lr = load("gfpgan_longrun.json")
    if lr and (lr.get("curve") or {}).get("val_psnr_ema"):
        c = lr["curve"]
        add("Training", f"GFPGAN long-horizon production stack "
            f"({lr.get('iters_done')} iters, scaled recipe)",
            f"val PSNR(ema) {c['val_psnr_ema'][0]} → "
            f"{c['val_psnr_ema'][-1]} dB"
            + (f"; snapshot@"
               f"{lr['snapshot_vs_final']['snapshot_iter']} "
               f"{lr['snapshot_vs_final']['snapshot_psnr']} → final "
               f"{lr['snapshot_vs_final']['final_psnr']} dB (NIQE "
               f"{lr['snapshot_vs_final']['snapshot_niqe']} → "
               f"{lr['snapshot_vs_final']['final_niqe']})"
               if lr.get("snapshot_vs_final") else "")
            + (f"; engine round-trip "
               f"{lr['engine']['roundtrip_db']} dB"
               if lr.get("engine") else ""),
            lr["date"])
    db = load("dcn_bench.json")
    if db and "bf16" in db:
        l1 = db["bf16"].get("L1_180x320") or {}
        if "current" in l1:
            add("Serving", "DCN op EDVR-PCD L1 180×320 bf16 "
                "(gather vs windowed-R16)",
                f"{l1['current']} → {l1.get('windowed_R16')} ms/op "
                f"({l1['current'] / l1['windowed_R16']:.1f}×; plain-conv "
                f"anchor {l1.get('conv_ref')} ms)", db["date"])

    # ---- render
    out = ["# Measured benchmarks (auto-generated)",
           "",
           "Single source of measured truth, regenerated from "
           "`docs/assets/*.json` + `BENCH_r*.json` by "
           "`scripts/gen_benchmark_table.py`. \"queued\" rows run "
           "automatically inside `python bench.py` on a live TPU "
           "(see scripts/chip_queue.sh). Methodology: on-chip `lax.scan` "
           "timing (docs/PERFORMANCE.md \"timing\"); host stages "
           "wall-clocked on the serving host.",
           ""]
    cur = None
    for section, metric, value, date in rows:
        if section != cur:
            if cur is not None:
                out.append("")
            out += [f"## {section}", "", "| metric | value | measured |",
                    "|---|---|---|"]
            cur = section
        out.append(f"| {metric} | {value} | {date} |")
    path = os.path.join(REPO, "docs", "BENCHMARKS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
