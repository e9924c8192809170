"""echo_artifacts must render every artifact schema the chip queue can
write — this is the diagnostics tail the driver records, so a format
mismatch here would silently drop round evidence."""

import json
import os
import shutil

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REAL_ASSETS = os.path.join(REPO, "docs", "assets")

# minimal valid instances of the artifacts the queued jobs write (the
# writers' schemas: bench_microbatch.py, bench_video.py,
# bench_detector_convergence.py, bench_e2e.py)
SYNTH = {
    "microbatch_bench.json": {
        "date": "2026-08-18", "clients": 32, "per_client": 8,
        "max_batch": 32, "wait_ms": 8.0, "quant": None, "speedup": 1.9,
        "results": {
            "per_request": {"imgs_per_s": 100.0, "wall_s": 2.56, "n": 256,
                            "lat_p50_ms": 300.0, "lat_p95_ms": 350.0},
            "microbatch": {"imgs_per_s": 190.0, "wall_s": 1.35, "n": 256,
                           "lat_p50_ms": 160.0, "lat_p95_ms": 220.0,
                           "batcher_stats": {}}}},
    "video_bench.json": {
        "date": "2026-08-18", "geometry": "180x320 -> x4",
        "basicvsr": {"ms_per_clip": 100.0, "frames_per_s": 150.0},
        "iconvsr": {"ms_per_clip": 120.0, "frames_per_s": 125.0},
        "edvr_m": {"ms_per_batch": 40.0, "frames_per_s": 100.0,
                   "windows": 4}},
    "detector_convergence.json": {
        "date": "2026-08-18", "backbone": "Resnet18", "image_size": 224,
        "iters": 1500, "bs": 24, "data": "synth",
        "loss_first10": [65.6, 50.1], "loss_curve_every50": [65.6, 5.5],
        "loss_final": 5.5,
        "eval_random_init": {"mean_iou": 0.002, "det_rate": 1.0,
                             "mean_landmark_err": 0.7},
        "eval_trained": {"mean_iou": 0.71, "det_rate": 0.88,
                         "mean_landmark_err": 0.016},
        "post_compile_steps_per_s": 70.0},
    "e2e_latency.json": {
        "date": "2026-08-18", "image": "x.jpg",
        "host_ms": {"total": 5.0},
        "device_onchip_ms": {},
        "e2e_ms_per_image": {"sequential_restores": 18.2,
                             "fused_bs2_restore": 15.4,
                             "batched_n8": 11.5},
        "process_batch_real_wall_ms_per_image": {
            "batched_chunk8": 50.0, "per_image": 200.0, "note": "n"}},
    "qat_distill_bench.json": {
        "date": "2026-08-18", "timing": "on-chip scan",
        "qat_step": {"config": "c", "overhead_pct": 12.0, "rows": [
            {"mode": "float", "bs": 16, "ms_per_step": 30.0,
             "imgs_per_sec": 530.0},
            {"mode": "qat", "bs": 16, "ms_per_step": 33.6,
             "imgs_per_sec": 470.0}]},
        "qat_vs_ptq": {"iters": 600, "bs": 8, "config": "c", "val": "v",
                       "float_psnr": 30.0, "ptq_int8_psnr": 29.0,
                       "qat_int8_psnr": 29.5, "qat_float_psnr": 29.9,
                       "qat_minus_ptq_db": 0.5, "float_arm_wall_s": 60.0,
                       "qat_arm_wall_s": 70.0},
        "distill_step": {"config": "c", "rows": [
            {"bs": 16, "ms_per_step": 90.0, "imgs_per_sec": 178.0}]}},
}


def test_echo_renders_all_artifact_schemas(tmp_path, monkeypatch, capsys):
    import bench

    # real measured artifacts (whatever the tree has) + synthesized ones
    # for the not-yet-measured queue outputs
    for f in os.listdir(REAL_ASSETS):
        if f.endswith(".json"):
            shutil.copy(os.path.join(REAL_ASSETS, f), tmp_path / f)
    for name, payload in SYNTH.items():
        with open(tmp_path / name, "w") as f:
            json.dump(payload, f)

    monkeypatch.setattr(bench, "ASSETS", str(tmp_path))
    bench.echo_artifacts()
    err = capsys.readouterr().err
    assert "artifact echo" not in err, err  # no per-section failures
    for token in ("TRAIN detector convergence", "VIDEO SR serving",
                  "SERVE micro-batching", "E2E process_batch wall",
                  "E2E /Vehicle_Resolution_GFPGAN/", "TRAIN QAT vs PTQ",
                  "TRAIN QAT step overhead", "TRAIN distill step"):
        assert token in err, f"missing {token!r} in tail:\n{err}"
