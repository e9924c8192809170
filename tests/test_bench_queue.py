"""bench.py opportunistic queued-measurements phase.

The driver runs `python bench.py` on the real chip at end of round; the
queued phase must (a) run only the jobs whose docs/assets artifact is
missing its r4 marker field (dot-pathed markers re-queue a measurement
when its schema upgrades — e.g. `pipeline_depth` marks the pipelined
dispatcher, `device_geometry.auto_select` the measured host/device
selection), (b) run them in chip_queue.sh priority order, (c) no-op once
everything is measured, (d) never run off-TPU. Tested hermetically with
fake job modules and a temp ASSETS dir.
"""

import json
import os
import sys
import types

import pytest


@pytest.fixture
def bench_mod(tmp_path, monkeypatch):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.syspath_prepend(repo)
    import bench
    monkeypatch.setattr(bench, "ASSETS", str(tmp_path))
    # pretend we're on a TPU backend
    dev = types.SimpleNamespace(platform="tpu")
    monkeypatch.setattr(bench.jax, "devices", lambda *a: [dev])
    return bench


# every queued job with its artifact and a payload carrying the marker
# fields bench.py tests for "already measured" (markers must be TRUTHY —
# has() treats empty dicts as unmeasured)
JOBS = [
    ("bench_distill_e2e", "distill_e2e.json",
     {"date": "t", "complete": True}),
    ("bench_video", "video_bench.json",
     {"date": "t", "edvr_m_dcn_w16": {"frames_per_s": 1.0},
      "basicvsr_flow_w32": {"frames_per_s": 1.0},
      "duf_16": {"frames_per_s": 1.0},
      "toflow": {"frames_per_s": 1.0}}),
    ("bench_microbatch", "microbatch_bench.json",
     {"date": "t", "clients": 32, "speedup": 2.0, "pipeline_depth": 3,
      "auto": {"selected": "per_request",
               "calibration": {"speedup": 0.9}},
      "results": {"per_request": {"imgs_per_s": 100.0,
                                  "lat_p50_ms": 1, "lat_p95_ms": 2},
                  "microbatch": {"imgs_per_s": 200.0,
                                 "lat_p50_ms": 1, "lat_p95_ms": 2}}}),
    ("bench_e2e", "e2e_latency.json",
     {"process_batch_real_wall_ms_per_image": {"host": 1.0},
      "device_geometry": {"auto_select": {"selected": "host"}}}),
    ("bench_detector_convergence", "detector_convergence.json",
     {"date": "t"}),
    ("bench_qat_distill", "qat_distill_bench.json",
     {"date": "t", "qat4_vs_ptq4": {"qat_minus_ptq_db": 0.1},
      "qat2_vs_ptq2": {"qat_minus_ptq_db": 0.1}}),
    ("bench_gan_ablation", "gan_ablation.json",
     {"date": "t", "arm_gan": {"psnr": 1.0}, "arm_l1": {"psnr": 1.0}}),
    ("bench_dcn", "dcn_bench.json",
     {"date": "t", "bf16": {"L1_180x320": {"current": 1.0}}}),
]
ORDER = [j[0] for j in JOBS]


def _fake_job(name, calls, artifact_dir, artifact_name, payload):
    mod = types.ModuleType(name)

    def main():
        calls.append((name, list(sys.argv)))
        with open(os.path.join(artifact_dir, artifact_name), "w") as f:
            json.dump(payload, f)

    mod.main = main
    return mod


def _install_fakes(monkeypatch, tmp_path, calls, skip=()):
    for script, artifact, payload in JOBS:
        if script in skip:
            continue
        monkeypatch.setitem(sys.modules, script, _fake_job(
            script, calls, str(tmp_path), artifact, payload))


def test_runs_missing_jobs_in_priority_order(bench_mod, tmp_path,
                                             monkeypatch):
    calls = []
    _install_fakes(monkeypatch, tmp_path, calls)
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ORDER
    # sys.argv was sanitized for the argparse-using scripts
    assert all(len(argv) == 1 for _, argv in calls)
    assert sys.argv  # restored

    # second invocation: every artifact now carries its marker -> no-op
    calls.clear()
    bench_mod.run_queued_measurements()
    assert calls == []


def test_marker_fields_requeue_stale_artifacts(bench_mod, tmp_path,
                                               monkeypatch):
    """Pre-r4 artifacts (no pipeline_depth / no device_geometry.
    auto_select / no qat4_vs_ptq4) and an incomplete distill artifact
    must re-run; artifacts WITH their markers skip."""
    # measured & current: video, detector, gan
    (tmp_path / "video_bench.json").write_text(json.dumps(
        {"date": "t", "edvr_m_dcn_w16": {"frames_per_s": 1.0},
         "basicvsr_flow_w32": {"frames_per_s": 1.0},
         "duf_16": {"frames_per_s": 1.0},
         "toflow": {"frames_per_s": 1.0}}))
    (tmp_path / "detector_convergence.json").write_text(
        json.dumps({"date": "t"}))
    (tmp_path / "gan_ablation.json").write_text(json.dumps(
        {"arm_gan": {"psnr": 1.0}, "arm_l1": {"psnr": 1.0}}))
    # stale r3 shapes: serialized-dispatch microbatch, pre-auto-select
    # e2e, int8-only qat; distill mid-run (complete: false)
    (tmp_path / "microbatch_bench.json").write_text(
        json.dumps({"date": "t", "speedup": 0.547}))
    (tmp_path / "e2e_latency.json").write_text(json.dumps(
        {"process_batch_real_wall_ms_per_image": {"host": 1.0},
         "device_geometry": {"onchip_fused_ms_bs8": 1.0}}))
    (tmp_path / "qat_distill_bench.json").write_text(
        json.dumps({"date": "t", "qat_vs_ptq": {"qat_minus_ptq_db": 0}}))
    (tmp_path / "distill_e2e.json").write_text(
        json.dumps({"date": "t", "complete": False}))
    calls = []
    _install_fakes(monkeypatch, tmp_path, calls)
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ["bench_distill_e2e",
                                     "bench_microbatch", "bench_e2e",
                                     "bench_qat_distill", "bench_dcn"]


def test_corrupt_artifact_counts_as_unmeasured(bench_mod, tmp_path,
                                               monkeypatch):
    """A truncated artifact (e.g. a prior run's alarm fired mid-write)
    must be re-measured, not treated as done."""
    for script, artifact, payload in JOBS:
        if script == "bench_video":
            (tmp_path / artifact).write_text('{"date": "t", "basi')
        else:
            (tmp_path / artifact).write_text(json.dumps(payload))
    calls = []
    _install_fakes(monkeypatch, tmp_path, calls)
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ["bench_video"]


def test_headline_reemitted_after_every_job(bench_mod, tmp_path,
                                            monkeypatch, capsys):
    """A queue killed mid-run (driver timeout, tunnel-hang alarm) must
    still leave a parseable headline as the last stdout line — so the
    headline is re-printed after EVERY job, not only at the end."""
    calls = []
    _install_fakes(monkeypatch, tmp_path, calls)
    headline = {"metric": "m", "value": 1.0, "unit": "u",
                "vs_baseline": 1.0}
    bench_mod.run_queued_measurements(headline=headline)
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]

    def is_headline(ln):
        try:
            return json.loads(ln) == headline
        except ValueError:
            return False  # table-regen/log prints on stdout

    # once after every job + once after the table regen, and LAST
    assert sum(map(is_headline, lines)) == len(JOBS) + 1
    assert is_headline(lines[-1])


def test_noop_off_tpu(bench_mod, tmp_path, monkeypatch):
    dev = types.SimpleNamespace(platform="cpu")
    monkeypatch.setattr(bench_mod.jax, "devices", lambda *a: [dev])
    for script, _, _ in JOBS:
        boom = types.ModuleType(script)
        boom.main = lambda: (_ for _ in ()).throw(
            AssertionError("ran on cpu"))
        monkeypatch.setitem(sys.modules, script, boom)
    bench_mod.run_queued_measurements()  # must not raise


def test_job_failure_does_not_abort_queue(bench_mod, tmp_path, monkeypatch):
    calls = []
    bad = types.ModuleType("bench_distill_e2e")
    bad.main = lambda: (_ for _ in ()).throw(RuntimeError("tunnel died"))
    monkeypatch.setitem(sys.modules, "bench_distill_e2e", bad)
    _install_fakes(monkeypatch, tmp_path, calls, skip=("bench_distill_e2e",))
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ORDER[1:]
