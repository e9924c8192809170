"""bench.py opportunistic queued-measurements phase.

The driver runs `python bench.py` on the real chip at end of round; the
queued phase must (a) run only the jobs whose docs/assets artifact is
missing, (b) run them in chip_queue.sh priority order, (c) no-op once
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


def _fake_job(name, calls, artifact_dir, artifact_name, payload):
    mod = types.ModuleType(name)

    def main():
        calls.append((name, list(sys.argv)))
        with open(os.path.join(artifact_dir, artifact_name), "w") as f:
            json.dump(payload, f)

    mod.main = main
    return mod


def test_runs_missing_jobs_in_priority_order(bench_mod, tmp_path,
                                             monkeypatch):
    calls = []
    for script, artifact, payload in [
            ("bench_microbatch", "microbatch_bench.json",
             {"date": "t", "clients": 32, "speedup": 2.0,
              "results": {"per_request": {"imgs_per_s": 100.0,
                                          "lat_p50_ms": 1, "lat_p95_ms": 2},
                          "microbatch": {"imgs_per_s": 200.0,
                                         "lat_p50_ms": 1,
                                         "lat_p95_ms": 2}}}),
            ("bench_e2e", "e2e_latency.json",
             {"process_batch_real_wall_ms_per_image": {},
              "device_geometry": {}}),
            ("bench_video", "video_bench.json", {"date": "t"}),
            ("bench_detector_convergence", "detector_convergence.json",
             {"date": "t"}),
            ("bench_qat_distill", "qat_distill_bench.json",
             {"date": "t"})]:
        monkeypatch.setitem(sys.modules, script, _fake_job(
            script, calls, str(tmp_path), artifact, payload))

    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ["bench_microbatch", "bench_e2e",
                                     "bench_video",
                                     "bench_detector_convergence",
                                     "bench_qat_distill"]
    # sys.argv was sanitized for the argparse-using scripts
    assert all(len(argv) == 1 for _, argv in calls)
    assert sys.argv  # restored

    # second invocation: every artifact now present -> full no-op
    calls.clear()
    bench_mod.run_queued_measurements()
    assert calls == []


def test_partial_artifacts_skip_only_measured(bench_mod, tmp_path,
                                              monkeypatch):
    # microbatch + detector measured; e2e exists but PRE-process_batch
    # (missing the field); video missing -> e2e and video must run
    (tmp_path / "microbatch_bench.json").write_text("{}")
    (tmp_path / "detector_convergence.json").write_text("{}")
    (tmp_path / "qat_distill_bench.json").write_text("{}")
    (tmp_path / "e2e_latency.json").write_text(
        json.dumps({"e2e_ms_per_image": {}}))
    calls = []
    for script, artifact in [("bench_microbatch", "microbatch_bench.json"),
                             ("bench_e2e", "e2e_latency.json"),
                             ("bench_video", "video_bench.json"),
                             ("bench_detector_convergence",
                              "detector_convergence.json")]:
        monkeypatch.setitem(sys.modules, script, _fake_job(
            script, calls, str(tmp_path), artifact,
            {"process_batch_real_wall_ms_per_image": {},
             "device_geometry": {}}))
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ["bench_e2e", "bench_video"]


def test_corrupt_artifact_counts_as_unmeasured(bench_mod, tmp_path,
                                               monkeypatch):
    """A truncated artifact (e.g. a prior run's alarm fired mid-write)
    must be re-measured, not treated as done."""
    (tmp_path / "microbatch_bench.json").write_text("{}")
    (tmp_path / "e2e_latency.json").write_text(
        json.dumps({"process_batch_real_wall_ms_per_image": {},
                    "device_geometry": {}}))
    (tmp_path / "detector_convergence.json").write_text("{}")
    (tmp_path / "qat_distill_bench.json").write_text("{}")
    (tmp_path / "video_bench.json").write_text('{"date": "t", "basi')
    calls = []
    monkeypatch.setitem(sys.modules, "bench_video", _fake_job(
        "bench_video", calls, str(tmp_path), "video_bench.json",
        {"date": "t"}))
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ["bench_video"]


def test_noop_off_tpu(bench_mod, tmp_path, monkeypatch):
    dev = types.SimpleNamespace(platform="cpu")
    monkeypatch.setattr(bench_mod.jax, "devices", lambda *a: [dev])
    boom = types.ModuleType("bench_microbatch")
    boom.main = lambda: (_ for _ in ()).throw(AssertionError("ran on cpu"))
    monkeypatch.setitem(sys.modules, "bench_microbatch", boom)
    bench_mod.run_queued_measurements()  # must not raise


def test_job_failure_does_not_abort_queue(bench_mod, tmp_path, monkeypatch):
    calls = []
    bad = types.ModuleType("bench_microbatch")
    bad.main = lambda: (_ for _ in ()).throw(RuntimeError("tunnel died"))
    monkeypatch.setitem(sys.modules, "bench_microbatch", bad)
    monkeypatch.setitem(sys.modules, "bench_e2e", _fake_job(
        "bench_e2e", calls, str(tmp_path), "e2e_latency.json",
        {"process_batch_real_wall_ms_per_image": {},
         "device_geometry": {}}))
    monkeypatch.setitem(sys.modules, "bench_video", _fake_job(
        "bench_video", calls, str(tmp_path), "video_bench.json",
        {"date": "t"}))
    monkeypatch.setitem(sys.modules, "bench_detector_convergence",
                        _fake_job("bench_detector_convergence", calls,
                                  str(tmp_path),
                                  "detector_convergence.json",
                                  {"date": "t"}))
    monkeypatch.setitem(sys.modules, "bench_qat_distill",
                        _fake_job("bench_qat_distill", calls,
                                  str(tmp_path),
                                  "qat_distill_bench.json",
                                  {"date": "t"}))
    bench_mod.run_queued_measurements()
    assert [c[0] for c in calls] == ["bench_e2e", "bench_video",
                                     "bench_detector_convergence",
                                     "bench_qat_distill"]
