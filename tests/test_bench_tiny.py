"""Structural regression of bench.py's full headline flow (IRT_BENCH_TINY):
build → int8 gate → halo-4 seam gate → geometry sweep → ONE headline JSON
line. Protects the driver-scored artifact from flow bugs without a TPU.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_headline_flow():
    env = dict(os.environ, IRT_BENCH_TINY="1")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=1500,
                       env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    # driver contract (r3 regression: BENCH_r03.json parsed:null): the
    # FINAL stdout line must parse as the headline JSON — queued scripts'
    # own metric lines must never be what the driver tail-parses
    rec = json.loads(lines[-1])
    assert rec["unit"] == "tiles/sec/chip"
    assert rec["value"] > 0
    assert "vs_baseline" in rec
    heads = [ln for ln in lines if ln.startswith("{")]
    assert all(json.loads(h) == rec for h in heads), \
        f"all headline emissions must agree: {r.stdout!r}"
    # both gates ran and were reported
    assert "int8 PTQ vs bf16 PSNR" in r.stderr
    assert "halo-4 tiling gate" in r.stderr
    # the geometry sweep timed more than one (tile, halo, bs) point
    assert r.stderr.count("SRVGG x4 tile=") >= 2
    # tiny mode must not touch the live measurement record
    assert "NOT writing" not in r.stdout  # (tiny returns before artifacts)
