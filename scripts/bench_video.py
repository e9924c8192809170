#!/usr/bin/env python
"""Video-SR serving throughput: BasicVSR / IconVSR (recurrent) and EDVR
(sliding-window) frames/s on the real chip.

The reference serves video SR through the same torch archs
(basicsr/archs/basicvsr_arch.py, edvr_arch.py) it trains; it publishes no
throughput numbers. This measures the TPU serving shapes:

  * BasicVSR/IconVSR: one clip forward (N=1, T frames, 180x320, REDS
    eval geometry) -> x4. The time recurrences are nn.scan'd, so compile
    time is O(1) in T and the whole clip is ONE dispatch.
  * EDVR-M (5-frame window, w/ TSA): batched sliding windows
    (N windows, 5, 180, 320) -> one center frame each.

Timing per bench.py conventions: on-chip lax.scan with data dependency,
params/inputs as jit arguments, min over repeats. Speed-only (random
weights — parity is covered by the imported-weight goldens); outputs
damped into the scan carry to keep bf16 finite.

Writes docs/assets/video_bench.json; bench.py echoes it if present.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import guard_backend, onchip_ms, log
from image_restoration_tpu.archs import build_network

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")

H, W = 180, 320  # REDS eval geometry (x4 -> 720x1280)


def bench_recurrent(name, T=15, dtype=jnp.bfloat16, iters=5,
                    dcn_max_offset=None, flow_max_offset=None):
    cfg = dict(type=name, num_feat=64, num_block=30 if
               name == "BasicVSR" else 15, dtype=dtype)
    if dcn_max_offset is not None:
        cfg["dcn_max_offset"] = dcn_max_offset
    if flow_max_offset is not None:
        cfg["flow_max_offset"] = flow_max_offset
    net = build_network(cfg)
    x = jnp.zeros((1, T, H, W, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)["params"]
    clip = jnp.asarray(np.random.default_rng(0).random(
        (1, T, H, W, 3), np.float32))

    def fwd(p, xx):
        return net.apply({"params": p}, xx) * 1e-3  # damp the scan carry

    ms = onchip_ms(fwd, params, clip, iters=iters, repeats=3)
    fps = T / (ms / 1e3)
    log(f"{name} T={T} {H}x{W} x4 ({dtype.__name__}): {ms:.1f} ms/clip "
        f"= {fps:.1f} frames/s")
    return {"ms_per_clip": round(ms, 2), "frames_per_s": round(fps, 1),
            "T": T}


def bench_edvr(n_windows=4, dtype=jnp.bfloat16, iters=5,
               dcn_max_offset=None):
    # EDVR-M: 64 feat, 5 frames, 10 front + 10 back blocks, TSA
    net = build_network(dict(type="EDVR", num_feat=64, num_frame=5,
                             deformable_groups=8, num_extract_block=5,
                             num_reconstruct_block=10, with_tsa=True,
                             dcn_max_offset=dcn_max_offset, dtype=dtype))
    x = jnp.zeros((n_windows, 5, H, W, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)["params"]
    wins = jnp.asarray(np.random.default_rng(0).random(
        (n_windows, 5, H, W, 3), np.float32))

    def fwd(p, xx):
        return net.apply({"params": p}, xx) * 1e-3

    ms = onchip_ms(fwd, params, wins, iters=iters, repeats=3)
    fps = n_windows / (ms / 1e3)  # one output frame per window
    log(f"EDVR-M 5x{H}x{W} x4 bs={n_windows} ({dtype.__name__}): "
        f"{ms:.1f} ms = {fps:.1f} frames/s")
    return {"ms_per_batch": round(ms, 2), "frames_per_s": round(fps, 1),
            "windows": n_windows}


def bench_duf(n_windows=4, dtype=jnp.bfloat16, iters=5):
    # DUF-16 (ref duf_arch.py:189-283): 7-frame window -> center x4 via
    # dynamic upsampling filters. Input is the LR clip directly.
    net = build_network(dict(type="DUF", scale=4, num_layer=16,
                             dtype=dtype))
    x = jnp.zeros((n_windows, 7, H, W, 3), jnp.float32)
    # DUF carries BatchNorm batch_stats: serve with the full variables
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    wins = jnp.asarray(np.random.default_rng(0).random(
        (n_windows, 7, H, W, 3), np.float32))

    def fwd(p, xx):
        return net.apply(p, xx) * 1e-3
    params = variables

    ms = onchip_ms(fwd, params, wins, iters=iters, repeats=3)
    fps = n_windows / (ms / 1e3)
    log(f"DUF-16 7x{H}x{W} x4 bs={n_windows} ({dtype.__name__}): "
        f"{ms:.1f} ms = {fps:.1f} frames/s")
    return {"ms_per_batch": round(ms, 2), "frames_per_s": round(fps, 1),
            "windows": n_windows}


def bench_toflow(n_windows=4, dtype=jnp.bfloat16, iters=5):
    # TOFlow (ref tof_arch.py:94-172): 7 bicubic-upscaled frames ->
    # center frame; serving cost is at the x4 HR resolution
    net = build_network(dict(type="TOFlow", dtype=dtype))
    hh, ww_ = H * 4, W * 4
    x = jnp.zeros((n_windows, 7, hh, ww_, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)["params"]
    wins = jnp.asarray(np.random.default_rng(0).random(
        (n_windows, 7, hh, ww_, 3), np.float32))

    def fwd(p, xx):
        return net.apply({"params": p}, xx) * 1e-3

    ms = onchip_ms(fwd, params, wins, iters=iters, repeats=3)
    fps = n_windows / (ms / 1e3)
    log(f"TOFlow 7x{hh}x{ww_} (HR in) bs={n_windows} ({dtype.__name__}): "
        f"{ms:.1f} ms = {fps:.1f} frames/s")
    return {"ms_per_batch": round(ms, 2), "frames_per_s": round(fps, 1),
            "windows": n_windows}


def main():
    tiny = "--tiny" in sys.argv  # CPU sanity: shake out crashes before
    if tiny:                     # spending a live-chip window on this
        jax.config.update("jax_platforms", "cpu")
        global H, W
        H, W = 64, 96  # SpyNet's 5-level pyramid needs >=64
    # --only=k1,k2: measure just those rows and MERGE into the existing
    # artifact (new rows land without re-paying the slow exact-gather
    # rows — the chip-time budget reason this flag exists)
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    guard_backend()
    log(f"devices: {jax.devices()}")
    out = {"date": time.strftime("%Y-%m-%d"),
           "geometry": f"{H}x{W} -> x4 (REDS eval shape)",
           "note": "on-chip scan timing, random weights (speed only; "
                   "parity via imported-weight goldens)"}
    T = 3 if tiny else 15
    it = 2 if tiny else 5
    nw = 1 if tiny else 4
    rows = {
        "basicvsr": lambda: bench_recurrent("BasicVSR", T=T, iters=it),
        "iconvsr": lambda: bench_recurrent("IconVSR", T=T, iters=it),
        "edvr_m": lambda: bench_edvr(n_windows=nw, iters=it),
        # the windowed-DCN serving rows (dcn_max_offset=16 — the
        # gather-free bounded-offset path; exactness at the bound is
        # golden-tested, the bound itself probed at imported weights in
        # test_edvr_golden.py)
        "iconvsr_dcn_w16": lambda: bench_recurrent(
            "IconVSR", T=T, iters=it, dcn_max_offset=16),
        "edvr_m_dcn_w16": lambda: bench_edvr(
            n_windows=nw, iters=it, dcn_max_offset=16),
        # half-radius rows: window 52 -> 36 wide at bh=16 (~1.9x less
        # row-stage work); exact whenever |offset| <= 8 — re-gate per
        # trained checkpoint before serving at this radius
        # (docs/PERFORMANCE.md)
        "iconvsr_dcn_w8": lambda: bench_recurrent(
            "IconVSR", T=T, iters=it, dcn_max_offset=8),
        "edvr_m_dcn_w8": lambda: bench_edvr(
            n_windows=nw, iters=it, dcn_max_offset=8),
        "basicvsr_flow_w32": lambda: bench_recurrent(
            "BasicVSR", T=T, iters=it, flow_max_offset=32),
        "iconvsr_dcn_w16_flow_w32": lambda: bench_recurrent(
            "IconVSR", T=T, iters=it, dcn_max_offset=16,
            flow_max_offset=32),
        "duf_16": lambda: bench_duf(n_windows=nw, iters=it),
        "toflow": lambda: bench_toflow(n_windows=1 if tiny else 2,
                                       iters=it),
    }
    if only:
        unknown = only - set(rows)
        if unknown:
            raise SystemExit(f"--only: unknown rows {sorted(unknown)}; "
                             f"valid: {sorted(rows)}")
    path = os.path.join(ASSETS, "video_bench.json")
    for key, fn in rows.items():
        if only and key not in only:
            continue
        out[key] = fn()
    if tiny:
        log("tiny CPU sanity only — NOT writing video_bench.json")
        return
    if only and os.path.isfile(path):
        try:
            old = json.load(open(path))
            old.update(out)
            old["date"] = out["date"]
            out = old
        except Exception as e:
            log(f"merge with existing artifact failed ({e!r}); "
                f"writing measured rows only")
    os.makedirs(ASSETS, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    if "basicvsr" in out:
        print(json.dumps({"metric": "basicvsr_frames_per_s",
                          "value": out["basicvsr"]["frames_per_s"],
                          "unit": "180x320_x4_frames/s"}), flush=True)


if __name__ == "__main__":
    main()
