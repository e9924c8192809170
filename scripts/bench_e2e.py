#!/usr/bin/env python
"""End-to-end product latency: the /Vehicle_Resolution_GFPGAN/ pipeline
(detect → host crop/mask/pad → restore plate + car → perspective
paste-back) over the reference test_images, stage-split.

This is BASELINE config #3 and the reference's reason for its TRT +
TorchScript serving stack (api_plate_oto.py:404-489). Round-2 verdict:
components were benched separately but the composed pipeline had no
measured ms/image — this closes that.

Methodology (see docs/PERFORMANCE.md "timing"): the axon tunnel adds
40ms-1.3s RPC latency per dispatch, so wall-clock through the tunnel
measures the tunnel. Device stages (detector graph, GFPGAN restore) are
timed as ON-CHIP lax.scan loops of the exact jitted graphs the pipeline
calls; host stages (cv2 resize/mask/warp/paste — they run on the serving
host, no tunnel involved) are wall-clocked directly. The reported
per-image latency = host total + on-chip device total, i.e. what a
TPU-host-resident uvicorn worker sustains; the raw tunnel number is
printed alongside for transparency.

Modes reported:
  * bs=1 sequential (the reference's exact serving shape: plate and car
    restored in two separate calls — api_plate_oto.py:434-435)
  * fused bs=2 restore (plate+car in ONE GFPGAN batch — a TPU-side
    optimization the reference cannot do across two different engines)
  * batched throughput (N images in flight: detector bs=N, restorer bs=2N)

Writes docs/assets/e2e_latency.json; bench.py echoes the summary.
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import jax
import jax.numpy as jnp

from bench import onchip_ms
from image_restoration_tpu.serve.pipeline import (PlatePipeline,
                                                  resize_with_padding)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")
TEST_IMAGES = sorted(glob.glob(
    "/root/reference/Car_Plate-Restoration/test_images/*.jpg"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def host_ms(fn, repeats=50):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn()
    return (time.perf_counter() - t0) / repeats * 1e3


def main():
    if "--cpu" in sys.argv:
        # CPU sanity: shake out crashes in the exact code path before a
        # live-chip window is spent on it (the axon plugin overrides the
        # JAX_PLATFORMS env var, so force post-import)
        jax.config.update("jax_platforms", "cpu")
    log(f"devices: {jax.devices()}")
    # --host-io measures the reference-exact host-normalize path for
    # comparison with the default device-IO u8 graph
    pipe = PlatePipeline(dtype=jnp.bfloat16,
                         device_io="--host-io" not in sys.argv)
    img = cv2.imread(TEST_IMAGES[0])
    t = pipe.TARGET

    # ---- one full functional pass (correctness + the host stage pieces)
    wall0 = time.perf_counter()
    result = pipe.process(img)
    tunnel_wall_ms = (time.perf_counter() - wall0) * 1e3
    assert result["montage"].shape == (t, 6 * t, 3)
    assert result["pasted"].dtype == np.uint8
    quad = result["quad"]
    log(f"functional pass OK (detected={result['detected']}, "
        f"score={result['score']:.3f}); tunnel wall {tunnel_wall_ms:.0f} ms")

    # ---- host stages (no device involved)
    canvas = cv2.resize(img, (t, t), interpolation=cv2.INTER_LINEAR)
    ms_resize = host_ms(lambda: (
        cv2.resize(img, (t, t), interpolation=cv2.INTER_LINEAR),
        cv2.resize(img.astype(np.float32),
                   (pipe.detector.image_size, pipe.detector.image_size),
                   interpolation=cv2.INTER_LINEAR)))
    crop = pipe._crop_plate(canvas, quad)
    ms_crop = host_ms(lambda: (pipe._crop_plate(canvas, quad),
                               resize_with_padding(crop, (t, t)),
                               cv2.resize(crop, (t, t))))
    plate_restored = result["plate_restored"]
    car_restored = result["car_restored"]

    def paste_stage():
        # time the SHIPPED host post stage (warp + cv2.copyTo paste +
        # montage), not a re-implementation of it
        return pipe._finish_one(canvas, quad, result["score"],
                                result["detected"], crop, plate_restored,
                                car_restored)["montage"]

    ms_paste = host_ms(paste_stage)
    # normalize/uint8 conversions around the device calls — zero host
    # work with device_io (they run inside the restore graph)
    if pipe.device_io:
        ms_norm = 0.0
    else:
        x256 = cv2.resize(crop, (t, t)).astype(np.float32) / 255.0
        ms_norm = host_ms(lambda: ((x256 - 0.5) / 0.5,
                                   np.clip((x256 * 255), 0, 255).astype(
                                       np.uint8)))
    host_total = ms_resize + ms_crop + ms_paste + ms_norm

    # ---- device stages, on-chip
    det = pipe.detector
    dx1 = jnp.asarray(np.random.default_rng(0).random(
        (1, det.image_size, det.image_size, 3), np.float32) * 255)

    def det_apply(v, x):
        out = det._detect(v, x)
        return out[1]  # scores — scalar-ish fetch path

    ms_detect = onchip_ms(det_apply, det.variables, dx1, iters=20,
                          repeats=3)

    rest = pipe.plate_restorer
    # time the graph the pipeline actually dispatches: the device-IO u8
    # graph (norm + uint8 conversion on device) when device_io is on
    if pipe.device_io:
        def rest_fwd(p, x):
            return rest._fwd_u8(p, x)

        def rx_of(n):
            return jnp.asarray((np.random.default_rng(0).random(
                (n, t, t, 3)) * 255).astype(np.uint8))
    else:
        def rest_fwd(p, x):
            return rest._fwd(p, x) * 1e-6  # damp bf16 scan-carry drift

        def rx_of(n):
            return jnp.asarray(np.random.default_rng(0).random(
                (n, t, t, 3), np.float32))
    ms_restore1 = onchip_ms(rest_fwd, rest.variables["params"], rx_of(1),
                            iters=10, repeats=3)
    ms_restore2 = onchip_ms(rest_fwd, rest.variables["params"], rx_of(2),
                            iters=10, repeats=3)

    seq = host_total + ms_detect + 2 * ms_restore1
    fused = host_total + ms_detect + ms_restore2

    log(f"host: resize {ms_resize:.2f} + crop/mask {ms_crop:.2f} + "
        f"norm {ms_norm:.2f} + warp/paste/montage {ms_paste:.2f} "
        f"= {host_total:.2f} ms")
    log(f"device (on-chip): detect {ms_detect:.2f} ms, "
        f"restore 256² bs=1 {ms_restore1:.2f} ms, bs=2 {ms_restore2:.2f} ms")
    log(f"E2E /Vehicle_Resolution_GFPGAN/ per image: "
        f"{seq:.1f} ms (reference shape: 2 sequential restores) | "
        f"{fused:.1f} ms (fused bs=2 restore) — TPU-host resident")

    # ---- batched throughput mode
    N = 8
    dxN = jnp.asarray(np.random.default_rng(0).random(
        (N, det.image_size, det.image_size, 3), np.float32) * 255)
    ms_detect_N = onchip_ms(det_apply, det.variables, dxN, iters=20,
                            repeats=3)
    ms_restore_N = onchip_ms(rest_fwd, rest.variables["params"],
                             rx_of(2 * N), iters=5, repeats=3)
    batched_ms_per_img = (ms_detect_N + ms_restore_N) / N + host_total
    log(f"batched N={N}: detect {ms_detect_N:.2f} ms + restore bs={2 * N} "
        f"{ms_restore_N:.2f} ms → {batched_ms_per_img:.1f} ms/img "
        f"({1e3 / batched_ms_per_img:.1f} imgs/s incl. host stages "
        f"serialized; device-only {1e3 / ((ms_detect_N + ms_restore_N) / N):.1f}/s)")

    # ---- the REAL pipelined batch path (serve/pipeline.process_batch):
    # detector bs=N + ONE fused 2N restore dispatch per chunk (2 device
    # dispatches per chunk vs 3 per image), host stages thread-parallel,
    # paste/montage overlapped with the next chunk's device work. Wall-
    # clocked over real test images; through the axon tunnel the wall is
    # RPC-inflated for BOTH paths, so the per-image/batched wall ratio is
    # the meaningful figure here, and the TPU-host-resident latency is
    # bounded by the on-chip projection above.
    N_REAL = 32
    imgs = [cv2.imread(p) for p in TEST_IMAGES]
    imgs = (imgs * (N_REAL // len(imgs) + 1))[:N_REAL]
    pipe.process_batch(imgs[:8], chunk_size=8)  # warm both batch shapes
    t0 = time.perf_counter()
    res = pipe.process_batch(imgs, chunk_size=8)
    wall_batch = (time.perf_counter() - t0) / N_REAL * 1e3
    assert len(res) == N_REAL and res[0]["montage"].shape == (t, 6 * t, 3)
    t0 = time.perf_counter()
    for im in imgs[:4]:
        pipe.process(im)
    wall_seq = (time.perf_counter() - t0) / 4 * 1e3
    log(f"process_batch (REAL path, chunk=8): {wall_batch:.1f} ms/img wall "
        f"vs per-image process {wall_seq:.1f} ms/img wall "
        f"({wall_seq / wall_batch:.1f}x; dispatches/img 0.25 vs 3)")

    # ---- device-geometry path: mask/crop/resize/restores/warp/paste/
    # montage as ONE dispatch per chunk (serve/pipeline.py device_geometry,
    # ops/geometry.py). Host keeps only JPEG decode + the initial resizes.
    geo_pipe = PlatePipeline(detector=pipe.detector,
                             plate_restorer=pipe.plate_restorer,
                             car_restorer=pipe.car_restorer,
                             device_geometry=True)
    geo = {}
    try:
        if geo_pipe._geo_fused is None:
            geo_pipe._geo_fused = geo_pipe._build_geo_fused()
        fused_fn = geo_pipe._geo_fused
        N = 8
        canv8 = np.stack([cv2.resize(im, (t, t)) for im in imgs[:N]])
        quads8 = np.stack([res[i]["quad"] for i in range(N)]).astype(
            np.float32)
        pp = geo_pipe.plate_restorer.variables["params"]
        pc = geo_pipe.car_restorer.variables["params"]

        def geo_apply(params, quads):
            # data dependency via a negligible quad perturbation; the
            # canvas batch rides as a (tiny, 1.5 MB) argument via params
            pp_, pc_, canv_ = params
            mont, _ = fused_fn(pp_, pc_, canv_, quads)
            return jnp.mean(mont.astype(jnp.float32)) * 1e-6

        ms_geo_8 = onchip_ms(
            lambda params, q: geo_apply(params, q),
            (pp, pc, jnp.asarray(canv8)), jnp.asarray(quads8),
            iters=5, repeats=3)
        geo_e2e = (ms_detect_N + ms_geo_8) / N + ms_resize
        log(f"device-geometry fused dispatch bs={N}: {ms_geo_8:.2f} ms "
            f"(= restores + all geometry + montage) → "
            f"{geo_e2e:.2f} ms/img E2E (host keeps only the resizes)")

        geo_pipe.process_batch(imgs[:8], chunk_size=8)  # warm
        t0 = time.perf_counter()
        res_geo = geo_pipe.process_batch(imgs, chunk_size=8)
        wall_geo = (time.perf_counter() - t0) / N_REAL * 1e3
        assert res_geo[0]["montage"].shape == (t, 6 * t, 3)
        log(f"process_batch device-geometry wall: {wall_geo:.1f} ms/img "
            f"(host path {wall_batch:.1f}; 1 fused dispatch per chunk "
            f"after the detector)")
        # measured auto-selection (device_geometry="auto"): both paths
        # wall-timed on one warmed chunk, faster one locked in
        auto_pipe = PlatePipeline(detector=pipe.detector,
                                  plate_restorer=pipe.plate_restorer,
                                  car_restorer=pipe.car_restorer,
                                  device_geometry="auto")
        auto_pipe.process_batch(imgs[:8], chunk_size=8)
        auto = {"selected": "device" if auto_pipe.device_geometry
                else "host", **(auto_pipe.geo_auto_ms_per_image or {})}
        log(f"geometry auto-select: host {auto.get('host')} vs device "
            f"{auto.get('device')} ms/img wall → {auto['selected']}")

        geo = {"onchip_fused_ms_bs8": round(ms_geo_8, 3),
               "e2e_ms_per_image_bs8": round(geo_e2e, 2),
               "host_ms_remaining": round(ms_resize, 3),
               "process_batch_wall_ms_per_image": round(wall_geo, 2),
               "auto_select": auto,
               "note": "ONE dispatch per chunk after the detector: "
                       "mask/crop/resize/restore×2/warp/paste/montage on "
                       "device (ops/geometry.py, shared-grid 6-channel "
                       "warp); equivalence to the cv2 host stages "
                       "regression-tested"}
    except Exception as e:
        # leave the key ABSENT on failure: bench.py's queue skip-check
        # tests key presence, so an error marker here would block
        # re-measurement forever
        log(f"device-geometry section failed (will re-measure next "
            f"run): {type(e).__name__}: {e}")
        geo = None

    out = {
        "date": time.strftime("%Y-%m-%d"),
        "image": os.path.basename(TEST_IMAGES[0]),
        **({"device_geometry": geo} if geo else {}),
        # which restore graph the device numbers were measured on:
        # device_io=True = restore_batch_u8 (uint8 wire, on-device
        # norm/convert); False = the host-normalize float graph
        "device_io": bool(pipe.device_io),
        "host_ms": {"resize": round(ms_resize, 3),
                    "crop_mask_pad": round(ms_crop, 3),
                    "normalize": round(ms_norm, 3),
                    "warp_paste_montage": round(ms_paste, 3),
                    "total": round(host_total, 3)},
        "device_onchip_ms": {"detect_bs1": round(ms_detect, 3),
                             "restore256_bs1": round(ms_restore1, 3),
                             "restore256_bs2": round(ms_restore2, 3),
                             "detect_bs8": round(ms_detect_N, 3),
                             "restore256_bs16": round(ms_restore_N, 3)},
        "e2e_ms_per_image": {
            "sequential_restores": round(seq, 2),
            "fused_bs2_restore": round(fused, 2),
            "batched_n8": round(batched_ms_per_img, 2)},
        "process_batch_real_wall_ms_per_image": {
            "batched_chunk8": round(wall_batch, 2),
            "per_image": round(wall_seq, 2),
            "note": "wall-clock of the implemented process_batch through "
                    "the axon tunnel (RPC-inflated for both paths; the "
                    "ratio is the signal — 2 dispatches/chunk vs 3/image)"},
        "tunnel_wall_ms_full_pass": round(tunnel_wall_ms, 1),
        "note": "host+on-chip split; per-image = host total + on-chip "
                "device total (TPU-host-resident serving). Tunnel wall "
                "is the axon RPC artifact, not the product latency.",
    }
    if jax.devices()[0].platform != "tpu":
        log("non-TPU backend — NOT writing e2e_latency.json (sanity run; "
            "the artifact carries chip-measured numbers only)")
        return
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, "e2e_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
