#!/usr/bin/env python
"""Perf exploration on the real chip: halo × batch sweep for the int8
SRVGG serving path + real-image PSNR gates (tiled vs full restore).

Writes one JSON line per measurement to stderr-readable stdout; the
production bench.py picks its defaults from what wins here.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..")))

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.archs import build_network
from image_restoration_tpu.ops.packed_inference import (pack_srvgg_params,
                                                        packed_srvgg_forward)
from image_restoration_tpu.ops.quantized_inference import (
    calibrate_srvgg_act_scales, quantize_srvgg_params,
    quantized_srvgg_forward)

NUM_CONV = 32
TILE = 512


def onchip_ms(apply_fn, params, x, iters=20):
    @jax.jit
    def loop(params, x):
        def step(carry, _):
            y = apply_fn(params, x + carry)
            return jnp.mean(y).astype(x.dtype), None
        c, _ = jax.lax.scan(step, jnp.zeros((), x.dtype), None, length=iters)
        return c

    float(loop(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(loop(params, x))
        assert np.isfinite(s)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def load_real_tiles(size, n):
    """Real content tiles from the reference test images (fallback:
    synthetic)."""
    import cv2
    import glob
    paths = sorted(glob.glob(
        "/root/reference/Car_Plate-Restoration/test_images/*.jpg"))
    rng = np.random.default_rng(0)
    if not paths:
        return rng.random((n, size, size, 3)).astype(np.float32)
    tiles = []
    while len(tiles) < n:
        for p in paths:
            img = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
            ih, iw = img.shape[:2]
            if ih < size or iw < size:
                img = cv2.resize(img, (max(size, iw), max(size, ih)))
                ih, iw = img.shape[:2]
            y = rng.integers(0, ih - size + 1)
            x = rng.integers(0, iw - size + 1)
            tiles.append(img[y:y + size, x:x + size])
            if len(tiles) >= n:
                break
    return np.stack(tiles)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--halos", default="16,8,4")
    ap.add_argument("--batches", default="4,8,12")
    ap.add_argument("--quality", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    net = build_network(dict(type="SRVGGNetCompact", num_feat=64,
                             num_conv=NUM_CONV, upscale=4,
                             dtype=jnp.bfloat16))
    x1 = jnp.asarray(rng.random((1, 128, 128, 3), np.float32), jnp.bfloat16)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x1)
    packed = pack_srvgg_params(variables["params"], NUM_CONV)

    calib = jnp.asarray(load_real_tiles(128, 2))
    scales = jax.device_get(jax.jit(
        lambda p, x: calibrate_srvgg_act_scales(p, x, NUM_CONV))(
        jax.tree.map(lambda a: a.astype(jnp.float32),
                     variables["params"]), calib))
    qparams = quantize_srvgg_params(
        jax.device_get(variables["params"]), [float(s) for s in scales],
        NUM_CONV, pack=2)

    def apply_int8(p, x):
        return quantized_srvgg_forward(p, x.astype(jnp.float32), NUM_CONV,
                                       4, pack=2)

    for halo in [int(h) for h in args.halos.split(",")]:
        size = TILE + 2 * halo
        for bs in [int(b) for b in args.batches.split(",")]:
            x = jnp.asarray(rng.random((bs, size, size, 3), np.float32),
                            jnp.bfloat16)
            try:
                ms = onchip_ms(apply_int8, qparams, x)
            except Exception as e:
                print(json.dumps({"halo": halo, "bs": bs,
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({"halo": halo, "bs": bs, "ms": round(ms, 2),
                              "tiles_per_s": round(bs / ms * 1e3, 1)}),
                  flush=True)

    if args.quality:
        # tiled-with-halo restore vs FULL-image bf16 restore on real tiles
        from image_restoration_tpu.parallel.tiling import tiled_apply
        full = np.asarray(load_real_tiles(1024, 2))

        def apply_packed(p, x):
            return packed_srvgg_forward(p, x, NUM_CONV, 4)

        ref_fn = jax.jit(lambda p, x: packed_srvgg_forward(
            jax.tree.map(lambda a: a, p), x, NUM_CONV, 4))
        # full-image bf16 reference (1024² fits)
        want = np.asarray(ref_fn(
            packed, jnp.asarray(full, jnp.bfloat16))).astype(np.float32)
        for halo in [int(h) for h in args.halos.split(",")]:
            got = np.asarray(tiled_apply(
                lambda x: apply_int8(qparams, x), jnp.asarray(full),
                tile=TILE, halo=halo, scale=4)).astype(np.float32)
            mse = float(np.mean((got - want) ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            print(json.dumps({"quality_halo": halo,
                              "psnr_vs_full_bf16": round(psnr, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
