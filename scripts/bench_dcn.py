#!/usr/bin/env python
"""Modulated deform-conv (DCNv2) kernel study on the real chip.

The r4 video-SR bench measured EDVR-M at 0.5 frames/s and IconVSR at
1.5 — 25-75× below BasicVSR (37.8), which differs mainly by NOT using
DCN. The reference runs DCN as a 1.7k-line CUDA im2col kernel
(Car_Plate-Restoration/basicsr/ops/dcn/src/deform_conv_cuda_kernel.cu);
ours is the gather+einsum form (ops/deform_conv.py). This measures where
its time goes at the real EDVR-M PCD pyramid shapes and races layout
variants so the serving op can adopt the fastest parity-exact form:

  current    — ops.deform_conv.modulated_deform_conv as shipped
               (spatial-minor, 4 corner gathers on axis -1)
  windowed_R16 — the gather-free bounded-offset path (max_offset=16):
               per-block separable one-hot matmuls, exact for
               |offset| <= 16 (ops/deform_conv.py _mdc_windowed)
  fused4     — ONE take_along_axis for all 4 bilinear corners (packs
               the corner axis into the gather index vector; 1 big
               gather instead of 4)
  chan_minor — channels-minor rows: x as (n·g, H·W, cpg), gather whole
               rows along the second-minor axis (each tap reads one
               contiguous cpg vector)
  onehot_mxu — gather as one-hot matmul on the MXU (FLOP-heavy but
               gather-free; only viable at the small pyramid levels)
  conv_ref   — a plain 3×3 convolution at the same shape: the roofline
               anchor a perfect DCN would approach

Timing per bench.py conventions (on-chip lax.scan, jit arguments only,
min of repeats). Parity of every variant vs `current` is asserted
≤1e-4 before anything is timed. Writes docs/assets/dcn_bench.json on
real TPU only; --tiny is the forced-CPU structural sanity mode.
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

ASSETS = os.path.join(REPO, "docs", "assets")


# ------------------------------------------------------------- variants
# All variants share the shipped op's semantics: torch DCNv2 channel
# order, zero padding outside the map, bilinear taps masked to the map.

def _grid(x, offset, kh, kw, stride, padding, dilation, g):
    n, h, w, cin = x.shape
    _, ho, wo, _ = offset.shape[0], *offset.shape[1:3], None
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    k = kh * kw
    oy = jnp.arange(ho, dtype=x.dtype) * stride - padding
    ox = jnp.arange(wo, dtype=x.dtype) * stride - padding
    ky = jnp.repeat(jnp.arange(kh, dtype=x.dtype) * dilation, kw)
    kx = jnp.tile(jnp.arange(kw, dtype=x.dtype) * dilation, kh)
    base_y = ky[:, None, None] + oy[None, :, None]
    base_x = kx[:, None, None] + ox[None, None, :]
    off = offset.reshape(n, ho, wo, g, k, 2)
    off = jnp.transpose(off, (0, 3, 4, 5, 1, 2))
    sy = base_y[None, None] + off[:, :, :, 0]
    sx = base_x[None, None] + off[:, :, :, 1]
    return sy, sx, ho, wo, k


def dcn_fused4(x, offset, mask, weight, bias=None, stride=1, padding=1,
               dilation=1, deformable_groups=1):
    """One gather for all 4 bilinear corners (corner axis folded into the
    gather vector); otherwise identical math to the shipped op."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    cpg = cin // g
    sy, sx, ho, wo, k = _grid(x, offset, kh, kw, stride, padding,
                              dilation, g)
    L = ho * wo
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0).reshape(n, g, 1, 1, k, L)
    wx = (sx - x0).reshape(n, g, 1, 1, k, L)

    xt = jnp.transpose(x.reshape(n, h * w, g, cpg), (0, 2, 3, 1))

    # corner axis: (4, n, g, K, Ho, Wo) — (y0x0, y0x1, y1x0, y1x1)
    ys = jnp.stack([y0, y0, y0 + 1, y0 + 1])
    xs = jnp.stack([x0, x0 + 1, x0, x0 + 1])
    inside = ((ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1))
    yc = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(xs, 0, w - 1).astype(jnp.int32)
    idx = (yc * w + xc)                        # (4, n, g, K, Ho, Wo)
    idx = jnp.transpose(idx, (1, 2, 0, 3, 4, 5)).reshape(n, g, 1,
                                                         4 * k * L)
    vals = jnp.take_along_axis(xt, idx, axis=3)
    vals = vals.reshape(n, g, cpg, 4, k, L)
    vals = vals * jnp.transpose(inside, (1, 2, 0, 3, 4, 5)).reshape(
        n, g, 1, 4, k, L).astype(x.dtype)
    samples = (vals[:, :, :, 0] * (1 - wy[:, :, :, 0]) * (1 - wx[:, :, :, 0])
               + vals[:, :, :, 1] * (1 - wy[:, :, :, 0]) * wx[:, :, :, 0]
               + vals[:, :, :, 2] * wy[:, :, :, 0] * (1 - wx[:, :, :, 0])
               + vals[:, :, :, 3] * wy[:, :, :, 0] * wx[:, :, :, 0])
    if mask is not None:
        m = jnp.transpose(mask.reshape(n, ho, wo, g, k), (0, 3, 4, 1, 2))
        samples = samples * m.reshape(n, g, 1, k, L)
    out = jnp.einsum("ngckl,kgco->nlo", samples,
                     weight.reshape(k, g, cpg, cout))
    out = out.reshape(n, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def dcn_chan_minor(x, offset, mask, weight, bias=None, stride=1,
                   padding=1, dilation=1, deformable_groups=1):
    """Channels-minor row gather: x kept (n, g, H·W, cpg); each tap
    reads one contiguous cpg row via take_along_axis on axis 2."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    cpg = cin // g
    sy, sx, ho, wo, k = _grid(x, offset, kh, kw, stride, padding,
                              dilation, g)
    L = ho * wo
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0).reshape(n, g, k * L, 1)
    wx = (sx - x0).reshape(n, g, k * L, 1)

    xr = jnp.transpose(x.reshape(n, h * w, g, cpg), (0, 2, 1, 3))

    def gather(yi, xi):
        inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(n, g, k * L, 1)
        vals = jnp.take_along_axis(xr, idx, axis=2)  # (n, g, K·L, cpg)
        return vals * inside.reshape(n, g, k * L, 1).astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    samples = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
               v10 * wy * (1 - wx) + v11 * wy * wx)  # (n, g, K·L, cpg)
    if mask is not None:
        m = jnp.transpose(mask.reshape(n, ho, wo, g, k),
                          (0, 3, 4, 1, 2)).reshape(n, g, k * L, 1)
        samples = samples * m
    samples = samples.reshape(n, g, k, L, cpg)
    out = jnp.einsum("ngklc,kgco->nlo", samples,
                     weight.reshape(k, g, cpg, cout))
    out = out.reshape(n, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def dcn_onehot_mxu(x, offset, mask, weight, bias=None, stride=1,
                   padding=1, dilation=1, deformable_groups=1):
    """Gather-free: bilinear sampling as a one-hot (K·L, H·W) matmul on
    the MXU. FLOPs scale with L·H·W — only sane for small maps, where
    the MXU is idle anyway. The 4 corner one-hots collapse into ONE
    weighted selection matrix (rows sum the 4 bilinear coefficients), so
    the interpolation itself rides the matmul."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    cpg = cin // g
    sy, sx, ho, wo, k = _grid(x, offset, kh, kw, stride, padding,
                              dilation, g)
    L = ho * wo
    hw = h * w
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0).reshape(n, g, k * L, 1)
    wx = (sx - x0).reshape(n, g, k * L, 1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, hw), 3)

    def sel(yi, xi, coef):
        inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(n, g, k * L, 1)
        coef = coef * inside.reshape(n, g, k * L, 1).astype(x.dtype)
        return (cols == idx).astype(x.dtype) * coef

    S = (sel(y0, x0, (1 - wy) * (1 - wx)) +
         sel(y0, x0 + 1, (1 - wy) * wx) +
         sel(y0 + 1, x0, wy * (1 - wx)) +
         sel(y0 + 1, x0 + 1, wy * wx))          # (n, g, K·L, H·W)
    xr = jnp.transpose(x.reshape(n, hw, g, cpg), (0, 2, 1, 3))
    # HIGHEST: TPU f32 matmuls are bf16-pass by default, which broke the
    # selection's parity gate at 3.4e-3 rel on chip
    samples = jnp.einsum("ngsp,ngpc->ngsc", S, xr,
                         precision=jax.lax.Precision.HIGHEST)
    if mask is not None:
        m = jnp.transpose(mask.reshape(n, ho, wo, g, k),
                          (0, 3, 4, 1, 2)).reshape(n, g, k * L, 1)
        samples = samples * m
    samples = samples.reshape(n, g, k, L, cpg)
    out = jnp.einsum("ngklc,kgco->nlo", samples,
                     weight.reshape(k, g, cpg, cout))
    out = out.reshape(n, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------- bench

# EDVR-M PCD pyramid shapes at the REDS eval geometry (basicsr
# edvr_arch.py:247 PCDAlignment: L3..L1 DCNs + cascade, all C=64, g=8)
LEVELS = {
    "L1_180x320": dict(n=1, h=180, w=320, c=64, g=8),
    "L2_90x160": dict(n=1, h=90, w=160, c=64, g=8),
    "L3_45x80": dict(n=1, h=45, w=80, c=64, g=8),
}

VARIANTS = {}


def make_inputs(n, h, w, c, g, dtype, rng):
    k = 9
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    # realistic offset scale (trained EDVR offsets are a few pixels)
    offset = jnp.asarray(rng.standard_normal((n, h, w, 2 * k * g)) * 2.0,
                         dtype)
    mask = jnp.asarray(rng.random((n, h, w, k * g)), dtype)
    weight = jnp.asarray(rng.standard_normal((3, 3, c, c)) / np.sqrt(
        9 * c), dtype)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.01, dtype)
    return x, offset, mask, weight, bias


def run_level(name, cfg, dtype, iters, skip_onehot, check_parity=True):
    from image_restoration_tpu.ops.deform_conv import \
        modulated_deform_conv as current

    rng = np.random.default_rng(0)
    x, offset, mask, weight, bias = make_inputs(dtype=dtype, rng=rng,
                                                **cfg)
    g = cfg["g"]

    def windowed(*a, **kw):
        return current(*a, max_offset=16, block=16, **kw)

    def windowed8(*a, **kw):
        # half the clamp radius: window (bh+2R+4) 52 -> 36 wide. Exact
        # whenever |offset| <= 8 — trained EDVR PCD offsets are a few px
        # (ours draw N(0,2)), so the tighter radius is usually free;
        # parity below gates it with offsets clipped to the radius (the
        # documented semantics), timing uses the shared unclipped set.
        return current(*a, max_offset=8, block=16, **kw)

    variants = {
        "current": current,
        "fused4": dcn_fused4,
        "chan_minor": dcn_chan_minor,
        "windowed_R16": windowed,
        "windowed_R8": windowed8,
    }
    hw = cfg["h"] * cfg["w"]
    if not skip_onehot and hw <= 16384:
        variants["onehot_mxu"] = dcn_onehot_mxu

    args = (x, offset, mask, weight, bias)

    if check_parity:
        # parity is a MATH property: gate it with true-f32 matmuls on
        # both arms (TPU default splits f32 into bf16 passes, so the
        # exact-path reference itself carries ~2e-3 at default precision)
        with jax.default_matmul_precision("highest"):
            ref = np.asarray(jax.jit(lambda *a: current(
                *a, deformable_groups=g))(*[a.astype(jnp.float32)
                                            for a in args]), np.float64)
            # windowed parity is defined for |off| <= R: gate the tighter
            # radius on its own clipped offset set + matching reference
            off8 = jnp.clip(offset, -8.0, 8.0)
            args8 = (x, off8, mask, weight, bias)
            ref8 = np.asarray(jax.jit(lambda *a: current(
                *a, deformable_groups=g))(*[a.astype(jnp.float32)
                                            for a in args8]), np.float64)
            for vname, fn in variants.items():
                if vname == "current":
                    continue
                va, vref = ((args8, ref8) if vname == "windowed_R8"
                            else (args, ref))
                got = np.asarray(jax.jit(lambda *a, fn=fn: fn(
                    *a, deformable_groups=g))(*[a.astype(jnp.float32)
                                                for a in va]),
                                 np.float64)
                err = np.abs(got - vref).max() / max(np.abs(vref).max(),
                                                     1e-9)
                assert err < 1e-4, f"{name}/{vname} parity {err:.2e}"
        log(f"  {name}: parity ok ({', '.join(variants)})")

    rows = {}
    for vname, fn in variants.items():
        def apply_fn(params, xx, fn=fn):
            off, m, wgt, b = params
            return fn(xx, off, m, wgt, b, deformable_groups=g)

        ms = onchip_ms(apply_fn, (offset, mask, weight, bias), x,
                       iters=iters)
        rows[vname] = round(ms, 3)
        log(f"  {name} {dtype.__name__ if hasattr(dtype, '__name__') else dtype} {vname}: {ms:.3f} ms")

    # roofline anchor: plain 3x3 conv, identical tensor shapes
    def conv_fn(params, xx):
        wgt, b = params
        return jax.lax.conv_general_dilated(
            xx, wgt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    rows["conv_ref"] = round(onchip_ms(conv_fn, (weight, bias), x,
                                       iters=iters), 3)
    log(f"  {name} conv_ref: {rows['conv_ref']:.3f} ms")
    return rows


def bench_flow_warp(dtype, iters, check_parity):
    """BasicVSR's other gather: full-map bilinear warp by optical flow
    (2 per frame in each trunk). Races the shipped gather form against
    the windowed max_flow=32 path at the BasicVSR trunk shape."""
    from image_restoration_tpu.archs.arch_util import flow_warp

    rng = np.random.default_rng(0)
    n, h, w, c, R = 1, 180, 320, 64, 32
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    fl = jnp.asarray(rng.standard_normal((n, h, w, 2)) * 6.0, dtype)

    if check_parity:
        with jax.default_matmul_precision("highest"):
            ref = np.asarray(jax.jit(flow_warp)(
                x.astype(jnp.float32), fl.astype(jnp.float32)), np.float64)
            got = np.asarray(jax.jit(lambda a, b: flow_warp(
                a, b, max_flow=R))(x.astype(jnp.float32),
                                   fl.astype(jnp.float32)), np.float64)
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert err < 1e-4, f"flow_warp windowed parity {err:.2e}"
        log(f"  flow_warp: parity ok (windowed R={R})")

    rows = {}
    for vname, fn in (("current", lambda p, xx: flow_warp(xx, p)),
                      ("windowed_R32", lambda p, xx: flow_warp(
                          xx, p, max_flow=R))):
        ms = onchip_ms(fn, fl, x, iters=iters)
        rows[vname] = round(ms, 3)
        log(f"  flow_warp 180x320x64 {vname}: {ms:.3f} ms")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-onehot", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    guard_backend()
    log(f"devices: {jax.devices()}")
    on_tpu = jax.devices()[0].platform == "tpu"

    levels = LEVELS if not args.tiny else {
        "tiny_16x16": dict(n=1, h=16, w=16, c=16, g=4)}
    out = {"date": time.strftime("%Y-%m-%d"),
           "note": "ms per DCN op, on-chip scan; EDVR-M PCD shapes "
                   "(C=64, deformable_groups=8, 3x3); conv_ref = plain "
                   "3x3 conv roofline anchor"}
    for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        res = {}
        for name, cfg in levels.items():
            res[name] = run_level(name, cfg, dtype,
                                  2 if args.tiny else args.iters,
                                  args.skip_onehot,
                                  check_parity=(dtype_name == "f32"))
        if not args.tiny:
            res["flow_warp_180x320x64"] = bench_flow_warp(
                dtype, args.iters, check_parity=(dtype_name == "f32"))
        out[dtype_name] = res
        if args.tiny:
            break

    if args.tiny or not on_tpu:
        log("tiny/off-TPU sanity only — NOT writing dcn_bench.json")
        print(json.dumps({"ok": True, "tiny": True}), flush=True)
        return
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, "dcn_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    best_l1 = min((v, k) for k, v in out["bf16"]["L1_180x320"].items()
                  if k != "conv_ref")
    print(json.dumps({"metric": "dcn_L1_best_ms", "value": best_l1[0],
                      "variant": best_l1[1], "unit": "ms",
                      "conv_ref_ms": out["bf16"]["L1_180x320"]
                      ["conv_ref"]}), flush=True)


if __name__ == "__main__":
    main()
