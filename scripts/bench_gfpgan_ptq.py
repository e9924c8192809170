#!/usr/bin/env python
"""GFPGAN production-generator serving speed: bf16 vs dynamic-int8 PTQ.

Closes the round-2 verdict's GFPGAN-PTQ item: quality was measured at
44.1 dB vs f32 on real content (docs/PERFORMANCE.md); this measures the
SPEED of the dynamic-int8 mode (ops/modulated_conv.int8_serving) on the
production 256² GFPGANv1OCR at the serving batch sizes, on-chip timed.

Writes docs/assets/gfpgan_ptq.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import onchip_ms  # noqa: E402
from image_restoration_tpu.archs import build_network  # noqa: E402
from image_restoration_tpu.ops import modulated_conv  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}")
    gfp = build_network(dict(type="GFPGANv1OCR", input_width=256,
                             input_height=256, num_style_feat=256,
                             channel_multiplier=0.5, num_mlp=4,
                             input_is_latent=True, different_w=True,
                             narrow=1, sft_half=True, dtype=jnp.bfloat16))
    x1 = jnp.asarray(rng.random((4, 256, 256, 3), np.float32),
                     jnp.bfloat16)
    vg = jax.jit(lambda k, x: gfp.init(k, x, randomize_noise=False))(
        jax.random.PRNGKey(0), x1)

    def fwd_bf16(p, x):
        # damp the scan carry: random StyleGAN weights overflow bf16
        # under carry accumulation (docs/PERFORMANCE.md timing notes)
        return gfp.apply({"params": p}, x, randomize_noise=False)[0] * 1e-6

    def fwd_int8(p, x):
        with modulated_conv.int8_serving():
            out = gfp.apply({"params": p}, x, randomize_noise=False)[0]
        return out * 1e-6

    rows = []
    for bs in (4, 8, 16, 32):
        x = jnp.asarray(rng.random((bs, 256, 256, 3), np.float32),
                        jnp.bfloat16)
        row = {"bs": bs}
        for mode, fn in (("bf16", fwd_bf16), ("dyn-int8", fwd_int8)):
            try:
                ms = onchip_ms(fn, vg["params"], x, iters=5, repeats=2)
            except Exception as e:
                log(f"bs={bs} {mode} failed: {e}")
                continue
            row[mode] = {"ms": round(ms, 2),
                         "imgs_per_sec": round(bs / ms * 1e3, 1)}
            log(f"GFPGANv1OCR 256² bs={bs} {mode}: {ms:.2f} ms → "
                f"{bs / ms * 1e3:.1f} imgs/s")
        rows.append(row)

    out = {"date": time.strftime("%Y-%m-%d"),
           "config": "GFPGANv1OCR 256² production (cm 0.5, 256 style), "
                     "dynamic-int8 = per-out-ch int8 weights + on-the-fly "
                     "per-tensor activation scales on every conv",
           "quality_db_vs_f32": 44.1,
           "rows": rows}
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, "gfpgan_ptq.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
