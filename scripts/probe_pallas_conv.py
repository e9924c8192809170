#!/usr/bin/env python
"""XLA conv vs Pallas im2col conv at the widened-RRDB stage shapes, 528².

The widened body sustains ~28 TFLOP/s under XLA (docs/PERFORMANCE.md RRDB
ladder); hypothesis: XLA's per-tap lowering leaves the MXU contraction
rows 3/4 empty at C_in=32. The Pallas kernel contracts the full
K = 9·C_in in one matmul. This prints both rates per stage shape so the
integration decision is data-driven.
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import onchip_ms  # noqa: E402
from image_restoration_tpu.ops.pallas.im2col_conv import conv3x3_im2col  # noqa: E402

SIZE = 528
SHAPES = [
    ("stage1 64->192", 64, 192, 4),
    ("stage2 32->160", 32, 160, 8),
    ("stage3 32->128", 32, 128, 8),
    ("stage4 32->96", 32, 96, 8),
    ("stage5 32->64", 32, 64, 8),
]


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    dn = ("NHWC", "HWIO", "NHWC")
    for name, cin, cout, bh in SHAPES:
        x = jnp.asarray(rng.random((1, SIZE + 2, SIZE + 2, cin),
                                   np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.random((3, 3, cin, cout), np.float32) - 0.5,
                        jnp.bfloat16)
        fl = 2 * 9 * cin * cout * SIZE * SIZE

        def conv_xla(w, x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=dn) * 1e-3

        ms = onchip_ms(conv_xla, w, x, iters=20, repeats=2)
        print(f"{name:18s} xla-bf16:    {ms:6.3f} ms {fl / ms / 1e9:7.1f}"
              f" TFLOP/s", file=sys.stderr, flush=True)

        # correctness on-chip first
        ref = np.asarray(conv_xla(w, x), np.float32) * 1e3
        got = np.asarray(conv3x3_im2col(x, w, bh=bh), np.float32)
        rel = float(np.max(np.abs(ref - got))) / (
            float(np.abs(ref).max()) or 1.0)
        assert rel < 2e-2, f"{name}: pallas mismatch rel={rel}"

        def conv_pl(w, x):
            return conv3x3_im2col(x, w, bh=bh) * jnp.bfloat16(1e-3)

        ms = onchip_ms(conv_pl, w, x, iters=20, repeats=2)
        print(f"{name:18s} pallas bh={bh:2d}: {ms:6.3f} ms "
              f"{fl / ms / 1e9:7.1f} TFLOP/s (rel err {rel:.1e})",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
