#!/usr/bin/env python
"""Per-shape conv microbench for the widened RRDB stages at 528².

widened-bf16 serves at 328 ms/tile vs a 54 ms compute roofline — this
isolates whether the gap is per-conv lowering (K=32 contraction) or the
composition (scan carry, slicing, epilogue sums). Times each widened
stage shape standalone, bf16 and int8, plus the SRVGG body shape as the
known-good anchor (~1.0 ms at 330 TOPS issued).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import onchip_ms  # noqa: E402

SIZE = 528
SHAPES = [
    ("stage1 64->192", 64, 192),
    ("stage2 32->160", 32, 160),
    ("stage3 32->128", 32, 128),
    ("stage4 32->96", 32, 96),
    ("stage5 32->64", 32, 64),
    ("srvgg-body 64->64", 64, 64),
    ("dense 128->128", 128, 128),
    ("orig-rdb 64->32", 64, 32),
    ("orig-rdb 192->64", 192, 64),
]


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    dn = ("NHWC", "HWIO", "NHWC")
    for name, cin, cout in SHAPES:
        x = jnp.asarray(rng.random((1, SIZE, SIZE, cin), np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.random((3, 3, cin, cout), np.float32) - 0.5,
                        jnp.bfloat16)

        def conv_bf16(w, x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) * 1e-3

        ms = onchip_ms(conv_bf16, w, x, iters=20, repeats=2)
        fl = 2 * 9 * cin * cout * SIZE * SIZE
        print(f"{name:20s} bf16: {ms:6.3f} ms  {fl / ms / 1e9:7.1f} "
              f"TFLOP/s", file=sys.stderr, flush=True)

        xq = jnp.asarray(
            rng.integers(-127, 127, (1, SIZE, SIZE, cin)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)),
                         jnp.int8)

        def conv_int8(w, x):
            acc = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))

        def int8_wrap(w, x):
            # onchip_ms adds a carry to x; keep int8 input by re-cast
            return conv_int8(w, jnp.clip(jnp.round(x), -127,
                                         127).astype(jnp.int8))

        xf = xq.astype(jnp.bfloat16)
        ms = onchip_ms(int8_wrap, wq, xf, iters=20, repeats=2)
        print(f"{name:20s} int8: {ms:6.3f} ms  {fl / ms / 1e9:7.1f} "
              f"TOP/s (incl. requant head)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
