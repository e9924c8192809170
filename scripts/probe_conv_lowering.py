#!/usr/bin/env python
"""Conv lowering variants for the K=32 widened-RRDB stages (XLA-level).

probe_pallas_conv.py established: XLA's 3×3 conv rate at 528² scales
with K·C_out (row starvation: 26 TF/s at C_in=64 down to 5.6 at
C_in=32/C_out=64), and a Pallas im2col kernel loses to its own
lane-misaligned VMEM copies. This probes pure-XLA re-lowerings that
raise K with USEFUL data (no structural zeros):

  concat3 : concat 3 dx-shifted views on channels (K=96), (3,1)-conv
  concat9 : concat all 9 shifted views (K=288), 1×1 conv == matmul
  patches : lax.conv_general_dilated_patches + dot (XLA's own im2col)

All are FLOP-identical re-associations of the same conv.
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import onchip_ms  # noqa: E402

SIZE = 528
DN = ("NHWC", "HWIO", "NHWC")
SHAPES = [("stage2 32->160", 32, 160), ("stage5 32->64", 32, 64),
          ("stage1 64->192", 64, 192)]


def conv_ref(w, x):
    return jax.lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                        dimension_numbers=DN)


def conv_concat3(w, x):
    # x (N, H+2, W+2, C) -> cat dx-shifts (N, H+2, W, 3C); w -> (3,1,3C,O)
    n, hp, wp, c = x.shape
    ww = wp - 2
    xc = jnp.concatenate([x[:, :, dx:dx + ww, :] for dx in range(3)],
                         axis=-1)
    # wc: (3, 1, 3C, O) with channel blocks matching xc's dx-major layout
    wc = jnp.concatenate([w[:, dx] for dx in range(3)], axis=1)
    wc = wc.reshape(3, 1, 3 * c, -1)
    return jax.lax.conv_general_dilated(xc, wc, (1, 1), "VALID",
                                        dimension_numbers=DN)


def conv_concat9(w, x):
    n, hp, wp, c = x.shape
    hh, ww = hp - 2, wp - 2
    xc = jnp.concatenate(
        [x[:, dy:dy + hh, dx:dx + ww, :] for dy in range(3)
         for dx in range(3)], axis=-1)
    wmat = w.reshape(9 * c, -1)
    return jnp.einsum("nhwk,ko->nhwo", xc, wmat)


def conv_patches(w, x):
    pat = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), "VALID", dimension_numbers=DN)
    # patches channel order is (C, kh, kw) for NHWC per JAX docs
    c, o = w.shape[2], w.shape[3]
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * c, o)
    return jnp.einsum("nhwk,ko->nhwo", pat, wmat)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    for name, cin, cout in SHAPES:
        x = jnp.asarray(rng.random((1, SIZE + 2, SIZE + 2, cin),
                                   np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.random((3, 3, cin, cout), np.float32) - 0.5,
                        jnp.bfloat16)
        fl = 2 * 9 * cin * cout * SIZE * SIZE
        ref = np.asarray(conv_ref(w, x), np.float32)
        rmax = float(np.abs(ref).max()) or 1.0
        for vname, fn in (("concat3", conv_concat3),
                          ("concat9", conv_concat9),
                          ("patches", conv_patches)):
            got = np.asarray(fn(w, x), np.float32)
            rel = float(np.abs(got - ref).max()) / rmax
            assert rel < 2e-2, f"{name} {vname} rel={rel}"

            def timed(w, x, fn=fn):
                return fn(w, x) * jnp.bfloat16(1e-3)

            ms = onchip_ms(timed, w, x, iters=20, repeats=2)
            print(f"{name:18s} {vname}: {ms:6.3f} ms "
                  f"{fl / ms / 1e9:7.1f} TFLOP/s (rel {rel:.1e})",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
