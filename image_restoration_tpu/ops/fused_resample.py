"""Fused FIR-resample convolutions (StyleGAN2 up/down paths) — TPU-native.

The reference runs every resampling StyleGAN2 conv as TWO passes over the
activations (Car_Plate-Restoration/basicsr/archs/stylegan2_ocr_arch.py):

  upsample:   conv_transpose(stride 2)  ->  upfirdn2d 4-tap FIR smooth
  downsample: upfirdn2d FIR smooth      ->  conv(stride 2)

On GPU the CUDA upfirdn kernel makes the second pass cheap; on TPU each
pass is a full HBM round-trip of the largest activations in the network,
and the measured GFPGAN generator is bandwidth-bound (~50% of HBM peak,
9% MFU — scripts/bench_train.py --breakdown). Both pairs are linear maps,
so they compose EXACTLY into a single convolution:

  corr(corr(z, A), B) = corr(z, A *full B)

The zero-padding the FIR applies to the intermediate equals extending the
first conv's padding (its kernel support beyond the existing (k-1)-pad
touches only zeros), so the composition is exact including borders —
asserted bit-tight in tests/test_fused_resample.py against the two-pass
path, which itself is golden vs the PyTorch reference.

To keep the MXU work identical (XLA does not skip the zeros of an
input-dilated conv), the composed stride-2 kernel is phase-decomposed
into subpixel convolutions:

  upsample:   one conv at IN-res, (Jh,Jw,Cin,4*Cout) -> depth_to_space
  downsample: space_to_depth -> one VALID conv at OUT-res over 4*Cin

i.e. one dense conv per resample instead of conv+FIR, with the FIR folded
into the weights at trace time (a (k+3)² compose over the 4-tap outer-
product kernel — negligible). Enable per-direction with IRT_FUSE_UP=1 /
IRT_FUSE_DOWN=1 (defaults OFF — see the measured verdict below and the
fused-resample study in docs/PERFORMANCE.md).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# Measured verdict (docs/PERFORMANCE.md "fused-resample study"): the exact
# fusion LOSES on TPU — the depth/space phase transposes cost a full data
# reshuffle that cancels the saved FIR pass, and the down-fusion pays ~4x
# the taps of the strided conv it replaces. Defaults are therefore OFF;
# the ops stay (exactness-tested) for the record and for future layouts.
FUSE_UP = os.environ.get("IRT_FUSE_UP", "0") == "1"
FUSE_DOWN = os.environ.get("IRT_FUSE_DOWN", "0") == "1"


def _fir_2d(kernel, gain=1.0):
    """Outer-product + normalize, matching upfirdn.make_resample_kernel."""
    k = np.asarray(kernel, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum() * gain


def _compose_full(a_hwio: jax.Array, b_hw: np.ndarray) -> jax.Array:
    """Full 2D convolution of a (kh,kw,Ci,Co) kernel with a (fh,fw) filter:
    C[a+u, b+v] += A[a,b] * B[u,v] -> (kh+fh-1, kw+fw-1, Ci, Co)."""
    kh, kw = a_hwio.shape[0], a_hwio.shape[1]
    fh, fw = b_hw.shape
    a32 = a_hwio.astype(jnp.float32)
    c = jnp.zeros((kh + fh - 1, kw + fw - 1) + a_hwio.shape[2:], jnp.float32)
    b = jnp.asarray(b_hw)
    for da in range(kh):
        for db in range(kw):
            c = c.at[da:da + fh, db:db + fw].add(
                a32[da, db] * b[:, :, None, None])
    return c


def _phase_split_up(c: jax.Array, pad0: int):
    """Split the composed stride-2-transposed kernel into 2×2 subpixel
    phase kernels applied to x directly.

    y[2i+d] = Σ_t zd[2i+d - pad0 + t] C[t]  with zd = 2×-dilated x, so for
    phase d only taps t ≡ (pad0 - d) (mod 2) hit data, at x offset
    i + j + (r_d + d - pad0)/2.  Returns (J, J, Ci, Co, 2, 2) kernels and
    the (common) x padding; phases are zero-padded to a common tap count.
    """
    L = c.shape[0]
    r = [(pad0 - d) % 2 for d in (0, 1)]
    J = [(L - r[d] + 1) // 2 for d in (0, 1)]
    off = [(r[d] + d - pad0) // 2 for d in (0, 1)]
    omin = min(off)
    # kernel tap j of phase d reads x[i + j + off[d]]; align phases by
    # shifting taps so all share the common offset omin
    width = max(J[d] + (off[d] - omin) for d in (0, 1))
    ci, co = c.shape[2], c.shape[3]
    out = jnp.zeros((width, width, ci, co, 2, 2), jnp.float32)
    for dh in (0, 1):
        for dw in (0, 1):
            for jh in range(J[dh]):
                for jw in range(J[dw]):
                    out = out.at[jh + off[dh] - omin,
                                 jw + off[dw] - omin, :, :, dh, dw].set(
                        c[r[dh] + 2 * jh, r[dw] + 2 * jw])
    pad_lo = -omin
    pad_hi = width - 1 + omin
    return out, (pad_lo, pad_hi)


def conv_up_fir(x: jax.Array, w_hwio: jax.Array, fir=(1, 3, 3, 1),
                conv_fn=None) -> jax.Array:
    """EXACT fusion of conv_transpose2d(x, w, stride=2) + upfirdn_smooth
    (upsample_factor=2) into one subpixel conv + depth_to_space.

    `conv_fn(x_padded, w4)` may override the inner dense conv (stride 1,
    VALID — padding is already applied; used for the int8 serving path);
    default is a plain lax conv.
    """
    n, h, w_sp, ci = x.shape
    kh = w_hwio.shape[0]
    co = w_hwio.shape[3]
    f = _fir_2d(fir, gain=4.0)  # upfirdn_smooth multiplies by factor²
    flen = f.shape[0]
    # two-pass path: A = flip(W) (conv_transpose correlates with flipped
    # weight, pad k-1), B = flip(fir) (upfirdn flips), fir pad p0 where
    # p = flen - 2 - (kh - 1):
    p = flen - 2 - (kh - 1)
    fir_p0 = (p + 1) // 2 + 1
    a = jnp.flip(w_hwio, (0, 1))
    b = np.flip(f, (0, 1))
    c = _compose_full(a, b)
    pad0 = (kh - 1) + fir_p0
    kphase, (plo, phi) = _phase_split_up(c, pad0)
    width = kphase.shape[0]
    # (J,J,ci,co,2,2) -> (J,J,ci,co*4) with phase-major last dim ordering
    # chosen to match the depth_to_space below
    k4 = kphase.transpose(0, 1, 2, 4, 5, 3).reshape(width, width, ci, 4 * co)
    xp = jnp.pad(x, ((0, 0), (plo, phi), (plo, phi), (0, 0)))
    if conv_fn is not None:
        y = conv_fn(xp, k4)
    else:
        y = jax.lax.conv_general_dilated(
            xp, k4.astype(x.dtype), window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # (N,H,W,2,2,Co) -> (N,2H,2W,Co)
    y = y.reshape(n, h, w_sp, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w_sp, co)
    return y


def conv_down_fir(x: jax.Array, w_hwio: jax.Array, fir=(1, 3, 3, 1),
                  conv_fn=None) -> jax.Array:
    """EXACT fusion of upfirdn_smooth(downsample_factor=2) + conv2d
    (stride=2, padding=0) into space_to_depth + one VALID conv."""
    n, h, w_sp, ci = x.shape
    kh = w_hwio.shape[0]
    co = w_hwio.shape[3]
    f = _fir_2d(fir)
    flen = f.shape[0]
    p = flen - 2 + (kh - 1)
    fir_p0, fir_p1 = (p + 1) // 2, p // 2
    b = np.flip(f, (0, 1))
    # composition: u = corr(x pad fir_p, B); y = corr(u, W, stride 2) ->
    # y[i] = Σ_t x[2i - fir_p0 + t] C[t],  C = full_conv(B, W)
    c = _compose_full(w_hwio, b)
    L = c.shape[0]
    # pad x so index 2i + t maps into the padded array (pad_lo = fir_p0),
    # then space_to_depth; out length = the two-pass output length
    out_len_h = (h + fir_p0 + fir_p1 - flen + 1 - kh) // 2 + 1
    out_len_w = (w_sp + fir_p0 + fir_p1 - flen + 1 - kh) // 2 + 1
    need_h = 2 * (out_len_h - 1) + L
    need_w = 2 * (out_len_w - 1) + L
    pad_hi_h = need_h - h - fir_p0
    pad_hi_w = need_w - w_sp - fir_p0
    # align to even length for space_to_depth
    eh = (h + fir_p0 + pad_hi_h) % 2
    ew = (w_sp + fir_p0 + pad_hi_w) % 2
    xp = jnp.pad(x, ((0, 0), (fir_p0, pad_hi_h + eh),
                     (fir_p0, pad_hi_w + ew), (0, 0)))
    hp, wp = xp.shape[1] // 2, xp.shape[2] // 2
    # space_to_depth: xp[2m+e, 2n+g] -> ph[m, n, (e,g)]
    ph = xp.reshape(n, hp, 2, wp, 2, ci).transpose(0, 1, 3, 2, 4, 5)
    ph = ph.reshape(n, hp, wp, 4 * ci)
    # kernel: K[j_h, j_w, (e,g,ci), co] = C[2j_h + e, 2j_w + g]
    jh_n = (L + 1) // 2
    kd = jnp.zeros((jh_n, jh_n, 2, 2, ci, co), jnp.float32)
    for e in (0, 1):
        for g in (0, 1):
            sub = c[e::2, g::2]
            kd = kd.at[:sub.shape[0], :sub.shape[1], e, g].set(sub)
    kd = kd.reshape(jh_n, jh_n, 4 * ci, co)
    if conv_fn is not None:
        y = conv_fn(ph, kd)
    else:
        y = jax.lax.conv_general_dilated(
            ph, kd.astype(x.dtype), window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :out_len_h, :out_len_w, :]
