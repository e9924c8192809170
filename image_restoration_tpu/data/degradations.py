"""On-device degradation synthesis — jittable port of
Car_Plate-Restoration/basicsr/data/degradations.py (909 LoC of per-sample
CPU numpy/cv2 run in dataloader workers).

TPU-first redesign: every degradation is a vectorized jnp op driven by
explicit PRNG keys, so the WHOLE synthetic pipeline runs inside the jitted
train step on batches (the BASELINE north star). Per-sample randomness uses
fixed 21×21 padded kernels + branchless lax.switch (the reference already
pads kernels, degradations.py:456-458).

Kernel generators (ref :87-327): bivariate (generalized/plateau) Gaussian
with traced σx/σy/θ/β. Sinc kernels (ref :527-545) are precomputed on host
(scipy j1) into a cutoff bank and selected by index. Nonlinear blurs:
median (ref :354-356) via histogram bisection with box filters — exact for
256-level images; bilateral (ref :359-362) via a scanned window.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.filter2d import filter2d
from ..utils.diffjpeg import diff_jpeg

# ------------------------------------------------------- kernel generators


def _mesh(kernel_size: int):
    ax = jnp.arange(-(kernel_size // 2), kernel_size // 2 + 1,
                    dtype=jnp.float32)
    xx, yy = jnp.meshgrid(ax, ax)
    return xx, yy


def _inv_sigma(sig_x, sig_y, theta):
    """Inverse of R(θ)·diag(σx²,σy²)·R(θ)ᵀ in closed form."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    sx2, sy2 = sig_x ** 2, sig_y ** 2
    # Σ = R D Rᵀ → Σ⁻¹ = R D⁻¹ Rᵀ
    a = c * c / sx2 + s * s / sy2
    b = s * c / sx2 - s * c / sy2
    d = s * s / sx2 + c * c / sy2
    return a, b, d


def bivariate_gaussian(kernel_size: int, sig_x, sig_y, theta,
                       isotropic: bool = True) -> jax.Array:
    """(k,k) Gaussian kernel, traced params. Ref degradations.py:87-124."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    xx, yy = _mesh(kernel_size)
    a, b, d = _inv_sigma(sig_x, sig_y, theta)
    k = jnp.exp(-0.5 * (a * xx * xx + 2 * b * xx * yy + d * yy * yy))
    return k / jnp.sum(k)


def bivariate_generalized_gaussian(kernel_size: int, sig_x, sig_y, theta,
                                   beta, isotropic: bool = True) -> jax.Array:
    """exp(-0.5 (xᵀΣ⁻¹x)^β). Ref degradations.py:127-155."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    xx, yy = _mesh(kernel_size)
    a, b, d = _inv_sigma(sig_x, sig_y, theta)
    q = a * xx * xx + 2 * b * xx * yy + d * yy * yy
    k = jnp.exp(-0.5 * jnp.power(jnp.maximum(q, 1e-12), beta))
    return k / jnp.sum(k)


def bivariate_plateau(kernel_size: int, sig_x, sig_y, theta, beta,
                      isotropic: bool = True) -> jax.Array:
    """1/((xᵀΣ⁻¹x)^β + 1). Ref degradations.py:158-179."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    xx, yy = _mesh(kernel_size)
    a, b, d = _inv_sigma(sig_x, sig_y, theta)
    q = a * xx * xx + 2 * b * xx * yy + d * yy * yy
    k = 1.0 / (jnp.power(jnp.maximum(q, 1e-12), beta) + 1.0)
    return k / jnp.sum(k)


def sinc_kernel_bank(kernel_size: int = 21, num: int = 64,
                     cutoff_range=(np.pi / 3, np.pi)) -> np.ndarray:
    """Host-precomputed bank of circular low-pass (sinc) kernels over a
    cutoff grid (ref circular_lowpass_kernel :527-545)."""
    from scipy.special import j1
    bank = []
    for cutoff in np.linspace(cutoff_range[0], cutoff_range[1], num):
        ax = np.arange(kernel_size) - (kernel_size - 1) / 2
        xx, yy = np.meshgrid(ax, ax)
        r = np.sqrt(xx ** 2 + yy ** 2)
        with np.errstate(divide="ignore", invalid="ignore"):
            k = cutoff * j1(cutoff * r) / (2 * np.pi * r)
        k[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = \
            cutoff ** 2 / (4 * np.pi)
        k = k / k.sum()
        bank.append(k)
    return np.asarray(bank, np.float32)


def _pad_kernel(k: jax.Array, pad_to: int) -> jax.Array:
    p = (pad_to - k.shape[0]) // 2
    if p <= 0:
        return k
    return jnp.pad(k, ((p, p), (p, p)))


def _size_mask(kernel_size, pad_to: int) -> jax.Array:
    """Binary mask selecting a centered (kernel_size × kernel_size) window of
    a (pad_to × pad_to) kernel — lets a TRACED odd size pick the support."""
    ax = jnp.abs(jnp.arange(pad_to, dtype=jnp.float32) - (pad_to - 1) / 2)
    half = (kernel_size.astype(jnp.float32) - 1) / 2
    m = (ax <= half + 1e-6).astype(jnp.float32)
    return m[:, None] * m[None, :]


def motion_line_kernel(pad_to: int, kernel_size, horizontal) -> jax.Array:
    """Axis-aligned line kernel with traced size/orientation.

    Ref motion_blur (degradations.py:330-343).
    """
    mask = _size_mask(kernel_size, pad_to)
    center = jnp.zeros((pad_to,)).at[(pad_to - 1) // 2].set(1.0)
    horiz = center[:, None] * mask  # ones along the row
    vert = center[None, :] * mask
    k = jnp.where(horizontal, horiz, vert)
    return k / jnp.sum(k)


def box_kernel(pad_to: int, kernel_size) -> jax.Array:
    """Average-blur kernel with traced size (ref average_blur :345-352)."""
    m = _size_mask(kernel_size, pad_to)
    return m / jnp.sum(m)


def random_mixed_kernel(key: jax.Array, kernel_list: Sequence[str],
                        kernel_prob: Sequence[float], pad_to: int = 21,
                        kernel_size_range=(21, 21),
                        sigma_x_range=(0.6, 5.0), sigma_y_range=(0.6, 5.0),
                        rotation_range=(-math.pi, math.pi),
                        betag_range=(0.5, 8.0), betap_range=(0.5, 8.0),
                        extra_bank: Optional[jax.Array] = None) -> Tuple:
    """Draw ONE random blur kernel (pad_to × pad_to) per the reference's
    random_mixed_kernels distribution (degradations.py:419-522), fully
    jittable. Returns (kernel, type_index).

    Linear kernel types are generated/banked; nonlinear types ('median',
    'bilateral') return an identity kernel here and are applied separately
    by `apply_nonlinear_blur` keyed on type_index.

    extra_bank: (K, pad_to, pad_to) bank (e.g. pyblur PSF/defocus/line) used
    by the 'pyblur' entry.
    """
    keys = jax.random.split(key, 8)
    probs = jnp.asarray(kernel_prob, jnp.float32)
    idx = jax.random.categorical(keys[0], jnp.log(probs + 1e-12))

    sig_x = jax.random.uniform(keys[1], (), minval=sigma_x_range[0],
                               maxval=sigma_x_range[1])
    sig_y = jax.random.uniform(keys[2], (), minval=sigma_y_range[0],
                               maxval=sigma_y_range[1])
    theta = jax.random.uniform(keys[3], (), minval=rotation_range[0],
                               maxval=rotation_range[1])
    betag = jax.random.uniform(keys[4], (), minval=betag_range[0],
                               maxval=betag_range[1])
    betap = jax.random.uniform(keys[5], (), minval=betap_range[0],
                               maxval=betap_range[1])
    # random odd kernel size in [min, max] (ref FFHQ min_kernel_size..blur_kernel_size)
    lo, hi = kernel_size_range
    n_sizes = (hi - lo) // 2 + 1
    ksize = lo + 2 * jax.random.randint(keys[6], (), 0, n_sizes)

    identity = jnp.zeros((pad_to, pad_to)).at[pad_to // 2, pad_to // 2].set(1.0)

    def make(kind: str):
        if kind == "iso":
            return bivariate_gaussian(pad_to, sig_x, sig_y, theta, True)
        if kind == "aniso":
            return bivariate_gaussian(pad_to, sig_x, sig_y, theta, False)
        if kind == "generalized_iso":
            return bivariate_generalized_gaussian(pad_to, sig_x, sig_y,
                                                  theta, betag, True)
        if kind == "generalized_aniso":
            return bivariate_generalized_gaussian(pad_to, sig_x, sig_y,
                                                  theta, betag, False)
        if kind == "plateau_iso":
            return bivariate_plateau(pad_to, sig_x, sig_y, theta, betap, True)
        if kind == "plateau_aniso":
            return bivariate_plateau(pad_to, sig_x, sig_y, theta, betap,
                                     False)
        if kind == "motion":
            horizontal = jax.random.bernoulli(keys[7])
            return motion_line_kernel(pad_to, ksize, horizontal)
        if kind == "average":
            return box_kernel(pad_to, ksize)
        if kind in ("median", "bilateral"):
            return identity  # applied by apply_nonlinear_blur
        if kind == "pyblur":
            assert extra_bank is not None, "pyblur needs a kernel bank"
            j = jax.random.randint(keys[7], (), 0, extra_bank.shape[0])
            return extra_bank[j]
        if kind == "sinc":
            assert extra_bank is not None, "sinc needs a kernel bank"
            j = jax.random.randint(keys[7], (), 0, extra_bank.shape[0])
            return extra_bank[j]
        raise ValueError(f"unknown kernel type {kind}")

    kernel = jax.lax.switch(idx, [partial(make, k) for k in kernel_list])
    return kernel, idx


# -------------------------------------------------------- nonlinear blurs


def _box_sum(x: jax.Array, ksize: int) -> jax.Array:
    """(N,H,W,C) box filter sum with replicate padding (separable)."""
    p = ksize // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    c = x.shape[-1]
    k1 = jnp.ones((ksize, 1, 1, c), x.dtype)
    k2 = jnp.ones((1, ksize, 1, c), x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(xp, k1, (1, 1), "VALID",
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    return jax.lax.conv_general_dilated(out, k2, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def median_blur(x: jax.Array, ksize: int = 21, bits: int = 8) -> jax.Array:
    """Median filter via per-pixel threshold bisection (exact for
    2^bits-level images). Replaces cv2.medianBlur (ref :354-356).

    Each of the `bits` rounds counts, for every pixel, how many window
    neighbors are ≤ that pixel's current threshold. TPU shape (r5,
    docs/assets/degrade_profile.json): the original form — a fori_loop
    over all k² offsets of f32 dynamic-slice/compare ops — serialized
    ~1800 tiny VPU dispatches and cost ~9 ms/step inside the degradation
    chain. This form cuts it two ways, bit-exactly:
      * all integer math in uint8/uint16 (4× VPU lanes vs f32; a k≤15
        window count ≤ 225 fits u8 with headroom in u16),
      * fori only over the k row shifts; the k column shifts are STATIC
        slices unrolled inside the body, which XLA fuses into one tiled
        compare-accumulate pass per row shift.
    """
    n, h, w, c = x.shape
    p = ksize // 2
    q = jnp.round(x * 255.0).astype(jnp.uint8)
    qp = jnp.pad(q, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    rank = (ksize * ksize + 1) // 2  # count is integer; >= ceil(k²/2)

    lo = jnp.zeros((n, h, w, c), jnp.int16)
    hi = jnp.full((n, h, w, c), 255, jnp.int16)
    for _ in range(bits):
        mid = ((lo + hi) // 2).astype(jnp.int16)

        def count_rows(dy, cnt):
            slab = jax.lax.dynamic_slice(
                qp, (0, dy, 0, 0), (n, h, w + 2 * p, c)).astype(jnp.int16)
            row = jnp.zeros((n, h, w, c), jnp.uint8)
            for dx in range(ksize):
                row = row + (slab[:, :, dx:dx + w, :] <= mid
                             ).astype(jnp.uint8)
            return cnt + row.astype(jnp.uint16)

        cnt = jax.lax.fori_loop(0, ksize, count_rows,
                                jnp.zeros((n, h, w, c), jnp.uint16))
        le_half = cnt >= rank  # median ≤ mid
        hi = jnp.where(le_half, mid, hi)
        lo = jnp.where(le_half, lo, mid + 1)
    return lo.astype(x.dtype) / 255.0


def bilateral_blur(x: jax.Array, ksize: int = 21, sigma_color: float = 200.0,
                   sigma_space: float = 200.0) -> jax.Array:
    """Bilateral filter (ref :359-362 semantics: cv2.bilateralFilter on
    uint8 with sigmaColor=sigmaSpace∈[150,250]). Scanned window offsets."""
    p = ksize // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    n, h, w, c = x.shape
    x255 = x * 255.0

    r2 = jnp.asarray([[(dy - p) ** 2 + (dx - p) ** 2
                       for dx in range(ksize)] for dy in range(ksize)],
                     jnp.float32)
    # cv2 uses a circular neighborhood of radius d/2; σ may be traced
    sw = jnp.exp(-r2 / (2 * jnp.asarray(sigma_space, jnp.float32) ** 2))
    sw = sw * (r2 <= p * p)
    inv2sc = 1.0 / (2 * jnp.asarray(sigma_color, jnp.float32) ** 2)

    # fori over the k ROW shifts only; the k column shifts are static
    # slices unrolled in the body (one fused pass per row shift) — same
    # serial-dispatch fix as median_blur, same r5 profile motivation
    def body(dy, acc):
        num, den = acc
        slab = jax.lax.dynamic_slice(xp, (0, dy, 0, 0),
                                     (n, h, w + 2 * p, c))
        sw_row = jax.lax.dynamic_slice(sw, (dy, 0), (1, ksize))[0]
        for dx in range(ksize):
            win = slab[:, :, dx:dx + w, :]
            # cv2 color weight: exp(-(Σ_c|diff|)²/2σ²) shared across chans
            diff_l1 = jnp.sum(jnp.abs(win - x) * 255.0, axis=-1,
                              keepdims=True)
            wgt = sw_row[dx] * jnp.exp(-(diff_l1 * diff_l1) * inv2sc)
            num = num + wgt * win
            den = den + wgt
        return num, den

    num, den = jax.lax.fori_loop(
        0, ksize, body, (jnp.zeros_like(x), jnp.zeros_like(x)))
    return num / jnp.maximum(den, 1e-8)


def _slotted_apply(x, is_type, blur_fn, slots):
    """Blur only a gathered fixed-size subset (the samples that drew this
    type, median/bilateral being ~25x the cost of the linear blurs), then
    scatter back. Exact whenever #drawn <= slots; overflow samples keep
    the linear blur (probability chosen <~0.1%/step via the slot count).
    """
    n = x.shape[0]
    s = min(slots, n)
    order = jnp.argsort(~is_type)  # drawn samples first (stable)
    sel = order[:s]
    sub = jnp.take(x, sel, axis=0)
    blurred = blur_fn(sub)
    keep = is_type[sel][:, None, None, None]
    return x.at[sel].set(jnp.where(keep, blurred, sub))


def apply_nonlinear_blur(x: jax.Array, kernel_type_idx: jax.Array,
                         kernel_list: Sequence[str], key: jax.Array,
                         ksize: int = 21,
                         slots: int | None = None) -> jax.Array:
    """Apply median/bilateral where the drawn type demands it (per batch
    element), identity otherwise. x: (N,H,W,C); kernel_type_idx: (N,).

    `slots` (opt-in, TPU throughput knob) caps how many batch elements the
    expensive rank/range filters are computed on — see _slotted_apply.
    None = compute on the full batch (reference-exact selection).
    """
    med_ids = [i for i, k in enumerate(kernel_list) if k == "median"]
    bil_ids = [i for i, k in enumerate(kernel_list) if k == "bilateral"]
    out = x
    if med_ids:
        is_med = kernel_type_idx == med_ids[0]
        if slots is not None:
            out = _slotted_apply(out, is_med,
                                 lambda s: median_blur(s, ksize), slots)
        else:
            out = jnp.where(is_med[:, None, None, None],
                            median_blur(x, ksize), out)
    if bil_ids:
        sigma = jax.random.uniform(key, (), minval=150.0, maxval=250.0)
        is_bil = kernel_type_idx == bil_ids[0]
        if slots is not None:
            out = _slotted_apply(
                out, is_bil,
                lambda s: bilateral_blur(s, ksize, sigma, sigma), slots)
        else:
            out = jnp.where(is_bil[:, None, None, None],
                            bilateral_blur(x, ksize, sigma, sigma), out)
    return out


# ---------------------------------------------------------------- noises


def random_gaussian_noise(key, shape, sigma_range=(0, 1.0),
                          gray_prob: float = 0.0):
    """Per-sample σ ∈ range/255 noise, gray w.p. gray_prob.

    Ref random_add_gaussian_noise (:660-693) — sigma ranges are in [0,255]
    units in the configs, divided by 255 here.
    """
    n = shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    sigma = jax.random.uniform(k1, (n, 1, 1, 1), minval=sigma_range[0],
                               maxval=sigma_range[1]) / 255.0
    noise = jax.random.normal(k2, shape) * sigma
    gray = jax.random.bernoulli(k3, gray_prob, (n, 1, 1, 1))
    gray_noise = jnp.mean(noise, axis=-1, keepdims=True)
    return jnp.where(gray, gray_noise, noise)


def add_gaussian_noise(key, img, sigma_range=(0, 1.0), gray_prob=0.0,
                       clip: bool = True):
    noise = random_gaussian_noise(key, img.shape, sigma_range, gray_prob)
    out = img + noise.astype(img.dtype)
    return jnp.clip(out, 0.0, 1.0) if clip else out


def add_poisson_noise(key, img, scale_range=(0.0, 1.0), gray_prob=0.0,
                      clip: bool = True, vals: float = 256.0):
    """Poisson (shot) noise, per-sample scale. Ref :839-868.

    The reference derives `vals` from the per-image unique-level count
    (data-dependent); we use the 2^8 quantization level (images are
    uint8-quantized immediately before), which is its fixed point.
    """
    n = img.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (n, 1, 1, 1), minval=scale_range[0],
                               maxval=scale_range[1])
    gray = jax.random.bernoulli(k3, gray_prob, (n, 1, 1, 1))
    base = jnp.mean(img, axis=-1, keepdims=True)
    src = jnp.where(gray, jnp.broadcast_to(base, img.shape), img)
    lam = jnp.clip(src, 0.0, 1.0) * vals
    sampled = jax.random.poisson(k2, lam).astype(img.dtype) / vals
    noise = sampled - src
    out = img + noise * scale
    return jnp.clip(out, 0.0, 1.0) if clip else out


def add_jpeg_compression(key, img, quality_range=(30, 100)):
    """Per-sample random-quality JPEG (DiffJPEG). Ref :876-909."""
    n = img.shape[0]
    quality = jax.random.uniform(key, (n,), minval=quality_range[0],
                                 maxval=quality_range[1])
    return jnp.clip(diff_jpeg(img, quality, differentiable=False), 0.0, 1.0)


# -------------------------------------------------- resize (random scale)


def random_down_up(key, img, scale_range=(4.0, 12.0),
                   interpolation: str = "bilinear",
                   mid_fn=None):
    """Random downsample→(mid ops)→upsample round trip with STATIC shapes.

    The intermediate lives on a fixed canvas of size ceil(max/scale_min);
    rows/cols beyond the valid extent are zero (masked by the resize
    matrices). `mid_fn(small, valid_hw)` applies noise/JPEG at the low
    resolution, mirroring FFHQDegradationDataset's order (:255-272).
    """
    from ..ops.resize import dynamic_resize_matrix
    n, h, w, c = img.shape
    mid_h = int(math.ceil(h / scale_range[0]))
    mid_w = int(math.ceil(w / scale_range[0]))
    scale = jax.random.uniform(key, (n,), minval=scale_range[0],
                               maxval=scale_range[1])
    vh = jnp.round(h / scale).astype(jnp.int32)
    vw = jnp.round(w / scale).astype(jnp.int32)

    def mk_down(s, vout, out_len, in_len):
        return dynamic_resize_matrix(out_len, in_len, in_len / jnp.maximum(
            vout.astype(jnp.float32), 1.0), vout, interpolation)

    def mk_up(vin, out_len, in_len):
        return dynamic_resize_matrix(
            out_len, in_len, vin.astype(jnp.float32) / out_len,
            jnp.int32(out_len), interpolation)

    wd_h = jax.vmap(lambda s, v: mk_down(s, v, mid_h, h))(scale, vh)
    wd_w = jax.vmap(lambda s, v: mk_down(s, v, mid_w, w))(scale, vw)
    small = jnp.einsum("noh,nhwc->nowc", wd_h, img)
    small = jnp.einsum("npw,nowc->nopc", wd_w, small)

    if mid_fn is not None:
        small = mid_fn(small, (vh, vw))

    wu_h = jax.vmap(lambda v: mk_up(v, h, mid_h))(vh)
    wu_w = jax.vmap(lambda v: mk_up(v, w, mid_w))(vw)
    out = jnp.einsum("noh,nhwc->nowc", wu_h, small)
    out = jnp.einsum("npw,nowc->nopc", wu_w, out)
    return out, small, (vh, vw)


# ------------------------------------------------------------ color jitter


def color_jitter(key, img, shift: float):
    """Uniform per-channel shift (ref ffhq_degradation_dataset.py:101-106)."""
    n = img.shape[0]
    jitter = jax.random.uniform(key, (n, 1, 1, 3), minval=-shift,
                                maxval=shift)
    return jnp.clip(img + jitter, 0.0, 1.0)


def color_jitter_pt(key, img, brightness=(0.5, 1.5), contrast=(0.5, 1.5),
                    saturation=(0, 1.5), hue=(-0.1, 0.1)):
    """Brightness/contrast/saturation/hue jitter in a fixed order
    (the reference shuffles the order per-sample,
    ffhq_degradation_dataset.py:108-133; fixed order is distributionally
    near-identical and jit-friendly)."""
    n = img.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (n, 1, 1, 1), minval=brightness[0],
                           maxval=brightness[1])
    img = jnp.clip(img * b, 0, 1)
    c = jax.random.uniform(kc, (n, 1, 1, 1), minval=contrast[0],
                           maxval=contrast[1])
    mean = jnp.mean(img, axis=(1, 2, 3), keepdims=True)
    img = jnp.clip((img - mean) * c + mean, 0, 1)
    s = jax.random.uniform(ks, (n, 1, 1, 1), minval=saturation[0],
                           maxval=saturation[1])
    gray = jnp.mean(img * jnp.asarray([0.299, 0.587, 0.114]), axis=-1,
                    keepdims=True)
    img = jnp.clip((img - gray) * s + gray, 0, 1)
    # hue: rotate chroma plane in YIQ-ish space
    hshift = jax.random.uniform(kh, (n, 1, 1, 1), minval=hue[0],
                                maxval=hue[1]) * 2 * jnp.pi
    y = jnp.sum(img * jnp.asarray([0.299, 0.587, 0.114]), -1, keepdims=True)
    i = jnp.sum(img * jnp.asarray([0.596, -0.274, -0.322]), -1,
                keepdims=True)
    q = jnp.sum(img * jnp.asarray([0.211, -0.523, 0.312]), -1, keepdims=True)
    cos, sin = jnp.cos(hshift), jnp.sin(hshift)
    i2 = i * cos - q * sin
    q2 = i * sin + q * cos
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b2 = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.concatenate([r, g, b2], axis=-1), 0, 1)


def random_grayscale(key, img, gray_prob: float):
    """BGR/RGB→gray replicate w.p. gray_prob (ref :282-287)."""
    n = img.shape[0]
    gray = jax.random.bernoulli(key, gray_prob, (n, 1, 1, 1))
    g = jnp.sum(img * jnp.asarray([0.299, 0.587, 0.114], img.dtype), -1,
                keepdims=True)
    return jnp.where(gray, jnp.broadcast_to(g, img.shape), img)


# --------------------------------------------------- perspective roundtrip


# shared with the serving-side device geometry (ops/geometry.py); the
# names stay exported here for back-compat with existing callers/tests
from ..ops.geometry import (homography_from_points as  # noqa: E402
                            _homography_from_points, warp_perspective)


# perstranforms corner-band table (ref degradations.py:392-411): each of
# the three `factor` layouts places each corner's (x, y) in one of three
# bands — 0: [0, dim/down·(scale-1)], 1: [·(scale-1), ·scale],
# 2: [·scale, dim]. Rows: factor; cols: TL, TR, BL, BR; entries (x, y).
_PERS_BANDS = jnp.asarray([
    [[0, 0], [2, 0], [0, 2], [2, 2]],   # factor 1
    [[0, 1], [1, 0], [1, 2], [2, 1]],   # factor 2
    [[1, 0], [2, 1], [0, 1], [1, 2]],   # factor 3
], jnp.int32)


def perspective_roundtrip(key, img, down_choices=(3, 5)):
    """Warp to a random quadrilateral and back (ref perstranforms :386-416):
    the information-destroying round trip used as a degradation. All three
    corner layouts (`factor` 1-3) are drawn uniformly, like the reference's
    random.randint(1, 3)."""
    n, h, w, c = img.shape

    def one(key, im):
        k1, k2, k3 = jax.random.split(key, 3)
        down = jnp.asarray(down_choices, jnp.float32)[
            jax.random.randint(k1, (), 0, len(down_choices))]
        scale = (down + 1) // 2
        factor = jax.random.randint(k3, (), 0, 3)
        bands = _PERS_BANDS[factor]                       # (4, 2)
        u = jax.random.uniform(k2, (4, 2))

        def banded(dim, band_id, uu):
            lo = dim / down * (scale - 1)
            hi = dim / down * scale
            lows = jnp.stack([0.0, lo, hi])
            highs = jnp.stack([lo, hi, jnp.float32(dim)])
            return lows[band_id] + uu * (highs[band_id] - lows[band_id])

        xs = banded(w, bands[:, 0], u[:, 0])
        ys = banded(h, bands[:, 1], u[:, 1])
        pts1 = jnp.asarray([[0, 0], [w, 0], [0, h], [w, h]], jnp.float32)
        pts2 = jnp.stack([xs, ys], axis=-1)
        m = _homography_from_points(pts1, pts2)
        m_inv = _homography_from_points(pts2, pts1)
        return warp_perspective(warp_perspective(im, m), m_inv)

    keys = jax.random.split(key, n)
    return jax.vmap(one)(keys, img)
