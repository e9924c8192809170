"""Jittable batch degradation pipelines.

TPU-native re-design of the reference datasets' per-sample CPU __getitem__
synthesis:
  * `ffhq_degradation_batch`  ← FFHQDegradationDataset
    (basicsr/data/ffhq_degradation_dataset.py:221-311 — the PRODUCTION
    training pipeline): blur (mixed kernels incl. pyblur bank + median/
    bilateral) → random ↓[4,12] → gaussian noise → JPEG → resize back →
    color jitter / gray → pt-style jitter → uint8 quantize → ±0.5 normalize.
    Noise + JPEG run at the LOW resolution, like the reference.
  * `realesrgan_degradation_batch` ← RealSRDegradationDataset
    (basicsr/data/realsr_degradation_dataset.py:151-291): two-stage
    Real-ESRGAN chain with sinc kernels, gaussian|poisson noise and
    final jpeg⊕sinc order swap.

Everything is one jitted function of (rng, gt_batch) — the dataloader worker
pool of the reference collapses into device compute overlapped with the
train step.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import degradations as D
from .pyblur_bank import build_pyblur_bank
from ..ops.filter2d import filter2d


@dataclass(frozen=True)
class FFHQDegradationConfig:
    """Mirrors training_config/train_gfpgan_v4_square_license_basic.yml:23-40."""
    blur_kernel_size: int = 21
    min_kernel_size: int = 11
    kernel_list: Tuple[str, ...] = ("iso", "aniso", "motion", "average",
                                    "median", "bilateral", "pyblur")
    kernel_prob: Tuple[float, ...] = (0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.4)
    blur_sigma: Tuple[float, float] = (0.1, 10.0)
    downsample_range: Tuple[float, float] = (4.0, 12.0)
    noise_range: Optional[Tuple[float, float]] = (0.0, 20.0)
    jpeg_range: Optional[Tuple[float, float]] = (30.0, 100.0)
    color_jitter_prob: Optional[float] = 0.3
    color_jitter_shift: float = 20.0 / 255.0
    color_jitter_pt_prob: Optional[float] = 0.3
    gray_prob: float = 0.01
    gt_gray: bool = False
    use_hflip: bool = False
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    # TPU throughput knob: cap how many batch elements the median/bilateral
    # filters run on (gather->blur->scatter; D.apply_nonlinear_blur). None
    # = full batch, reference-exact. With kernel_prob 0.1 each and bs 16,
    # slots=6 leaves P(overflow) ~= 0.1%/step per type; overflow samples
    # keep the linear blur. Measured: degradation 33 -> ~14 ms at bs 16.
    nonlinear_slots: Optional[int] = None


def _make_banks(cfg_list) -> Optional[jnp.ndarray]:
    if "pyblur" in cfg_list or "sinc" in cfg_list:
        return jnp.asarray(build_pyblur_bank())
    return None


def make_ffhq_degradation(cfg: FFHQDegradationConfig):
    """Returns degrade(key, gt) — jit-ready. gt: (N,H,W,C) RGB [0,1]."""
    bank = _make_banks(cfg.kernel_list)

    def degrade(key, gt):
        n, h, w, c = gt.shape
        keys = jax.random.split(key, 12)

        if cfg.use_hflip:
            flip = jax.random.bernoulli(keys[11], 0.5, (n, 1, 1, 1))
            gt = jnp.where(flip, gt[:, :, ::-1, :], gt)

        # ---- blur: one random kernel per sample + nonlinear where drawn
        def draw(k):
            return D.random_mixed_kernel(
                k, cfg.kernel_list, cfg.kernel_prob,
                pad_to=cfg.blur_kernel_size,
                kernel_size_range=(cfg.min_kernel_size, cfg.blur_kernel_size),
                sigma_x_range=cfg.blur_sigma, sigma_y_range=cfg.blur_sigma,
                extra_bank=bank)

        kernels, type_idx = jax.vmap(draw)(jax.random.split(keys[0], n))
        lq = filter2d(gt, kernels)
        lq = D.apply_nonlinear_blur(lq, type_idx, cfg.kernel_list, keys[1],
                                    ksize=min(cfg.blur_kernel_size, 15),
                                    slots=cfg.nonlinear_slots)

        # ---- downsample → (noise, jpeg at low res) → upsample back
        def mid(small, valid_hw):
            s = small
            if cfg.noise_range is not None:
                s = D.add_gaussian_noise(keys[2], s, cfg.noise_range,
                                         gray_prob=0.0)
            if cfg.jpeg_range is not None:
                s = D.add_jpeg_compression(keys[3], s, cfg.jpeg_range)
            return s

        lq, _, _ = D.random_down_up(keys[4], lq, cfg.downsample_range,
                                    "bilinear", mid_fn=mid)
        lq = jnp.clip(lq, 0.0, 1.0)

        # ---- color jitter (np-style shift), per-sample gated
        if cfg.color_jitter_prob is not None:
            do = jax.random.bernoulli(keys[5], cfg.color_jitter_prob,
                                      (n, 1, 1, 1))
            lq = jnp.where(do, D.color_jitter(keys[6], lq,
                                              cfg.color_jitter_shift), lq)
        # ---- gray (gt_gray also grays the target, ref :282-287)
        if cfg.gray_prob:
            lq = D.random_grayscale(keys[7], lq, cfg.gray_prob)
            if cfg.gt_gray:  # same per-sample gate (same key, same prob)
                gt = D.random_grayscale(keys[7], gt, cfg.gray_prob)
        # ---- pt-style jitter
        if cfg.color_jitter_pt_prob is not None:
            do = jax.random.bernoulli(keys[8], cfg.color_jitter_pt_prob,
                                      (n, 1, 1, 1))
            lq = jnp.where(do, D.color_jitter_pt(keys[9], lq), lq)

        # ---- uint8 round-trip + normalize (ref :307-311)
        lq = jnp.clip(jnp.round(lq * 255.0), 0, 255) / 255.0
        mean = jnp.asarray(cfg.mean, gt.dtype)
        std = jnp.asarray(cfg.std, gt.dtype)
        return (lq - mean) / std, (gt - mean) / std

    return degrade


@dataclass(frozen=True)
class RealESRGANDegradationConfig:
    """Mirrors RealSRDegradationDataset opts (realsr_degradation_dataset.py)."""
    kernel_list: Tuple[str, ...] = ("iso", "aniso", "generalized_iso",
                                    "generalized_aniso", "plateau_iso",
                                    "plateau_aniso")
    kernel_prob: Tuple[float, ...] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    blur_kernel_size: int = 21
    blur_sigma: Tuple[float, float] = (0.2, 3.0)
    betag_range: Tuple[float, float] = (0.5, 4.0)
    betap_range: Tuple[float, float] = (1.0, 2.0)
    sinc_prob: float = 0.1
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)  # up/down/keep
    resize_range: Tuple[float, float] = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1.0, 30.0)
    poisson_scale_range: Tuple[float, float] = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (30.0, 95.0)
    # stage 2
    second_blur_prob: float = 0.8
    kernel_list2: Tuple[str, ...] = ("iso", "aniso", "generalized_iso",
                                     "generalized_aniso", "plateau_iso",
                                     "plateau_aniso")
    kernel_prob2: Tuple[float, ...] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    blur_sigma2: Tuple[float, float] = (0.2, 1.5)
    betag_range2: Tuple[float, float] = (0.5, 4.0)
    betap_range2: Tuple[float, float] = (1.0, 2.0)
    sinc_prob2: float = 0.1
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1.0, 25.0)
    poisson_scale_range2: Tuple[float, float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (30.0, 95.0)
    final_sinc_prob: float = 0.8
    scale: int = 4  # SR scale: lq is (H/scale, W/scale)


def _virtual_rescale(key, img, resize_prob, resize_range, interp="bilinear"):
    """Random up/down/keep rescale realized as a fixed-shape down-up
    round trip (virtual scale): downscales lose information like the
    reference's physical resize; upscales are ~identity (information-
    preserving), matching their effect on the final chain."""
    n = img.shape[0]
    k1, k2 = jax.random.split(key)
    mode = jax.random.categorical(
        k1, jnp.log(jnp.asarray(resize_prob) + 1e-12), shape=(n,))
    scale = jax.random.uniform(k2, (n,), minval=resize_range[0],
                               maxval=resize_range[1])
    # only true downscales (<1) destroy information
    eff = jnp.where(mode == 1, jnp.minimum(scale, 1.0), 1.0)
    down_factor = 1.0 / jnp.maximum(eff, 1e-3)  # ≥1
    from ..ops.resize import dynamic_resize_matrix
    h, w = img.shape[1], img.shape[2]
    mid_h, mid_w = h, w  # canvas equals full size; valid region varies
    vh = jnp.round(h / down_factor).astype(jnp.int32)
    vw = jnp.round(w / down_factor).astype(jnp.int32)

    def mats(v, out_len, in_len):
        down = dynamic_resize_matrix(out_len, in_len,
                                     in_len / jnp.maximum(
                                         v.astype(jnp.float32), 1.0),
                                     v, interp)
        up = dynamic_resize_matrix(out_len, in_len,
                                   v.astype(jnp.float32) / out_len,
                                   jnp.int32(out_len), interp)
        return down, up

    dh, uh = jax.vmap(lambda v: mats(v, mid_h, h))(vh)
    dw, uw = jax.vmap(lambda v: mats(v, mid_w, w))(vw)
    small = jnp.einsum("noh,nhwc->nowc", dh, img)
    small = jnp.einsum("npw,nowc->nopc", dw, small)
    out = jnp.einsum("noh,nhwc->nowc", uh, small)
    out = jnp.einsum("npw,nowc->nopc", uw, out)
    return out


def make_realesrgan_degradation(cfg: RealESRGANDegradationConfig):
    """Returns degrade(key, gt) → (lq, gt); lq at (H/scale, W/scale)."""
    sinc_bank = jnp.asarray(D.sinc_kernel_bank(cfg.blur_kernel_size))

    def _blur_stage(key, img, kernel_list, kernel_prob, blur_sigma, betag,
                    betap, sinc_prob):
        n = img.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)

        def draw(k):
            return D.random_mixed_kernel(
                k, kernel_list, kernel_prob, pad_to=cfg.blur_kernel_size,
                kernel_size_range=(cfg.blur_kernel_size,
                                   cfg.blur_kernel_size),
                sigma_x_range=blur_sigma, sigma_y_range=blur_sigma,
                betag_range=betag, betap_range=betap)

        kernels, _ = jax.vmap(draw)(jax.random.split(k1, n))
        # replace with sinc w.p. sinc_prob (ref :151-177)
        use_sinc = jax.random.bernoulli(k2, sinc_prob, (n, 1, 1))
        sinc_idx = jax.random.randint(k3, (n,), 0, sinc_bank.shape[0])
        kernels = jnp.where(use_sinc, sinc_bank[sinc_idx], kernels)
        return filter2d(img, kernels)

    def _noise_stage(key, img, gauss_prob, noise_range, poisson_range,
                     gray_prob):
        n = img.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        g = D.add_gaussian_noise(k2, img, noise_range, gray_prob)
        p = D.add_poisson_noise(k3, img, poisson_range, gray_prob)
        use_gauss = jax.random.bernoulli(k1, gauss_prob, (n, 1, 1, 1))
        return jnp.where(use_gauss, g, p)

    def degrade(key, gt):
        n, h, w, c = gt.shape
        keys = jax.random.split(key, 12)
        # ---- stage 1
        lq = _blur_stage(keys[0], gt, cfg.kernel_list, cfg.kernel_prob,
                         cfg.blur_sigma, cfg.betag_range, cfg.betap_range,
                         cfg.sinc_prob)
        lq = _virtual_rescale(keys[1], lq, cfg.resize_prob, cfg.resize_range)
        lq = _noise_stage(keys[2], lq, cfg.gaussian_noise_prob,
                          cfg.noise_range, cfg.poisson_scale_range,
                          cfg.gray_noise_prob)
        lq = D.add_jpeg_compression(keys[3], lq, cfg.jpeg_range)
        # ---- stage 2 (w.p. second_blur_prob)
        do2 = jax.random.bernoulli(keys[4], cfg.second_blur_prob,
                                   (n, 1, 1, 1))
        lq2 = _blur_stage(keys[5], lq, cfg.kernel_list2, cfg.kernel_prob2,
                          cfg.blur_sigma2, cfg.betag_range2,
                          cfg.betap_range2, cfg.sinc_prob2)
        lq = jnp.where(do2, lq2, lq)
        lq = _virtual_rescale(keys[6], lq, cfg.resize_prob2,
                              cfg.resize_range2)
        lq = _noise_stage(keys[7], lq, cfg.gaussian_noise_prob2,
                          cfg.noise_range2, cfg.poisson_scale_range2,
                          cfg.gray_noise_prob2)
        # ---- final: [resize to lq scale + sinc] ⊕ JPEG in random order
        from ..ops.resize import resize as static_resize
        out_h, out_w = h // cfg.scale, w // cfg.scale
        final_sinc = jax.random.bernoulli(keys[8], cfg.final_sinc_prob,
                                          (n, 1, 1))
        sinc_idx = jax.random.randint(keys[9], (n,), 0, sinc_bank.shape[0])
        ident = jnp.zeros((cfg.blur_kernel_size, cfg.blur_kernel_size)) \
            .at[cfg.blur_kernel_size // 2, cfg.blur_kernel_size // 2].set(1.0)
        fk = jnp.where(final_sinc, sinc_bank[sinc_idx], ident)

        def path_a(x):  # resize+sinc then jpeg
            x = static_resize(x, (out_h, out_w), "bilinear")
            x = filter2d(x, fk)
            return D.add_jpeg_compression(keys[10], x, cfg.jpeg_range2)

        def path_b(x):  # jpeg then resize+sinc
            x = D.add_jpeg_compression(keys[10], x, cfg.jpeg_range2)
            x = static_resize(x, (out_h, out_w), "bilinear")
            return filter2d(x, fk)

        order = jax.random.bernoulli(keys[11], 0.5, (n, 1, 1, 1))
        lq = jnp.where(order, path_a(lq), path_b(lq))
        # uint8 round-trip (ref :305-308)
        lq = jnp.clip(jnp.round(lq * 255.0), 0, 255) / 255.0
        return lq, gt

    return degrade
