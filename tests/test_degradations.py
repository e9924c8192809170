"""Golden tests for the on-device degradation engine."""

import numpy as np
import pytest
import cv2

import jax
import jax.numpy as jnp

from ref_loader import load_ref_module
from image_restoration_tpu.utils.diffjpeg import diff_jpeg
from image_restoration_tpu.data import degradations as D
from image_restoration_tpu.data.pipelines import (
    FFHQDegradationConfig, make_ffhq_degradation,
    RealESRGANDegradationConfig, make_realesrgan_degradation)
from image_restoration_tpu.data.pyblur_bank import build_pyblur_bank


def test_diffjpeg_matches_reference(rng):
    import torch
    ref = load_ref_module("utils.diffjpeg")
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    jpeger = ref.DiffJPEG(differentiable=False)
    quality = torch.tensor([20.0, 60.0])
    with torch.no_grad():
        want = jpeger(torch.from_numpy(x), quality=quality.clone()).numpy()
    got = diff_jpeg(jnp.asarray(x.transpose(0, 2, 3, 1)),
                    jnp.asarray([20.0, 60.0]), differentiable=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_diffjpeg_close_to_cv2(rng):
    # smooth natural-ish image (JPEG on pure noise is degenerate)
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    img = np.stack([np.sin(yy / 8) * 0.4 + 0.5,
                    np.cos(xx / 11) * 0.4 + 0.5,
                    (xx + yy) / 112.0], axis=-1)
    img = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    img_u8 = (img * 255).round().astype(np.uint8)  # RGB
    q = 40
    _, enc = cv2.imencode(".jpg", img_u8[..., ::-1],
                          [int(cv2.IMWRITE_JPEG_QUALITY), q])
    want = cv2.imdecode(enc, 1)[..., ::-1].astype(np.float32) / 255.0
    got = np.asarray(diff_jpeg(
        jnp.asarray(img_u8[None].astype(np.float32)) / 255.0, q,
        differentiable=False))[0]
    # DiffJPEG ≠ libjpeg exactly (reference docstring says the same); check
    # it is a close approximation
    assert np.abs(got - want).mean() < 0.02


def test_bivariate_gaussian_matches_reference():
    ref = load_ref_module("data.degradations")
    for iso in (True, False):
        want = ref.bivariate_Gaussian(21, 2.0, 4.0, 0.7, isotropic=iso)
        got = np.asarray(D.bivariate_gaussian(21, 2.0, 4.0, 0.7,
                                              isotropic=iso))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_generalized_and_plateau_match_reference():
    ref = load_ref_module("data.degradations")
    want = ref.bivariate_generalized_Gaussian(21, 2.0, 3.0, 0.5, 1.5,
                                              isotropic=False)
    got = np.asarray(D.bivariate_generalized_gaussian(21, 2.0, 3.0, 0.5, 1.5,
                                                      isotropic=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    want = ref.bivariate_plateau(21, 2.0, 3.0, 0.5, 2.0, isotropic=True)
    got = np.asarray(D.bivariate_plateau(21, 2.0, 3.0, 0.5, 2.0,
                                         isotropic=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_sinc_bank_matches_reference():
    ref = load_ref_module("data.degradations")
    bank = D.sinc_kernel_bank(21, num=3, cutoff_range=(np.pi / 3, np.pi))
    for i, cutoff in enumerate(np.linspace(np.pi / 3, np.pi, 3)):
        want = ref.circular_lowpass_kernel(cutoff, 21, pad_to=0)
        np.testing.assert_allclose(bank[i], want, rtol=1e-4, atol=1e-6)


def test_median_blur_matches_cv2(rng):
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    k = 5
    want = cv2.medianBlur(img, k).astype(np.float32) / 255.0
    got = np.asarray(D.median_blur(
        jnp.asarray(img[None].astype(np.float32) / 255.0), k))[0]
    b = k // 2
    np.testing.assert_allclose(got[b:-b, b:-b], want[b:-b, b:-b], atol=1 / 254)


def test_bilateral_blur_close_to_cv2(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    k, sigma = 9, 180.0
    want = cv2.bilateralFilter(img, k, sigma, sigma).astype(np.float32) / 255.
    got = np.asarray(D.bilateral_blur(
        jnp.asarray(img[None].astype(np.float32) / 255.0), k, sigma,
        sigma))[0]
    b = k // 2
    assert np.abs(got[b:-b, b:-b] - want[b:-b, b:-b]).mean() < 0.02


def test_motion_and_box_kernels():
    k = np.asarray(D.motion_line_kernel(21, jnp.int32(11), jnp.bool_(True)))
    assert k.sum() == pytest.approx(1.0, rel=1e-5)
    assert (k[10, 5:16] > 0).all() and k[9].sum() == 0
    b = np.asarray(D.box_kernel(21, jnp.int32(11)))
    assert b.sum() == pytest.approx(1.0, rel=1e-5)
    assert b[5, 5] > 0 and b[4, 4] == 0


def test_pyblur_bank_valid():
    bank = build_pyblur_bank()
    assert bank.shape[1:] == (21, 21)
    np.testing.assert_allclose(bank.sum(axis=(1, 2)), 1.0, rtol=1e-4)
    assert bank.shape[0] > 100  # box+disk+gauss+lines+100 psfs


def test_random_mixed_kernel_jits(rng):
    cfg = FFHQDegradationConfig()
    bank = jnp.asarray(build_pyblur_bank())

    @jax.jit
    def draw(key):
        k, idx = D.random_mixed_kernel(
            key, cfg.kernel_list, cfg.kernel_prob, pad_to=21,
            kernel_size_range=(11, 21), sigma_x_range=(0.1, 10),
            sigma_y_range=(0.1, 10), extra_bank=bank)
        return k, idx

    seen = set()
    for i in range(20):
        k, idx = draw(jax.random.PRNGKey(i))
        assert np.isfinite(np.asarray(k)).all()
        np.testing.assert_allclose(np.asarray(k).sum(), 1.0, rtol=1e-3)
        seen.add(int(idx))
    assert len(seen) >= 4  # multiple kernel families drawn


def test_gaussian_noise_statistics():
    key = jax.random.PRNGKey(0)
    img = jnp.full((4, 64, 64, 3), 0.5)
    out = D.add_gaussian_noise(key, img, sigma_range=(10, 10), gray_prob=0.0)
    std = float(jnp.std(out - img))
    assert abs(std - 10 / 255) < 0.002


def test_poisson_noise_runs():
    key = jax.random.PRNGKey(0)
    img = jnp.full((2, 32, 32, 3), 0.5)
    out = D.add_poisson_noise(key, img, scale_range=(1.0, 1.0))
    assert out.shape == img.shape
    assert float(jnp.std(out - img)) > 0.01


def test_ffhq_pipeline_jits_and_degrades(rng):
    cfg = FFHQDegradationConfig()
    degrade = jax.jit(make_ffhq_degradation(cfg))
    gt = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    lq, gt_n = degrade(jax.random.PRNGKey(0), gt)
    assert lq.shape == gt.shape
    # normalized to (−1,1)
    assert float(lq.min()) >= -1.001 and float(lq.max()) <= 1.001
    # degraded: lq differs substantially from gt
    assert float(jnp.abs(lq - gt_n).mean()) > 0.01
    # deterministic per key
    lq2, _ = degrade(jax.random.PRNGKey(0), gt)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lq2))


def test_realesrgan_pipeline_jits(rng):
    cfg = RealESRGANDegradationConfig(scale=4)
    degrade = jax.jit(make_realesrgan_degradation(cfg))
    gt = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    lq, gt_out = degrade(jax.random.PRNGKey(1), gt)
    assert lq.shape == (2, 16, 16, 3)
    assert gt_out.shape == gt.shape
    assert np.isfinite(np.asarray(lq)).all()


def test_perspective_roundtrip_runs(rng):
    gt = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    out = D.perspective_roundtrip(jax.random.PRNGKey(0), gt)
    assert out.shape == gt.shape
    assert np.isfinite(np.asarray(out)).all()
    # destroys some information but stays in range
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.001


def test_measured_psf_bank_matches_pickle():
    """assets/psf_bank.npz carries the reference psf.pkl kernels exactly
    (mass + support), modulo lossless centering on the 21-canvas."""
    from image_restoration_tpu.data.pyblur_bank import (
        measured_psf_kernels, build_pyblur_bank, PAD)
    bank = measured_psf_kernels()
    assert len(bank) == 100
    for k in bank:
        assert k.shape == (PAD, PAD)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-5)
    # the measured PSFs must be part of the default bank
    full = build_pyblur_bank()
    np.testing.assert_allclose(full[-100:], np.stack(bank), atol=1e-7)

    import os.path as osp
    pkl = ("/root/reference/Car_Plate-Restoration/basicsr/data/pyblur/"
           "pyblur/psf.pkl")
    if not osp.exists(pkl):
        pytest.skip("reference psf.pkl not mounted")
    import pickle
    with open(pkl, "rb") as f:
        ref = pickle.load(f, encoding="latin1")
    for i in range(100):
        a = np.asarray(ref[i], np.float32)
        a = a / a.sum()
        s = a.shape[0]
        if s <= PAD:
            o = (PAD - s) // 2
            want = np.zeros((PAD, PAD), np.float32)
            want[o:o + s, o:o + s] = a
        else:
            o = (s - PAD) // 2
            want = a[o:o + PAD, o:o + PAD]
            want = want / want.sum()
        np.testing.assert_allclose(bank[i], want, atol=1e-6,
                                   err_msg=f"psf {i}")


def test_nonlinear_blur_slots():
    """Slot-capped median/bilateral == full-batch path when the number of
    drawn samples fits the slots; overflow samples keep the linear value."""
    import image_restoration_tpu.data.degradations as D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    kl = ("iso", "median", "bilateral")
    key = jax.random.PRNGKey(3)
    tidx = jnp.asarray([1, 0, 2, 1, 0, 0, 0, 0])
    exact = D.apply_nonlinear_blur(x, tidx, kl, key, ksize=7, slots=None)
    slot = D.apply_nonlinear_blur(x, tidx, kl, key, ksize=7, slots=4)
    # median is sort-based (exact); the bilateral exp/accumulate may
    # differ at ulp level between the two program shapes on TPU
    assert float(jnp.max(jnp.abs(exact - slot))) < 1e-6
    # overflow: 5 medians into 4 slots -> exactly one sample differs
    tidx2 = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 2])
    exact2 = D.apply_nonlinear_blur(x, tidx2, kl, key, ksize=7, slots=None)
    slot2 = D.apply_nonlinear_blur(x, tidx2, kl, key, ksize=7, slots=4)
    per = np.abs(np.asarray(exact2 - slot2)).reshape(8, -1).max(1)
    assert int((per > 1e-6).sum()) == 1
