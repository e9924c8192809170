"""Golden tests: losses and metrics vs the reference implementations."""

import numpy as np
from os import path as osp
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref_module
from image_restoration_tpu.losses import (L1Loss, MSELoss, CharbonnierLoss,
                                          SobelLoss, WMSELoss, WeightedTVLoss,
                                          GANLoss, r1_penalty)
from image_restoration_tpu.metrics import calculate_psnr, calculate_ssim
from image_restoration_tpu.metrics.psnr_ssim import psnr_batch, ssim_batch


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(7)
    a = rng.random((2, 3, 24, 24)).astype(np.float32)
    b = rng.random((2, 3, 24, 24)).astype(np.float32)
    return a, b


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_elementwise_losses_match_reference(imgs):
    ref = load_ref_module("losses.losses")
    a, b = imgs
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    pairs = [
        (L1Loss(0.7), ref.L1Loss(0.7)),
        (MSELoss(1.3), ref.MSELoss(1.3)),
        (CharbonnierLoss(1.1), ref.CharbonnierLoss(1.1)),
        (SobelLoss(0.5), ref.SobelLoss(0.5)),
        (WMSELoss(0.9), ref.WMSELoss(0.9)),
    ]
    for ours, theirs in pairs:
        want = float(theirs(ta, tb))
        got = float(ours(_nhwc(a), _nhwc(b)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_weighted_tv_matches_reference(imgs):
    ref = load_ref_module("losses.losses")
    a, _ = imgs
    w = np.ones_like(a)
    want = float(ref.WeightedTVLoss(1.0)(torch.from_numpy(a),
                                         torch.from_numpy(w)))
    got = float(WeightedTVLoss(1.0)(_nhwc(a), _nhwc(w)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("gan_type", ["vanilla", "lsgan", "wgan",
                                      "wgan_softplus", "hinge"])
@pytest.mark.parametrize("target_is_real,is_disc", [
    (True, True), (False, True), (True, False)])
def test_gan_loss_matches_reference(gan_type, target_is_real, is_disc):
    ref = load_ref_module("losses.losses")
    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, 1)).astype(np.float32)
    want = float(ref.GANLoss(gan_type, loss_weight=0.8)(
        torch.from_numpy(x), target_is_real, is_disc=is_disc))
    got = float(GANLoss(gan_type, loss_weight=0.8)(
        jnp.asarray(x), target_is_real, is_disc=is_disc))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_r1_penalty_matches_reference(imgs):
    ref = load_ref_module("losses.losses")
    a, _ = imgs

    # simple differentiable D: sum of squares
    def d_jax(x):
        return jnp.sum(x ** 2, axis=(1, 2, 3)) * 0.5

    got = float(r1_penalty(d_jax, _nhwc(a)))

    ta = torch.from_numpy(a).requires_grad_(True)
    out = (ta ** 2).sum(dim=(1, 2, 3)) * 0.5
    want = float(ref.r1_penalty(out, ta))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_psnr_ssim_match_reference():
    ref = load_ref_module("metrics.psnr_ssim")
    rng = np.random.default_rng(3)
    img = (rng.random((48, 64, 3)) * 255).round().astype(np.float64)
    img2 = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).round()
    for y in (False, True):
        want = ref.calculate_psnr(img, img2, crop_border=4, test_y_channel=y)
        got = calculate_psnr(img, img2, crop_border=4, test_y_channel=y)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        want = ref.calculate_ssim(img, img2, crop_border=4, test_y_channel=y)
        got = calculate_ssim(img, img2, crop_border=4, test_y_channel=y)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_device_metrics_close_to_host():
    rng = np.random.default_rng(5)
    pred = rng.random((2, 48, 48, 3)).astype(np.float32)
    gt = np.clip(pred + rng.normal(0, 0.05, pred.shape), 0, 1).astype(
        np.float32)
    dev_psnr = np.asarray(psnr_batch(jnp.asarray(pred), jnp.asarray(gt)))
    for i in range(2):
        host = calculate_psnr((pred[i] * 255), (gt[i] * 255), crop_border=0)
        np.testing.assert_allclose(dev_psnr[i], host, rtol=1e-3)
    dev_ssim = np.asarray(ssim_batch(jnp.asarray(pred), jnp.asarray(gt)))
    assert np.all(dev_ssim > 0.5) and np.all(dev_ssim <= 1.0)


@pytest.mark.slow  # 103s; VGG16 compile
def test_lpips_metric_properties():
    """LPIPS (uncalibrated weights): zero on identical, >0 on different,
    symmetric; registered-metric path handles BGR uint8 convention."""
    import warnings
    from image_restoration_tpu.metrics.lpips import LPIPS, calculate_lpips

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn = LPIPS()
    rng = np.random.default_rng(0)
    a = rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1
    b = np.clip(a + rng.normal(0, 0.3, a.shape), -1, 1).astype(np.float32)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)
    dab, dba = fn(a, b), fn(b, a)
    assert dab > 1e-4
    assert dab == pytest.approx(dba, rel=1e-4)
    # registry path (uint8 BGR in [0,255])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        img2 = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        d = calculate_lpips(img, img2)
    assert np.isfinite(d) and d > 0


def test_niqe_params_bundled():
    """metrics/assets/niqe_pris_params.npz ships in-repo; NIQE runs with
    no /root/reference dependency."""
    from image_restoration_tpu.metrics.niqe import (_DEFAULT_PARAMS,
                                                    calculate_niqe)
    assert "/root/reference" not in _DEFAULT_PARAMS
    assert osp.exists(_DEFAULT_PARAMS)
    rng = np.random.default_rng(0)
    img = (rng.random((192, 192, 3)) * 255).astype(np.uint8)
    v = calculate_niqe(img, crop_border=0)
    assert np.isfinite(v)


def test_niqe_core_matches_reference_module():
    """niqe_core golden vs basicsr/metrics/niqe.py:65-130 at the bundled
    pristine params (same gray input, |diff| < 1e-9)."""
    ref_path = ("/root/reference/Car_Plate-Restoration/basicsr/metrics/"
                "niqe.py")
    if not osp.exists(ref_path):
        pytest.skip("reference not mounted")
    import importlib.util
    import sys
    import types

    import scipy.ndimage
    filters = types.ModuleType("scipy.ndimage.filters")
    filters.convolve = scipy.ndimage.convolve
    sys.modules.setdefault("scipy.ndimage.filters", filters)
    saved = {k: sys.modules.get(k) for k in
             ("basicsr", "basicsr.metrics", "basicsr.metrics.metric_util",
              "basicsr.utils", "basicsr.utils.registry")}
    try:
        pkg_b = types.ModuleType("basicsr")
        pkg_m = types.ModuleType("basicsr.metrics")
        mu_mod = types.ModuleType("basicsr.metrics.metric_util")
        mu_mod.reorder_image = lambda img, input_order="HWC": img
        mu_mod.to_y_channel = lambda img: img
        reg = types.ModuleType("basicsr.utils.registry")

        class _R:
            def register(self, f=None):
                return f if f else (lambda g: g)

        reg.METRIC_REGISTRY = _R()
        sys.modules.update({
            "basicsr": pkg_b, "basicsr.metrics": pkg_m,
            "basicsr.metrics.metric_util": mu_mod,
            "basicsr.utils": types.ModuleType("basicsr.utils"),
            "basicsr.utils.registry": reg})
        spec = importlib.util.spec_from_file_location("ref_niqe", ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    from image_restoration_tpu.metrics.niqe import niqe_core, _DEFAULT_PARAMS
    p = np.load(_DEFAULT_PARAMS)
    rng = np.random.default_rng(0)
    img = np.round(rng.random((288, 384)) * 255).astype(np.float64)
    want = float(np.squeeze(ref.niqe(
        img.copy(), p["mu_pris_param"], p["cov_pris_param"],
        p["gaussian_window"])))
    got = niqe_core(img.copy(), np.ravel(p["mu_pris_param"]),
                    p["cov_pris_param"], p["gaussian_window"])
    assert abs(want - got) < 1e-9


def test_vgg16_feature_extractor_taps():
    from image_restoration_tpu.archs.vgg_arch import VGGFeatureExtractor
    net = VGGFeatureExtractor(
        layer_name_list=("relu1_2", "relu3_3", "relu5_3"), vgg_type="vgg16")
    x = jnp.zeros((1, 64, 64, 3))
    out = jax.jit(net.init_with_output, static_argnums=())(
        jax.random.PRNGKey(0), x)[0]
    assert out["relu1_2"].shape == (1, 64, 64, 64)
    assert out["relu3_3"].shape == (1, 16, 16, 256)
    assert out["relu5_3"].shape == (1, 4, 4, 512)


def test_calculate_fid_golden_vs_reference():
    """Fréchet-distance math golden vs the reference's calculate_fid
    (basicsr/metrics/fid.py:50-80) on random non-diagonal Gaussians,
    plus the FID(X, X) = 0 identity."""
    from ref_loader import load_ref_module
    ref = load_ref_module("metrics.fid")
    from image_restoration_tpu.metrics.fid import calculate_fid

    rng = np.random.default_rng(3)
    d = 32
    for trial in range(3):
        mu1, mu2 = rng.normal(size=(2, d))
        a = rng.normal(size=(d, d + 4))
        b = rng.normal(size=(d, d + 4))
        s1, s2 = a @ a.T / d, b @ b.T / d
        want = float(ref.calculate_fid(mu1, s1, mu2, s2))
        got = float(calculate_fid(mu1, s1, mu2, s2))
        assert abs(want - got) <= 1e-9 * max(1.0, abs(want)), (want, got)
    assert abs(float(calculate_fid(mu1, s1, mu1, s1))) < 1e-6
