"""Golden tests: losses and metrics vs the reference implementations."""

import numpy as np
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
