"""PSNR / SSIM — parity with basicsr/metrics/psnr_ssim.py:9-128.

Host (numpy/float64) implementations for exact reference-comparable scores,
plus jittable batch variants (`psnr_batch`, `ssim_batch`) for on-device
validation inside the training loop.

Reference semantics: inputs are HWC images in [0, 255] (BGR when color),
`crop_border` strips edges, `test_y_channel` converts to the MATLAB Y
channel first. SSIM uses an 11×11 σ=1.5 gaussian window per channel.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image, to_y_channel


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border: int, input_order: str = "HWC",
                   test_y_channel: bool = False, **kwargs) -> float:
    assert img.shape == img2.shape
    img = reorder_image(np.asarray(img), input_order).astype(np.float64)
    img2 = reorder_image(np.asarray(img2), input_order).astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img, img2 = to_y_channel(img), to_y_channel(img2)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g)


def _ssim_single(img: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM on [0,255] float64 (ref psnr_ssim.py:49-81)."""
    import cv2
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border: int, input_order: str = "HWC",
                   test_y_channel: bool = False, **kwargs) -> float:
    assert img.shape == img2.shape
    img = reorder_image(np.asarray(img), input_order).astype(np.float64)
    img2 = reorder_image(np.asarray(img2), input_order).astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img, img2 = to_y_channel(img), to_y_channel(img2)
    return float(np.mean([_ssim_single(img[..., i], img2[..., i])
                          for i in range(img.shape[2])]))


# ----------------------------------------------------- jittable (on-device)


def psnr_batch(pred: jax.Array, gt: jax.Array, max_val: float = 1.0):
    """Per-sample PSNR of NHWC batches in [0, max_val] (device metric)."""
    mse = jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))
    return 20.0 * jnp.log10(max_val / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def ssim_batch(pred: jax.Array, gt: jax.Array, max_val: float = 1.0):
    """Per-sample SSIM of NHWC batches (11×11 σ=1.5 window, device metric)."""
    window = jnp.asarray(_gaussian_window(), pred.dtype)
    c = pred.shape[-1]
    w = jnp.tile(window[:, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")

    def f(x):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                            dimension_numbers=dn,
                                            feature_group_count=c)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu1, mu2 = f(pred), f(gt)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = f(pred ** 2) - mu1_sq
    s2 = f(gt ** 2) - mu2_sq
    s12 = f(pred * gt) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map, axis=(1, 2, 3))
