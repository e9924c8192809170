"""Mask suite + OCR dataset pipeline tests."""

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from image_restoration_tpu.data.masks import (random_rect_masks, half_mask,
                                              build_irregular_mask_bank,
                                              apply_random_mask)
from image_restoration_tpu.data import build_dataset


def test_rect_masks(rng):
    m = np.asarray(random_rect_masks(jax.random.PRNGKey(0), (2, 32, 32, 3)))
    assert m.shape == (2, 32, 32, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert 0 < m.mean() < 1


def test_half_mask():
    m = np.asarray(half_mask(jax.random.PRNGKey(1), (4, 16, 16, 3)))
    np.testing.assert_allclose(m.mean(axis=(1, 2, 3)), 0.5)


def test_irregular_bank():
    bank = build_irregular_mask_bank(32, num=8)
    assert bank.shape == (8, 32, 32, 1)
    assert (bank.mean(axis=(1, 2, 3)) > 0).all()


def test_apply_random_mask(rng):
    bank = jnp.asarray(build_irregular_mask_bank(16, num=4))
    img = jnp.zeros((4, 16, 16, 3))
    out, mask = apply_random_mask(jax.random.PRNGKey(0), img, bank,
                                  mask_prob=1.0, fill=1.0)
    assert float(mask.max()) == 1.0
    # masked pixels filled with 1.0
    assert float(jnp.max(out)) == 1.0


def test_ocr_dataset_pipeline(tmp_path, rng):
    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    for i in range(3):
        cv2.imwrite(str(gt_dir / f"{i}.png"),
                    (rng.random((20, 50, 3)) * 255).astype(np.uint8))
    ds = build_dataset(dict(
        type="OCRDegradationDataset", dataroot_gt=str(gt_dir),
        io_backend={"type": "disk"}, input_width=32, input_height=32,
        kernel_list=["iso", "aniso"], kernel_prob=[0.5, 0.5],
        blur_sigma=[0.1, 3], downsample_range=[2, 4],
        noise_range=[0, 10], jpeg_range=[60, 95], random_mask=True,
        pad_input=True, mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5]))
    sample = ds[0]
    assert sample["gt"].shape == (32, 32, 3)
    degrade = jax.jit(ds.device_pipeline())
    gt = jnp.asarray(np.stack([ds[i]["gt"] for i in range(2)]))
    lq, gt_n = degrade(jax.random.PRNGKey(0), gt)
    assert lq.shape == gt.shape
    assert np.isfinite(np.asarray(lq)).all()
