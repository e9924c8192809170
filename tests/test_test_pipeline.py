"""test.py pipeline end-to-end: paired dataset → model → metrics + images."""

import os

import numpy as np
import cv2


CONFIG = """
name: debug_tiny_test
model_type: SRModel
scale: 2
gt_size: 16

datasets:
  test_1:
    name: tinytest
    type: PairedImageDataset
    dataroot_gt: {root}/gt
    dataroot_lq: {root}/lq
    io_backend:
      type: disk

network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2

path:
  pretrain_network_g: ~

val:
  save_img: true
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 2
    ssim:
      type: calculate_ssim
      crop_border: 2
"""


def test_test_pipeline_end_to_end(tmp_path, rng):
    from image_restoration_tpu.test import test_pipeline

    os.makedirs(tmp_path / "gt")
    os.makedirs(tmp_path / "lq")
    for i in range(3):
        gt = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "gt" / f"img_{i}.png"), gt)
        cv2.imwrite(str(tmp_path / "lq" / f"img_{i}.png"), gt[::2, ::2])

    cfg = tmp_path / "test.yml"
    cfg.write_text(CONFIG.format(root=tmp_path))
    results = test_pipeline(str(tmp_path), argv=["-opt", str(cfg)])
    assert "tinytest" in results
    assert np.isfinite(results["tinytest"]["psnr"])
    assert 0 <= results["tinytest"]["ssim"] <= 1
    vis = tmp_path / "results" / "debug_tiny_test" / "visualization"
    assert any(vis.iterdir())
