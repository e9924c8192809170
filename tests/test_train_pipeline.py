"""End-to-end training pipeline test: real YAML config, real image folder,
full train_pipeline for a handful of iterations on the CPU mesh."""

import os

import pytest
import numpy as np
import cv2
import yaml

pytestmark = pytest.mark.slow  # minutes-long: compile-heavy train steps


CONFIG = """
name: debug_tiny_gfpgan
model_type: GFPGANModel
manual_seed: 0
num_devices: 1

datasets:
  train:
    name: tiny
    type: FFHQDegradationDataset
    dataroot_gt: {root}/gt
    io_backend:
      type: disk
    use_hflip: false
    mean: [0.5, 0.5, 0.5]
    std: [0.5, 0.5, 0.5]
    input_width: 32
    input_height: 32
    blur_kernel_size: 21
    min_kernel_size: 11
    kernel_list: ['iso', 'aniso']
    kernel_prob: [0.5, 0.5]
    blur_sigma: [0.1, 10]
    downsample_range: [2.0, 4.0]
    noise_range: [0, 20]
    jpeg_range: [30, 100]
    color_jitter_prob: 0.3
    color_jitter_shift: 20
    color_jitter_pt_prob: ~
    gray_prob: 0.01
    batch_size_per_gpu: 2
    num_worker_per_gpu: 1
    dataset_enlarge_ratio: 1

  val:
    name: tinyval
    type: FFHQDegradationDataset
    dataroot_gt: {root}/gt
    io_backend:
      type: disk
    mean: [0.5, 0.5, 0.5]
    std: [0.5, 0.5, 0.5]
    input_width: 32
    input_height: 32
    kernel_list: ['iso', 'aniso']
    kernel_prob: [0.5, 0.5]
    blur_sigma: [0.1, 10]
    downsample_range: [2.0, 4.0]
    noise_range: [0, 20]
    jpeg_range: [30, 100]
    use_hflip: false

network_g:
  type: GFPGANv1OCR
  input_width: 32
  input_height: 32
  num_style_feat: 16
  channel_multiplier: 0.25
  num_mlp: 2
  input_is_latent: true
  different_w: true
  narrow: 0.5
  sft_half: true
  fix_decoder: false

network_d:
  type: StyleGAN2Discriminator
  input_width: 32
  input_height: 32
  channel_multiplier: 0.25
  narrow: 0.25

path:
  pretrain_network_g: ~

train:
  optim_g:
    type: Adam
    lr: !!float 2e-3
  optim_d:
    type: Adam
    lr: !!float 2e-3
  scheduler:
    type: MultiStepLR
    milestones: [100]
    gamma: 0.5
  total_iter: 4
  warmup_iter: -1
  pixel_opt:
    type: L1Loss
    loss_weight: !!float 1e-1
  L1_opt:
    type: L1Loss
    loss_weight: 1
  pyramid_loss_weight: 1
  remove_pyramid_loss: 100
  gan_opt:
    type: GANLoss
    gan_type: wgan_softplus
    loss_weight: !!float 1e-1
  r1_reg_weight: 10
  net_d_iters: 1
  net_d_init_iters: 0
  net_d_reg_every: 2

val:
  val_freq: 4
  save_img: true
  min_max: [-1, 1]
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 0

logger:
  print_freq: 1
  save_checkpoint_freq: 4
  use_tb_logger: false
"""


def test_train_pipeline_end_to_end(tmp_path):
    from image_restoration_tpu.train import train_pipeline

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    rng = np.random.default_rng(0)
    for i in range(6):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img_{i}.png"), img)

    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(CONFIG.format(root=tmp_path))

    model = train_pipeline(str(tmp_path), argv=["-opt", str(cfg_path)])
    assert int(model.state["iter"]) == 4
    assert all(np.isfinite(v) for v in model.log_dict.values())
    # checkpoint written
    exp = tmp_path / "experiments" / "debug_tiny_gfpgan" / "models"
    assert any(p.name.startswith("ckpt_") for p in exp.iterdir())
    # validation images saved
    vis = tmp_path / "experiments" / "debug_tiny_gfpgan" / "visualization"
    assert any(vis.iterdir())


def test_train_pipeline_identity_loss(tmp_path):
    """The identity-loss path (configs/train_gfpgan_plate_256_identity.yml
    at production scale) driven end-to-end at tiny shapes: IResNet18
    embeddings on the 112²-resized output, frozen net, l_identity logged
    and finite (ref gfpgan_model.py:185-205,645-657 — broken upstream,
    working here)."""
    from image_restoration_tpu.train import train_pipeline

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    rng = np.random.default_rng(1)
    for i in range(4):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img_{i}.png"), img)

    cfg = yaml.safe_load(CONFIG.format(root=tmp_path))
    cfg["name"] = "debug_tiny_gfpgan_identity"
    cfg["network_identity"] = {"type": "IResNet18", "num_features": 32}
    cfg["train"]["identity_weight"] = 10
    cfg["train"]["total_iter"] = 2
    cfg["val"]["val_freq"] = 100  # skip val: identity is a train-side loss
    cfg["logger"]["save_checkpoint_freq"] = 2
    cfg_path = tmp_path / "tiny_identity.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    model = train_pipeline(str(tmp_path), argv=["-opt", str(cfg_path)])
    assert int(model.state["iter"]) == 2
    assert "l_identity" in model.log_dict
    assert all(np.isfinite(v) for v in model.log_dict.values())
