"""Option-zoo coverage: every config under configs/ parses and resolves
against the registries, and one representative per model family actually
steps through train_pipeline on tiny synthetic data.

Mirrors the reference's options/{train,test} zoo (SURVEY §2.11)."""

import glob
import os
from os import path as osp

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # minutes-long: compile-heavy train steps

REPO = osp.normpath(osp.join(osp.dirname(__file__), os.pardir))
CONFIG_ROOT = osp.join(REPO, "configs")
ALL_CONFIGS = sorted(
    glob.glob(osp.join(CONFIG_ROOT, "**", "*.yml"), recursive=True))


# ----------------------------------------------------------- resolve all

@pytest.mark.parametrize(
    "cfg", ALL_CONFIGS, ids=[osp.relpath(c, CONFIG_ROOT)
                             for c in ALL_CONFIGS])
def test_config_resolves(cfg):
    """The config parses, and every `type:` it names exists with kwargs the
    implementation accepts (networks are instantiated, which validates
    their kwargs against the flax dataclass fields)."""
    # importing these modules populates the registries
    from image_restoration_tpu.models import register_all_models
    register_all_models()
    from image_restoration_tpu.data import datasets, video_datasets  # noqa
    import image_restoration_tpu.losses  # noqa: F401
    import image_restoration_tpu.metrics  # noqa: F401
    from image_restoration_tpu.utils.options import parse
    from image_restoration_tpu.utils.registry import (
        MODEL_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY, METRIC_REGISTRY)
    from image_restoration_tpu.archs import build_network

    is_train = "train" in osp.basename(cfg)
    opt = parse(cfg, root_path="/tmp", is_train=is_train)

    assert MODEL_REGISTRY.get(opt["model_type"]) is not None
    for phase, ds in (opt.get("datasets") or {}).items():
        assert DATASET_REGISTRY.get(ds["type"]) is not None, phase
    for key, net_opt in opt.items():
        if key.startswith("network_") and isinstance(net_opt, dict):
            build_network(net_opt)  # raises on unknown kwargs
    train_opt = opt.get("train") or {}
    for key, sub in train_opt.items():
        if key.endswith("_opt") and isinstance(sub, dict) and "type" in sub:
            assert LOSS_REGISTRY.get(sub["type"]) is not None, key
    sched = train_opt.get("scheduler")
    if sched:
        assert sched["type"] in ("MultiStepLR", "MultiStepRestartLR",
                                 "CosineAnnealingRestartLR")
    for name, m in ((opt.get("val") or {}).get("metrics") or {}).items():
        assert METRIC_REGISTRY.get(m["type"]) is not None, name


def test_zoo_mirrors_reference_layout():
    """One ported file per reference option file (59 total)."""
    zoo = [c for c in ALL_CONFIGS
           if osp.relpath(c, CONFIG_ROOT).startswith("options")]
    assert len(zoo) == 59
    families = {osp.basename(osp.dirname(c)) for c in zoo}
    assert {"EDSR", "RCAN", "SRResNet_SRGAN", "ESRGAN", "BasicVSR",
            "EDVR", "DUF", "TOF", "StyleGAN", "HiFaceGAN",
            "VideoRecurrentGAN"} <= families


# ------------------------------------------------------- tiny data makers

def _write_png(path, size, rng):
    import cv2
    os.makedirs(osp.dirname(path), exist_ok=True)
    img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    cv2.imwrite(path, img)


def make_pairs(root, scale, n=4, gt=48, rng=None):
    rng = rng or np.random.default_rng(0)
    for i in range(n):
        _write_png(osp.join(root, "gt", f"im_{i}.png"), gt, rng)
        _write_png(osp.join(root, "lq", f"im_{i}.png"), gt // scale, rng)
    return osp.join(root, "gt"), osp.join(root, "lq")


def make_clips(root, scale, clips=("001", "002"), frames=6, gt=256,
               rng=None):
    rng = rng or np.random.default_rng(0)
    for c in clips:
        for f in range(frames):
            _write_png(osp.join(root, "gt", c, f"{f:08d}.png"), gt, rng)
            _write_png(osp.join(root, "lq", c, f"{f:08d}.png"),
                       gt // scale, rng)
    meta = osp.join(root, "meta.txt")
    with open(meta, "w") as fh:
        for c in clips:
            fh.write(f"{c} {frames} ({gt},{gt},3)\n")
    return osp.join(root, "gt"), osp.join(root, "lq"), meta


def make_vimeo(root, scale, keys=("00001/0001", "00001/0002"), gt=256,
               rng=None):
    rng = rng or np.random.default_rng(0)
    for k in keys:
        for i in range(1, 8):
            _write_png(osp.join(root, "gt", k, f"im{i}.png"), gt, rng)
            _write_png(osp.join(root, "lq", k, f"im{i}.png"),
                       gt // scale, rng)
    meta = osp.join(root, "meta.txt")
    with open(meta, "w") as fh:
        for k in keys:
            fh.write(f"{k} 7 (256,448,3)\n")
    return osp.join(root, "gt"), osp.join(root, "lq"), meta


def make_gtonly(root, n=4, gt=32, rng=None):
    rng = rng or np.random.default_rng(0)
    for i in range(n):
        _write_png(osp.join(root, "gt", f"{i:05d}.png"), gt, rng)
    return osp.join(root, "gt")


# ---------------------------------------------------------- step harness

def _set(opt, dotted, value):
    keys = dotted.split(".")
    node = opt
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    if value is _DEL:
        node.pop(keys[-1], None)
    else:
        node[keys[-1]] = value


_DEL = object()

_COMMON = {
    "num_devices": 1,
    "train.total_iter": 2,
    "train.warmup_iter": -1,
    "logger.use_tb_logger": False,
    "logger.save_checkpoint_freq": 1e9,
    "logger.print_freq": 1,
    "val": _DEL,
    "datasets.val": _DEL,
    "datasets.train.num_worker_per_gpu": 1,
    "datasets.train.batch_size_per_gpu": 2,
    "datasets.train.dataset_enlarge_ratio": 1,
}


def run_zoo_train(zoo_rel, tmp_path, overrides):
    """Load a zoo config, shrink it, and run 2 real iterations."""
    from image_restoration_tpu.train import train_pipeline

    with open(osp.join(CONFIG_ROOT, zoo_rel)) as f:
        opt = yaml.safe_load(f)
    for k, v in {**_COMMON, **overrides}.items():
        _set(opt, k, v)
    opt["name"] = "debug_zoo_" + osp.splitext(osp.basename(zoo_rel))[0]
    cfg = tmp_path / "opt.yml"
    cfg.write_text(yaml.dump(opt, sort_keys=False))
    model = train_pipeline(str(tmp_path), argv=["-opt", str(cfg)])
    assert int(model.state["iter"]) == 2
    assert all(np.isfinite(v) for v in model.log_dict.values()), \
        model.log_dict
    return model


# ---------------------------------------------------------- SISR families

def test_zoo_edsr_steps(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=2)
    run_zoo_train("options/train/EDSR/train_EDSR_Mx2.yml", tmp_path, {
        "datasets.train.dataroot_gt": gt,
        "datasets.train.dataroot_lq": lq,
        "datasets.train.gt_size": 32,
        "network_g.num_feat": 8, "network_g.num_block": 1,
    })


def test_zoo_rcan_steps(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=2)
    run_zoo_train("options/train/RCAN/train_RCAN_x2.yml", tmp_path, {
        "datasets.train.dataroot_gt": gt,
        "datasets.train.dataroot_lq": lq,
        "datasets.train.gt_size": 32,
        "network_g.num_feat": 8, "network_g.num_group": 1,
        "network_g.num_block": 1, "network_g.squeeze_factor": 4,
        "network_g.upscale": 2,  # the reference yml ships upscale 4 at
        # scale 2 (a known quirk); align for the shape check
    })


def test_zoo_msrresnet_steps(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=4)
    run_zoo_train(
        "options/train/SRResNet_SRGAN/train_MSRResNet_x4.yml", tmp_path, {
            "datasets.train.dataroot_gt": gt,
            "datasets.train.dataroot_lq": lq,
            "datasets.train.gt_size": 32,
            "network_g.num_feat": 8, "network_g.num_block": 1,
            "path.pretrain_network_g": None,
        })


def test_zoo_msrgan_steps(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=4)
    run_zoo_train(
        "options/train/SRResNet_SRGAN/train_MSRGAN_x4.yml", tmp_path, {
            "datasets.train.dataroot_gt": gt,
            "datasets.train.dataroot_lq": lq,
            "datasets.train.gt_size": 32,
            "network_g.num_feat": 8, "network_g.num_block": 1,
            "network_d.num_feat": 8, "network_d.input_size": 32,
            "path.pretrain_network_g": None,
        })


def test_zoo_esrgan_steps(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=4)
    run_zoo_train("options/train/ESRGAN/train_ESRGAN_x4.yml", tmp_path, {
        "datasets.train.dataroot_gt": gt,
        "datasets.train.dataroot_lq": lq,
        "datasets.train.gt_size": 32,
        "network_g.num_feat": 8, "network_g.num_block": 1,
        "network_d.num_feat": 8, "network_d.input_size": 32,
        "path.pretrain_network_g": None,
    })


# --------------------------------------------------------- video families

def test_zoo_basicvsr_steps(tmp_path):
    gt, lq, meta = make_clips(str(tmp_path / "d"), scale=4)
    run_zoo_train("options/train/BasicVSR/train_BasicVSR_REDS.yml",
                  tmp_path, {
                      "datasets.train.dataroot_gt": gt,
                      "datasets.train.dataroot_lq": lq,
                      "datasets.train.meta_info_file": meta,
                      "datasets.train.val_partition": [],
                      "datasets.train.num_frame": 3,
                      "datasets.train.batch_size_per_gpu": 1,
                      "network_g.num_feat": 8, "network_g.num_block": 1,
                      "network_g.spynet_path": None,
                  })


def test_zoo_iconvsr_vimeo_steps(tmp_path):
    gt, lq, meta = make_vimeo(str(tmp_path / "d"), scale=4)
    run_zoo_train(
        "options/train/BasicVSR/train_IconVSR_Vimeo90K_BDx4.yml",
        tmp_path, {
            "datasets.train.dataroot_gt": gt,
            "datasets.train.dataroot_lq": lq,
            "datasets.train.meta_info_file": meta,
            "datasets.train.flip_sequence": False,
            "datasets.train.batch_size_per_gpu": 1,
            "network_g.num_feat": 8, "network_g.num_block": 1,
            "network_g.spynet_path": None,
            "network_g.edvr_path": None,
        })


def test_zoo_edvr_steps(tmp_path):
    gt, lq, meta = make_clips(str(tmp_path / "d"), scale=4, gt=32)
    run_zoo_train("options/train/EDVR/train_EDVR_M_x4_SR_REDS.yml",
                  tmp_path, {
                      "datasets.train.dataroot_gt": gt,
                      "datasets.train.dataroot_lq": lq,
                      "datasets.train.meta_info_file": meta,
                      "datasets.train.val_partition": [],
                      "datasets.train.gt_size": 32,
                      "network_g.num_feat": 8,
                      "network_g.deformable_groups": 2,
                      "network_g.num_extract_block": 1,
                      "network_g.num_reconstruct_block": 1,
                      "path.pretrain_network_g": None,
                      "path.strict_load_g": True,
                      "train.tsa_iter": 2,  # exercise the warmup phase
                  })


def test_zoo_video_recurrent_gan_steps(tmp_path):
    gt, lq, meta = make_clips(str(tmp_path / "d"), scale=4)
    run_zoo_train(
        "options/train/VideoRecurrentGAN/"
        "train_VideoRecurrentGANModel_REDS.yml", tmp_path, {
            "datasets.train.dataroot_gt": gt,
            "datasets.train.dataroot_lq": lq,
            "datasets.train.meta_info_file": meta,
            "datasets.train.val_partition": [],
            "datasets.train.num_frame": 3,
            "datasets.train.batch_size_per_gpu": 1,
            "network_g.num_feat": 8, "network_g.num_block": 1,
            "network_g.spynet_path": None,
            "network_d.num_feat": 8, "network_d.input_size": 256,
            "path.pretrain_network_g": None,
        })


# ----------------------------------------------------------- GAN families

def test_zoo_stylegan2_steps(tmp_path):
    gt = make_gtonly(str(tmp_path / "d"), gt=32)
    run_zoo_train("options/train/StyleGAN/"
                  "train_StyleGAN2_256_Cmul2_FFHQ.yml", tmp_path, {
                      "datasets.train.dataroot_gt": gt,
                      "datasets.train.io_backend": {"type": "disk"},
                      "network_g.out_size": 32,
                      "network_g.num_style_feat": 16,
                      "network_g.num_mlp": 2,
                      "network_g.channel_multiplier": 0.25,
                      "network_d.out_size": 32,
                      "network_d.channel_multiplier": 0.25,
                      "train.net_d_reg_every": 2,
                      "train.net_g_reg_every": 2,
                  })


def test_zoo_hifacegan_steps(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=1, gt=64)
    run_zoo_train("options/train/HiFaceGAN/train_hifacegan.yml",
                  tmp_path, {
                      "datasets.train.dataroot_gt": gt,
                      "datasets.train.dataroot_lq": lq,
                      "datasets.train.gt_size": 64,
                      "datasets.train.batch_size_per_gpu": 1,
                      "network_g.num_feat": 8,
                      "network_d.num_feat": 8,
                      "network_d.n_layers_d": 2,
                  })


# ------------------------------------------------------ test-side pipeline

def run_zoo_test(zoo_rel, tmp_path, overrides):
    from image_restoration_tpu.test import test_pipeline

    with open(osp.join(CONFIG_ROOT, zoo_rel)) as f:
        opt = yaml.safe_load(f)
    for k, v in {"num_devices": 1, "path.pretrain_network_g": None,
                 **overrides}.items():
        _set(opt, k, v)
    opt["name"] = "zoo_" + osp.splitext(osp.basename(zoo_rel))[0]
    cfg = tmp_path / "opt.yml"
    cfg.write_text(yaml.dump(opt, sort_keys=False))
    results = test_pipeline(str(tmp_path), argv=["-opt", str(cfg)])
    for name, metrics in results.items():
        assert all(np.isfinite(v) for v in metrics.values()), (name,
                                                               metrics)
    return results


def test_zoo_msrresnet_test_pipeline(tmp_path):
    gt, lq = make_pairs(str(tmp_path / "d"), scale=4, gt=32)
    run_zoo_test(
        "options/test/SRResNet_SRGAN/test_MSRResNet_x4.yml", tmp_path, {
            "datasets.test_1.dataroot_gt": gt,
            "datasets.test_1.dataroot_lq": lq,
            "datasets.test_2": _DEL, "datasets.test_3": _DEL,
            "network_g.num_feat": 8, "network_g.num_block": 1,
        })


def test_zoo_basicvsr_vimeo_test_pipeline(tmp_path):
    """Covers VideoTestVimeo90KDataset + flip_seq + center_frame_only."""
    gt, lq, meta = make_vimeo(str(tmp_path / "d"), scale=4, gt=256)
    run_zoo_test(
        "options/test/BasicVSR/test_BasicVSR_Vimeo90K_BIx4.yml",
        tmp_path, {
            "datasets.test_1.dataroot_gt": gt,
            "datasets.test_1.dataroot_lq": lq,
            "datasets.test_1.meta_info_file": meta,
            "network_g.num_feat": 8, "network_g.num_block": 1,
            "network_g.spynet_path": None,
        })


def test_zoo_duf_test_pipeline(tmp_path):
    gt, lq, meta = make_clips(str(tmp_path / "d"), scale=4, clips=("c",),
                              frames=8, gt=32)
    run_zoo_test("options/test/DUF/test_DUF_official.yml", tmp_path, {
        "datasets.test.dataroot_gt": gt,
        "datasets.test.dataroot_lq": lq,
        "network_g.num_layer": 16,
    })
