"""Video + HiFaceGAN trainer smoke tests: one optimization step each."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.models import build_model

pytestmark = pytest.mark.slow  # minutes-long: compile-heavy train steps


def _base_opt(tmp_path):
    return {
        "is_train": True, "manual_seed": 0, "num_devices": 1,
        "path": {"models": str(tmp_path / "m"),
                 "visualization": str(tmp_path / "v")},
        "logger": {"print_freq": 1},
    }


def test_video_base_model_step(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "VideoBaseModel",
        "scale": 4, "gt_size": 32,
        "datasets": {"train": {"num_frame": 3, "gt_size": 32}},
        "network_g": dict(type="EDVR", num_feat=8, num_frame=3,
                          deformable_groups=2, num_extract_block=1,
                          num_reconstruct_block=1),
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4}, "total_iter": 2,
                  "pixel_opt": {"type": "L1Loss"}},
    })
    model = build_model(opt)
    rng = np.random.default_rng(0)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32)
    lq = rng.random((2, 3, 8, 8, 3)).astype(np.float32)
    out = model.optimize_parameters(1, {"lq": lq, "gt": gt},
                                    jax.random.PRNGKey(0))
    assert np.isfinite(out["l_pix"])


def test_video_recurrent_model_step(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "VideoRecurrentModel",
        "scale": 4, "gt_size": 256,  # lq 64² (SpyNet needs ≥64² inputs)
        "datasets": {"train": {"num_frame": 3, "gt_size": 256}},
        "network_g": dict(type="BasicVSR", num_feat=8, num_block=1),
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4}, "total_iter": 2,
                  "flow_lr_mul": 0.125,
                  "pixel_opt": {"type": "CharbonnierLoss"}},
    })
    model = build_model(opt)
    rng = np.random.default_rng(0)
    lq = rng.random((1, 3, 64, 64, 3)).astype(np.float32)
    gt = rng.random((1, 3, 256, 256, 3)).astype(np.float32)
    out = model.optimize_parameters(1, {"lq": lq, "gt": gt},
                                    jax.random.PRNGKey(0))
    assert np.isfinite(out["l_pix"])


def test_hifacegan_model_step(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "HiFaceGANModel",
        "scale": 1, "gt_size": 32,
        "network_g": dict(type="SPADEGenerator", num_feat=8, scale_ratio=2,
                          init_train_phase=0),
        "network_d": dict(type="HiFaceGANDiscriminator", num_feat=8,
                          num_d=2, n_layers_d=2),
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-4},
            "optim_d": {"type": "Adam", "lr": 1e-4},
            "total_iter": 2,
            "pixel_opt": {"type": "L1Loss"},
            "gan_opt": {"type": "MultiScaleGANLoss", "gan_type": "hinge"},
            "feat_opt": {"type": "GANFeatLoss", "criterion": "l1",
                         "loss_weight": 10.0},
            "net_d_iters": 1, "net_d_init_iters": 0,
        },
    })
    model = build_model(opt)
    rng = np.random.default_rng(1)
    lq = rng.random((2, 32, 32, 3)).astype(np.float32)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32)
    out = model.optimize_parameters(1, {"lq": lq, "gt": gt},
                                    jax.random.PRNGKey(1))
    assert all(np.isfinite(v) for v in out.values()), out


def test_edvr_tsa_warmup_freezes_non_fusion(tmp_path):
    """Ref edvr_model.py:50-60: iters < tsa_iter train ONLY the TSA fusion
    subtree; from tsa_iter on, everything trains. Also dcn_lr_mul wiring."""
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "EDVRModel",
        "scale": 4, "gt_size": 32,
        "datasets": {"train": {"num_frame": 3, "gt_size": 32}},
        "network_g": dict(type="EDVR", num_feat=8, num_frame=3,
                          deformable_groups=2, num_extract_block=1,
                          num_reconstruct_block=1, with_tsa=True),
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3}, "total_iter": 4,
                  "tsa_iter": 3, "dcn_lr_mul": 0.5,
                  "pixel_opt": {"type": "L1Loss"}},
    })
    model = build_model(opt)
    rng = np.random.default_rng(0)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32)
    lq = rng.random((2, 3, 8, 8, 3)).astype(np.float32)

    def deltas(before, after):
        moved, frozen = [], []
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(before)[0],
                jax.tree_util.tree_flatten_with_path(after)[0]):
            names = [getattr(k, "key", str(k)) for k in path]
            (moved if not np.array_equal(a, b) else frozen).append(names)
        return moved, frozen

    p0 = jax.device_get(model.state["params_g"])
    model.optimize_parameters(1, {"lq": lq, "gt": gt}, jax.random.PRNGKey(1))
    model.optimize_parameters(2, {"lq": lq, "gt": gt}, jax.random.PRNGKey(2))
    p2 = jax.device_get(model.state["params_g"])
    moved, frozen = deltas(p0, p2)
    assert moved, "nothing trained during warmup"
    assert all("fusion" in names[0] for names in moved), moved[:3]
    assert any("fusion" not in names[0] for names in frozen)

    model.optimize_parameters(3, {"lq": lq, "gt": gt}, jax.random.PRNGKey(3))
    p3 = jax.device_get(model.state["params_g"])
    moved, _ = deltas(p2, p3)
    assert any("fusion" not in names[0] for names in moved), \
        "full training did not resume at tsa_iter"
