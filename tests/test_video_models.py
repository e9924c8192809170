"""Video + HiFaceGAN trainer smoke tests: one optimization step each."""

import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.models import build_model


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
        "network_g": dict(type="SPADEGenerator", num_feat=8, ups_num=2),
        "network_d": dict(type="HiFaceGANDiscriminator", num_feat=8,
                          num_d=2, n_layers=2),
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
