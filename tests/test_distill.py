"""DistillModel: frozen-teacher knowledge distillation (framework
extension motivated by the measured RRDB serving wall — see
docs/PERFORMANCE.md "RRDB kernel study"). Teacher stays bit-frozen, the
student's distill loss decreases, and the full YAML pipeline drives it."""

import os

import numpy as np
import pytest
import cv2
import yaml

import jax
import jax.numpy as jnp


def _tiny_opt(tmp_path, pixel=True):
    return {
        "is_train": True,
        "manual_seed": 0,
        "num_devices": 1,
        "scale": 2,
        "gt_size": 16,
        "model_type": "DistillModel",
        "path": {"models": str(tmp_path / "models"),
                 "visualization": str(tmp_path / "vis"),
                 "pretrain_network_g": None},
        "logger": {"print_freq": 1},
        "network_g": {"type": "SRVGGNetCompact", "num_feat": 8,
                      "num_conv": 2, "upscale": 2},
        "network_t": {"type": "RRDBNet", "num_feat": 8, "num_block": 1,
                      "num_grow_ch": 4, "scale": 2},
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-3},
            "scheduler": {"type": "MultiStepLR", "milestones": [1000],
                          "gamma": 0.5},
            "total_iter": 1000,
            "ema_decay": 0.9,
            # these tests exercise the MECHANICS at a random teacher
            "allow_random_teacher": True,
            "distill_opt": {"type": "L1Loss", "loss_weight": 1.0},
            **({"pixel_opt": {"type": "L1Loss", "loss_weight": 0.5}}
               if pixel else {}),
        },
    }


def test_distill_refuses_random_init_teacher(tmp_path):
    """Without pretrain_network_t / set_teacher_params /
    allow_random_teacher, the first train step refuses loudly instead of
    silently distilling toward a random teacher's noise."""
    from image_restoration_tpu.models import build_model

    opt = _tiny_opt(tmp_path)
    del opt["train"]["allow_random_teacher"]
    model = build_model(opt)
    rng = np.random.default_rng(0)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}
    with pytest.raises(ValueError, match="random-init teacher"):
        model.optimize_parameters(1, batch, jax.random.PRNGKey(0))
    # installing a teacher programmatically unblocks it
    model.set_teacher_params(model.state["params_t"])
    logs = model.optimize_parameters(1, batch, jax.random.PRNGKey(0))
    assert np.isfinite(logs["l_distill"])


def test_distill_checkpoint_excludes_frozen_teacher(tmp_path):
    """The bit-frozen teacher is reconstructed by __init__, so save()
    must not re-serialize it; resume() must restore training state and
    keep the live teacher."""
    from image_restoration_tpu.models import build_model

    model = build_model(_tiny_opt(tmp_path))
    rng = np.random.default_rng(0)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}
    model.optimize_parameters(1, batch, jax.random.PRNGKey(0))
    model.save(1)
    ckpt = tmp_path / "models" / "ckpt_1"
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(str(ckpt))
    assert "params_t" not in restored
    assert "params_g" in restored and "qscale" not in restored

    model2 = build_model(_tiny_opt(tmp_path))
    t_live = jax.tree.map(np.asarray, model2.state["params_t"])
    model2.resume(str(ckpt))
    assert int(model2.state["iter"]) == 1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 t_live, jax.tree.map(np.asarray,
                                      model2.state["params_t"]))
    # training continues from the restored state
    logs = model2.optimize_parameters(2, batch, jax.random.PRNGKey(1))
    assert np.isfinite(logs["l_distill"])


def test_distill_teacher_frozen_and_loss_decreases(tmp_path):
    from image_restoration_tpu.models import build_model

    model = build_model(_tiny_opt(tmp_path))
    rng = np.random.default_rng(0)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}

    t0 = jax.tree.map(np.asarray, model.state["params_t"])
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        logs = model.optimize_parameters(i + 1, batch, sub)
        losses.append(logs["l_distill"])
        assert all(np.isfinite(v) for v in logs.values())
    assert "l_pix" in logs
    # teacher bit-frozen across steps
    t1 = jax.tree.map(np.asarray, model.state["params_t"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), t0, t1)
    # the distill loss is trending down on the fixed batch
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # EMA moved (it starts at init params, decay 0.9)
    diff = jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        model.state["ema_g"], model.state["params_g"])
    assert max(jax.tree.leaves(diff)) > 0


def test_distill_pulls_student_toward_teacher(tmp_path):
    """With ONLY the distill loss, the student's output moves toward the
    (random, frozen) teacher's output."""
    from image_restoration_tpu.models import build_model

    model = build_model(_tiny_opt(tmp_path, pixel=False))
    rng = np.random.default_rng(1)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}
    lq = jnp.asarray(batch["lq"])

    def student_vs_teacher():
        s = model.net_g.apply({"params": model.state["params_g"]}, lq)
        t = model.net_t.apply({"params": model.state["params_t"]}, lq)
        s, t = (o[0] if isinstance(o, tuple) else o for o in (s, t))
        return float(jnp.mean((s - t) ** 2))

    before = student_vs_teacher()
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, sub = jax.random.split(key)
        model.optimize_parameters(i + 1, batch, sub)
    after = student_vs_teacher()
    assert after < before * 0.7, (before, after)


def test_distill_train_pipeline(tmp_path):
    """configs/train_distill_rrdb_to_srvgg.yml's shape driven end-to-end
    at tiny scale through the real train_pipeline (RealESRGANDataset
    on-device degradation -> teacher+student -> ckpt)."""
    from image_restoration_tpu.train import train_pipeline

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    rng = np.random.default_rng(2)
    for i in range(4):
        img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img_{i}.png"), img)

    with open("configs/train_distill_rrdb_to_srvgg.yml") as f:
        cfg = yaml.safe_load(f)
    cfg["name"] = "debug_tiny_distill"
    cfg["manual_seed"] = 0
    cfg["num_devices"] = 1
    cfg["scale"] = 2
    cfg["datasets"]["train"].update(dataroot_gt=str(gt_dir), gt_size=16,
                                    batch_size_per_gpu=2,
                                    num_worker_per_gpu=1)
    del cfg["datasets"]["val"]
    cfg["network_g"].update(num_feat=8, num_conv=2, upscale=2)
    # keep the shipped `dtype: bf16` teacher — covers the YAML dtype alias
    cfg["network_t"].update(num_feat=8, num_block=1, num_grow_ch=4, scale=2)
    cfg["path"]["pretrain_network_t"] = None
    cfg["train"]["allow_random_teacher"] = True
    cfg["train"]["total_iter"] = 2
    cfg["logger"]["save_checkpoint_freq"] = 2
    cfg["logger"]["use_tb_logger"] = False
    cfg_path = tmp_path / "tiny_distill.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    model = train_pipeline(str(tmp_path), argv=["-opt", str(cfg_path)])
    assert int(model.state["iter"]) == 2
    assert "l_distill" in model.log_dict
    assert all(np.isfinite(v) for v in model.log_dict.values())
    exp = tmp_path / "experiments" / "debug_tiny_distill" / "models"
    assert any(p.name.startswith("ckpt_") for p in exp.iterdir())
