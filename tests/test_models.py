"""Trainer smoke tests: tiny models, a few optimization steps on the
8-device CPU mesh; losses must be finite and decrease for the plain SR case."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from image_restoration_tpu.models import build_model
from image_restoration_tpu.models.lr_scheduler import (
    multistep_restart_lr, cosine_annealing_restart_lr)


def _base_opt(tmp_path):
    return {
        "is_train": True,
        "manual_seed": 0,
        "num_devices": 1,
        "path": {"models": str(tmp_path / "models"),
                 "visualization": str(tmp_path / "vis")},
        "logger": {"print_freq": 1},
    }


def test_lr_schedules():
    s = multistep_restart_lr(2e-3, [100, 200], gamma=0.5)
    assert float(s(0)) == pytest.approx(2e-3)
    assert float(s(150)) == pytest.approx(1e-3)
    assert float(s(250)) == pytest.approx(5e-4)
    # restart wipes earlier decays and re-accumulates (ref :27-34)
    s = multistep_restart_lr(2e-3, [100, 200], gamma=0.5,
                             restarts=[150], restart_weights=[0.5])
    assert float(s(149)) == pytest.approx(1e-3)       # one decay
    assert float(s(150)) == pytest.approx(1e-3)       # restart: base*0.5
    assert float(s(220)) == pytest.approx(0.5e-3)     # decay after restart
    c = cosine_annealing_restart_lr(1e-3, [100, 100],
                                    restart_weights=[1, 0.5])
    assert float(c(0)) == pytest.approx(1e-3, rel=1e-3)
    assert float(c(99)) < 1e-4
    # the restart takes effect the iter AFTER the boundary (ref
    # get_position_from_periods uses <=)
    assert float(c(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(c(101)) == pytest.approx(0.5e-3, rel=0.05)


def test_lr_schedules_golden_vs_reference():
    """Curve parity with basicsr/models/lr_scheduler.py through a real
    torch optimizer (the reference schedulers are stateful)."""
    import importlib.util
    ref_path = ("/root/reference/Car_Plate-Restoration/basicsr/models/"
                "lr_scheduler.py")
    import os.path as osp
    if not osp.exists(ref_path):
        pytest.skip("reference not mounted")
    import torch
    spec = importlib.util.spec_from_file_location("ref_sched", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    def curve(make_sched, steps):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=3e-4)
        sched = make_sched(opt)
        lrs = [opt.param_groups[0]["lr"]]
        for _ in range(steps):
            sched.step()
            lrs.append(opt.param_groups[0]["lr"])
        return np.asarray(lrs)

    want = curve(lambda o: ref.MultiStepRestartLR(
        o, milestones=[5, 9, 9, 15], gamma=0.5, restarts=[10],
        restart_weights=[0.7]), 24)
    ours = multistep_restart_lr(3e-4, [5, 9, 9, 15], gamma=0.5,
                                restarts=[10], restart_weights=[0.7])
    got = np.asarray([float(ours(k)) for k in range(25)])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    want = curve(lambda o: ref.CosineAnnealingRestartLR(
        o, periods=[10, 10, 5], restart_weights=[1, 0.5, 0.25],
        eta_min=1e-7), 24)
    ours = cosine_annealing_restart_lr(3e-4, [10, 10, 5],
                                       restart_weights=[1, 0.5, 0.25],
                                       eta_min=1e-7)
    got = np.asarray([float(ours(k)) for k in range(25)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sr_model_loss_decreases(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "SRModel",
        "scale": 2, "gt_size": 16,
        "network_g": dict(type="MSRResNet", num_feat=8, num_block=1,
                          upscale=2),
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "scheduler": {"type": "MultiStepLR", "milestones": [1000]},
            "total_iter": 10,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
        },
    })
    model = build_model(opt)
    rng = np.random.default_rng(0)
    gt = rng.random((2, 16, 16, 3)).astype(np.float32)
    lq = gt[:, ::2, ::2, :].copy()
    batch = {"lq": lq, "gt": gt}
    losses = []
    for i in range(8):
        out = model.optimize_parameters(i + 1, batch,
                                        jax.random.PRNGKey(i))
        losses.append(out["l_pix"])
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # ema differs from params after updates
    d = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        model.state["params_g"], model.state["ema_g"]))
    assert max(d) > 0


def test_optimizer_grad_clip(tmp_path):
    """optim_g.grad_clip must clip the gradient by GLOBAL norm before
    the optimizer update (torch analog: clip_grad_norm_ before step).
    Verified through SGD, where updates scale linearly with the gradient
    (Adam's first step is scale-invariant, so it cannot witness the
    clip): a gradient of norm ~200 under grad_clip=0.1 must produce the
    update of the 0.1/200-scaled gradient — 2000x smaller than the
    unclipped optimizer's."""
    def build(clip):
        opt = _base_opt(tmp_path)
        opt.update({
            "model_type": "SRModel",
            "scale": 2, "gt_size": 16,
            "network_g": dict(type="MSRResNet", num_feat=8, num_block=1,
                              upscale=2),
            "train": {
                "optim_g": {"type": "SGD", "lr": 1e-3, "momentum": 0.0,
                            **({"grad_clip": 0.1} if clip else {})},
                "scheduler": {"type": "MultiStepLR", "milestones": [1000]},
                "total_iter": 10,
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            },
        })
        return build_model(opt)

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((3,))}
    big = {"w": jnp.full((4,), 100.0), "b": jnp.full((3,), 10.0)}
    gnorm = float(optax.global_norm(big))
    pre_scaled = jax.tree.map(lambda g: g * (0.1 / gnorm), big)

    tx_clip = build(True).tx_g
    tx_plain = build(False).tx_g
    u_clip, _ = tx_clip.update(big, tx_clip.init(params), params)
    u_ref, _ = tx_clip.update(pre_scaled, tx_clip.init(params), params)
    u_plain, _ = tx_plain.update(big, tx_plain.init(params), params)
    for k in params:
        np.testing.assert_allclose(u_clip[k], u_ref[k], rtol=1e-6)
    ratio = float(optax.global_norm(u_plain)) / \
        float(optax.global_norm(u_clip))
    assert abs(ratio - gnorm / 0.1) / (gnorm / 0.1) < 1e-4, ratio
    from image_restoration_tpu.data.pipelines import (
        FFHQDegradationConfig, make_ffhq_degradation)
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "SRModel",
        "scale": 1, "gt_size": 32,
        "network_g": dict(type="SRVGGNetCompact", num_feat=8, num_conv=2,
                          upscale=1),
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "total_iter": 4,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
        },
    })
    model = build_model(opt)
    cfg = FFHQDegradationConfig(kernel_list=("iso", "aniso"),
                                kernel_prob=(0.5, 0.5),
                                downsample_range=(2.0, 4.0),
                                mean=(0, 0, 0), std=(1, 1, 1))
    model.set_degradation_pipeline(make_ffhq_degradation(cfg))
    gt = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
    out = model.optimize_parameters(1, {"gt": gt}, jax.random.PRNGKey(0))
    assert np.isfinite(out["l_pix"])


def test_gfpgan_model_steps(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "GFPGANModel",
        "network_g": dict(type="GFPGANv1OCR", input_width=32,
                          input_height=32, num_style_feat=16,
                          channel_multiplier=0.25, num_mlp=2,
                          input_is_latent=True, different_w=True,
                          narrow=0.5, sft_half=True, fix_decoder=False),
        "network_d": dict(type="StyleGAN2Discriminator", input_width=32,
                          input_height=32, channel_multiplier=0.25,
                          narrow=0.25),
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-3},
            "optim_d": {"type": "Adam", "lr": 2e-3},
            "scheduler": {"type": "MultiStepLR", "milestones": [100],
                          "gamma": 0.5},
            "total_iter": 6,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 0.1},
            "L1_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                        "loss_weight": 0.1},
            "pyramid_loss_weight": 1.0,
            "remove_pyramid_loss": 3,
            "r1_reg_weight": 10,
            "net_d_iters": 1,
            "net_d_init_iters": 0,
            "net_d_reg_every": 2,
        },
    })
    model = build_model(opt)
    rng = np.random.default_rng(1)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    lq = np.clip(gt + rng.normal(0, 0.1, gt.shape), -1, 1).astype(np.float32)
    batch = {"lq": lq, "gt": gt}
    for i in range(1, 5):
        out = model.optimize_parameters(i, batch, jax.random.PRNGKey(i))
        for k, v in out.items():
            assert np.isfinite(v), f"{k} not finite at iter {i}"
    assert "l_d_r1" in out          # iter 4 is an R1 iter
    assert "l_p_8" in out           # pyramid loss logged
    # test path (EMA, fixed noise)
    res = model.test(lq)
    assert res.shape == gt.shape


@pytest.mark.slow  # 130s; relativistic-GAN step variant
def test_esrgan_model_steps(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "ESRGANModel",
        "scale": 2, "gt_size": 32,
        "network_g": dict(type="MSRResNet", num_feat=8, num_block=1,
                          upscale=2),
        "network_d": dict(type="UNetDiscriminatorSN", num_feat=8),
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-4},
            "optim_d": {"type": "Adam", "lr": 1e-4},
            "total_iter": 4,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "loss_weight": 0.1},
            "net_d_iters": 1, "net_d_init_iters": 0,
        },
    })
    model = build_model(opt)
    rng = np.random.default_rng(2)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32)
    lq = gt[:, ::2, ::2, :].copy()
    for i in range(1, 3):
        out = model.optimize_parameters(i, {"lq": lq, "gt": gt},
                                        jax.random.PRNGKey(i))
        assert all(np.isfinite(v) for v in out.values())


def test_save_and_resume(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "SRModel",
        "scale": 2, "gt_size": 16,
        "network_g": dict(type="MSRResNet", num_feat=8, num_block=1,
                          upscale=2),
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3}, "total_iter": 4,
                  "pixel_opt": {"type": "L1Loss"}},
    })
    model = build_model(opt)
    gt = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    lq = gt[:, ::2, ::2, :].copy()
    model.optimize_parameters(1, {"lq": lq, "gt": gt}, jax.random.PRNGKey(0))
    model.save(1)

    model2 = build_model(opt)
    model2.resume(str(tmp_path / "models" / "ckpt_1"))
    a = jax.tree.leaves(model.state["params_g"])[0]
    b = jax.tree.leaves(model2.state["params_g"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(model2.state["iter"]) == 1


def _gfpgan_component_opt(tmp_path):
    opt = _base_opt(tmp_path)
    opt.update({
        "model_type": "GFPGANModel",
        "use_component_loss": True,
        "network_g": dict(type="GFPGANv1OCR", input_width=32,
                          input_height=32, num_style_feat=16,
                          channel_multiplier=0.25, num_mlp=2,
                          input_is_latent=True, different_w=True,
                          narrow=0.5, sft_half=True, fix_decoder=False),
        "network_d": dict(type="StyleGAN2Discriminator", input_width=32,
                          input_height=32, channel_multiplier=0.25,
                          narrow=0.25),
        "network_d_char": dict(type="FacialComponentDiscriminator"),
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-3},
            "optim_d": {"type": "Adam", "lr": 2e-3},
            "optim_component": {"type": "Adam", "lr": 2e-3},
            "scheduler": {"type": "MultiStepLR", "milestones": [100],
                          "gamma": 0.5},
            "total_iter": 4,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 0.1},
            "L1_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                        "loss_weight": 0.1},
            "gan_component_opt": {"type": "GANLoss", "gan_type": "vanilla",
                                  "real_label_val": 1.0,
                                  "fake_label_val": 0.0, "loss_weight": 1.0},
            "comp_style_weight": 200,
            "pyramid_loss_weight": 1.0,
            "remove_pyramid_loss": 100,
            "r1_reg_weight": 10,
            "net_d_iters": 1, "net_d_init_iters": 0, "net_d_reg_every": 4,
        },
    })
    return opt


@pytest.mark.slow  # 237s: 10 stacked char-Ds through 2 full steps
def test_gfpgan_component_discriminator_steps(tmp_path):
    """Ref gfpgan_model.py:556-642,700-760: per-char component GAN +
    Gram-style losses; the 10 char Ds train (stacked-vmap design)."""
    model = build_model(_gfpgan_component_opt(tmp_path))
    rng = np.random.default_rng(3)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    lq = np.clip(gt + rng.normal(0, 0.1, gt.shape), -1, 1).astype(np.float32)
    x1 = rng.uniform(0, 20, (2, 10))
    y1 = rng.uniform(0, 20, (2, 10))
    boxes = np.stack([x1, y1, x1 + 8, y1 + 8], -1).astype(np.float32)
    batch = {"lq": lq, "gt": gt, "char_boxes": boxes}

    dc_before = jax.device_get(model.state["params_dc"])
    for i in range(1, 3):
        out = model.optimize_parameters(i, batch, jax.random.PRNGKey(i))
        for k, v in out.items():
            assert np.isfinite(v), f"{k} not finite at iter {i}"
    # all component losses logged
    for i in range(10):
        assert f"l_g_gan_char_{i}" in out
        assert f"l_d_char_{i}" in out
    assert "l_g_comp_style_loss" in out
    # every char D's params moved (stacked axis 0)
    dc_after = jax.device_get(model.state["params_dc"])
    leaf_b = jax.tree.leaves(dc_before)[0]
    leaf_a = jax.tree.leaves(dc_after)[0]
    per_char_delta = np.abs(leaf_a - leaf_b).reshape(10, -1).max(axis=1)
    assert np.all(per_char_delta > 0), per_char_delta
    # missing boxes must be a hard error
    with pytest.raises(KeyError):
        model.optimize_parameters(3, {"lq": lq, "gt": gt},
                                  jax.random.PRNGKey(3))


def test_gfpgan_net_d_iters_skips_g_update(tmp_path):
    """Ref :508: on skip iters optimizer_g.step() is not called at all —
    params_g must be bit-identical, while D still updates and EMA blends."""
    opt = _gfpgan_component_opt(tmp_path)
    opt["use_component_loss"] = False
    del opt["network_d_char"]
    opt["train"]["net_d_iters"] = 2  # odd iters skip the G update
    model = build_model(opt)
    rng = np.random.default_rng(4)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1
    lq = gt.copy()
    batch = {"lq": lq, "gt": gt}
    g_before = jax.device_get(model.state["params_g"])
    d_before = jax.device_get(model.state["params_d"])
    out = model.optimize_parameters(1, batch, jax.random.PRNGKey(1))
    assert "l_g_gan" not in out  # no G losses on a skip iter
    g_after = jax.device_get(model.state["params_g"])
    d_after = jax.device_get(model.state["params_d"])
    assert all(np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(g_before), jax.tree.leaves(g_after)))
    assert any(not np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(d_before), jax.tree.leaves(d_after)))
    # update iter: G moves
    out = model.optimize_parameters(2, batch, jax.random.PRNGKey(2))
    assert "l_g_gan" in out
    g_final = jax.device_get(model.state["params_g"])
    assert any(not np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(g_after), jax.tree.leaves(g_final)))
