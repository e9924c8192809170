"""QAT (ops/qat.py + train.quant_opt): the fake-quant forward is the
serving int8 graph's twin, training against it improves the SERVED int8
output, and it composes with DistillModel.

Framework extension — the reference's TensorRT serving is PTQ-only."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _srvgg_params(num_feat=8, num_conv=2, upscale=2, seed=0):
    from image_restoration_tpu.archs import build_network
    net = build_network({"type": "SRVGGNetCompact", "num_feat": num_feat,
                         "num_conv": num_conv, "upscale": upscale})
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(seed), x)["params"]
    return net, params


def _span_psnr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    span = max(a.max() - a.min(), 1e-9)
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(span ** 2 / max(mse, 1e-20))


def test_qat_forward_matches_int8_serving():
    """Fake-quant forward vs the real int8 serving graph at the SAME
    scales: only bf16-epilogue rounding apart (the QAT twin emulates the
    int8 arithmetic in f32)."""
    from image_restoration_tpu.ops.qat import qat_srvgg_forward
    from image_restoration_tpu.ops.quantized_inference import (
        calibrate_srvgg_act_scales, quantize_srvgg_params,
        quantized_srvgg_forward)

    num_conv, upscale = 2, 2
    _, params = _srvgg_params(num_conv=num_conv, upscale=upscale)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 12, 12, 3)), jnp.float32)

    scales = calibrate_srvgg_act_scales(params, x, num_conv)
    q = quantize_srvgg_params(params, [float(s) for s in np.asarray(scales)],
                              num_conv, pack=2)
    served = quantized_srvgg_forward(q, x, num_conv, upscale=upscale,
                                     pack=2).astype(jnp.float32)
    fake, batch_max = qat_srvgg_forward(params, x, jnp.asarray(scales),
                                        num_conv, upscale)
    assert _span_psnr(served, fake) > 35, _span_psnr(served, fake)
    # the maxima returned ARE the calibration statistics of this batch
    # (up to quantization noise: calibrate_ runs the float forward, the
    # QAT maxima are measured on the fake-quant activations)
    np.testing.assert_allclose(np.asarray(batch_max), np.asarray(scales),
                               rtol=5e-2)
    # and fake-quant actually quantizes (differs from the float net)
    from image_restoration_tpu.archs import build_network
    net = build_network({"type": "SRVGGNetCompact", "num_feat": 8,
                         "num_conv": num_conv, "upscale": upscale})
    float_out = net.apply({"params": params}, x)
    assert float(jnp.abs(fake - float_out).max()) > 1e-5


def test_qat_gradients_flow():
    """STE: gradients reach every param through the fake-quant graph."""
    from image_restoration_tpu.ops.qat import qat_srvgg_forward

    num_conv = 2
    _, params = _srvgg_params(num_conv=num_conv)
    x = jnp.asarray(np.random.default_rng(1).random((1, 8, 8, 3)),
                    jnp.float32)
    qscale = jnp.zeros(num_conv + 3)  # dynamic fallback path

    def loss(p):
        out, _ = qat_srvgg_forward(p, x, qscale, num_conv, 2)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(params)
    gmax = jax.tree.map(lambda g: float(jnp.abs(g).max()), grads)
    for path, v in jax.tree_util.tree_flatten_with_path(gmax)[0]:
        assert v > 0, path


def test_qat_ste_gradient_gated_to_pass_band():
    """Saturated activations (|x| above the clip band) must get ZERO
    gradient through fake_quant_act — an identity gradient there pushes
    weights in directions with no forward effect (torch FakeQuantize
    semantics)."""
    from image_restoration_tpu.ops.qat import fake_quant_act

    scale = jnp.asarray(1.0)  # clip band = ±1.0 (127 * 1/127)
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.9, 3.0])

    def f(x):
        return jnp.sum(fake_quant_act(x, scale))

    g = np.asarray(jax.grad(f)(x))
    np.testing.assert_array_equal(g, [0.0, 1.0, 1.0, 1.0, 0.0])
    # forward still clips to the band edge
    y = np.asarray(fake_quant_act(x, scale))
    np.testing.assert_allclose(y[[0, 4]], [-1.0, 1.0])
    # with an uninitialized (zero) scale the dynamic fallback covers the
    # whole tensor, so nothing is gated
    g0 = np.asarray(jax.grad(
        lambda x: jnp.sum(fake_quant_act(x, jnp.asarray(0.0))))(x))
    np.testing.assert_array_equal(g0, np.ones(5))


def test_qat_export_refuses_untrained_scales():
    """export_int8 on an all-zero qscale (no training step ever ran) must
    fail with a clear message, not a ZeroDivisionError deep in
    quantize_srvgg_params."""
    from image_restoration_tpu.ops.qat import export_int8

    num_conv = 2
    _, params = _srvgg_params(num_conv=num_conv)
    with pytest.raises(ValueError, match="untrained"):
        export_int8(params, np.zeros(num_conv + 3), num_conv)


def _qat_model(tmp_path, num_conv=2, lr=2e-3):
    from image_restoration_tpu.models import build_model
    return build_model({
        "is_train": True, "manual_seed": 0, "num_devices": 1, "scale": 2,
        "gt_size": 16, "model_type": "SRModel",
        "path": {"models": str(tmp_path), "pretrain_network_g": None},
        "logger": {},
        "network_g": {"type": "SRVGGNetCompact", "num_feat": 8,
                      "num_conv": num_conv, "upscale": 2},
        "train": {"optim_g": {"type": "Adam", "lr": lr},
                  "scheduler": {"type": "MultiStepLR",
                                "milestones": [1000], "gamma": 0.5},
                  "total_iter": 1000, "ema_decay": 0.9,
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                  "quant_opt": {"ema_decay": 0.9}},
    })


def test_qat_training_improves_served_int8(tmp_path):
    """Training against the fake-quant graph makes the EXPORTED int8
    serving model better on the training objective — the whole point of
    QAT. Also: qscale EMA populates and the export round-trips through
    quantized_srvgg_forward."""
    from image_restoration_tpu.ops.quantized_inference import (
        quantized_srvgg_forward)

    num_conv = 2
    model = _qat_model(tmp_path, num_conv=num_conv)
    rng = np.random.default_rng(2)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}
    lq, gt = jnp.asarray(batch["lq"]), jnp.asarray(batch["gt"])

    def served_l1():
        q = model.export_quantized(pack=2, use_ema=False)
        out = quantized_srvgg_forward(q, lq, num_conv, upscale=2,
                                      pack=2).astype(jnp.float32)
        return float(jnp.mean(jnp.abs(out - gt)))

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(3):
        key, sub = jax.random.split(key)
        logs = model.optimize_parameters(i + 1, batch, sub)
        losses.append(logs["l_pix"])
    qs = np.asarray(model.state["qscale"])
    assert (qs > 0).all(), qs
    before = served_l1()
    for i in range(40):
        key, sub = jax.random.split(key)
        logs = model.optimize_parameters(i + 4, batch, sub)
        losses.append(logs["l_pix"])
    after = served_l1()
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert after < before, (before, after)


def test_qat_checkpoint_exports_serving_engine(tmp_path):
    """A train.quant_opt orbax checkpoint exports straight into the
    shape-frozen StableHLO serving engine (scripts/export_restorer.py
    --qat-ckpt): trained EMA params + learned scales, no calibration
    batch, round-trip gated."""
    import sys
    from os import path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))
    from export_restorer import build_engine
    from jax import export as jexport

    num_conv = 2
    model = _qat_model(tmp_path / "exp", num_conv=num_conv)
    rng = np.random.default_rng(4)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        model.optimize_parameters(i + 1, batch, sub)
    model.save(3)

    ser, meta, serve = build_engine(
        num_feat=8, num_conv=num_conv, upscale=2, tile=8, halo=2, batch=2,
        qat_ckpt=str(tmp_path / "exp" / "ckpt_3"))
    assert meta["qat"] and meta["mode"] == "int8"
    x = jnp.asarray(rng.random((2, 12, 12, 3)), jnp.bfloat16)
    got = np.asarray(jexport.deserialize(ser).call(x), np.float32)
    want = np.asarray(serve(x), np.float32)
    assert _span_psnr(want, got) > 30
    # the engine really carries the TRAINED scales: its quantize head
    # differs from a fresh-calibration export of random params
    assert np.isfinite(got).all()
    # --bf16 silently overriding a QAT export would deploy the wrong
    # arithmetic; it must be rejected like the --pth conflict
    with pytest.raises(ValueError, match="bf16"):
        build_engine(num_feat=8, num_conv=num_conv, upscale=2, tile=8,
                     halo=2, batch=2, int8=False,
                     qat_ckpt=str(tmp_path / "exp" / "ckpt_3"))


def test_qat_rejected_off_the_supported_trainers(tmp_path):
    """quant_opt on a trainer whose step doesn't thread qscale must fail
    loudly, and on a non-SRVGG generator too."""
    from image_restoration_tpu.models import build_model

    base = {
        "is_train": True, "manual_seed": 0, "num_devices": 1, "scale": 2,
        "gt_size": 16, "path": {"models": str(tmp_path),
                                "pretrain_network_g": None},
        "logger": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3},
                  "scheduler": {"type": "MultiStepLR",
                                "milestones": [10], "gamma": 0.5},
                  "total_iter": 10,
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                  "quant_opt": {}},
    }
    with pytest.raises(ValueError, match="SRVGGNetCompact"):
        build_model(dict(base, model_type="SRModel",
                         network_g={"type": "MSRResNet", "num_feat": 8,
                                    "num_block": 1, "upscale": 2}))
    # a trainer with its own step (doesn't thread qscale) must reject
    # even with the right arch
    srgan = dict(base, model_type="SRGANModel",
                 network_g={"type": "SRVGGNetCompact", "num_feat": 8,
                            "num_conv": 2, "upscale": 2},
                 network_d={"type": "VGGStyleDiscriminator128",
                            "num_in_ch": 3, "num_feat": 8})
    srgan["train"] = dict(base["train"],
                          optim_d={"type": "Adam", "lr": 1e-3},
                          gan_opt={"type": "GANLoss", "gan_type": "vanilla",
                                   "loss_weight": 0.1})
    with pytest.raises(ValueError, match="not supported"):
        build_model(srgan)


def test_qat_distill_combo(tmp_path):
    """DistillModel + quant_opt: the student trains through fake-quant
    toward the frozen teacher; scales track and losses are finite."""
    from image_restoration_tpu.models import build_model

    model = build_model({
        "is_train": True, "manual_seed": 0, "num_devices": 1, "scale": 2,
        "gt_size": 16, "model_type": "DistillModel",
        "path": {"models": str(tmp_path), "pretrain_network_g": None},
        "logger": {},
        "network_g": {"type": "SRVGGNetCompact", "num_feat": 8,
                      "num_conv": 2, "upscale": 2},
        "network_t": {"type": "RRDBNet", "num_feat": 8, "num_block": 1,
                      "num_grow_ch": 4, "scale": 2},
        "train": {"optim_g": {"type": "Adam", "lr": 2e-3},
                  "scheduler": {"type": "MultiStepLR",
                                "milestones": [1000], "gamma": 0.5},
                  "total_iter": 1000, "ema_decay": 0.9,
                  "allow_random_teacher": True,
                  "distill_opt": {"type": "L1Loss", "loss_weight": 1.0},
                  "quant_opt": {"ema_decay": 0.9}},
    })
    rng = np.random.default_rng(3)
    batch = {"lq": rng.random((2, 8, 8, 3)).astype(np.float32),
             "gt": rng.random((2, 16, 16, 3)).astype(np.float32)}
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, sub = jax.random.split(key)
        logs = model.optimize_parameters(i + 1, batch, sub)
        losses.append(logs["l_distill"])
        assert all(np.isfinite(v) for v in logs.values())
    assert (np.asarray(model.state["qscale"]) > 0).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
