"""Additional golden coverage: upfirdn wrappers, EqualLinear fused path,
ConvUpLayer, modulated conv up/down sample modes, DiffJPEG gradients,
GFPGAN remat equivalence."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref_arch
from image_restoration_tpu.ops import (upfirdn_upsample, upfirdn_downsample,
                                       modulated_conv2d)
from image_restoration_tpu.utils.diffjpeg import diff_jpeg


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def test_upfirdn_wrappers_match_reference(rng):
    ref = load_ref_arch("stylegan2_ocr_arch")
    x = rng.standard_normal((2, 3, 12, 12)).astype(np.float32)
    up = ref.UpFirDnUpsample((1, 3, 3, 1), factor=2)
    down = ref.UpFirDnDownsample((1, 3, 3, 1), factor=2)
    with torch.no_grad():
        want_up = up(torch.from_numpy(x)).numpy()
        want_down = down(torch.from_numpy(x)).numpy()
    got_up = _nchw(upfirdn_upsample(_nhwc(x), jnp.asarray([1., 3., 3., 1.])))
    got_down = _nchw(upfirdn_downsample(_nhwc(x),
                                        jnp.asarray([1., 3., 3., 1.])))
    np.testing.assert_allclose(got_up, want_up, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_down, want_down, rtol=1e-4, atol=1e-5)


def test_equal_linear_fused_matches_reference(rng):
    ref = load_ref_arch("stylegan2_ocr_arch")
    tl = ref.EqualLinear(16, 24, lr_mul=0.01, activation="fused_lrelu")
    x = rng.standard_normal((4, 16)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()

    from image_restoration_tpu.archs.stylegan2_arch import EqualLinear
    net = EqualLinear(24, lr_mul=0.01, activation="fused_lrelu")
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "weight": jnp.asarray(tl.weight.detach().numpy().T),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }
    got = net.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["upsample", "downsample"])
def test_modulated_conv_sample_modes_match_reference(rng, mode):
    ref = load_ref_arch("stylegan2_ocr_arch")
    tmc = ref.ModulatedConv2d(8, 12, 3, num_style_feat=6, demodulate=True,
                              sample_mode=mode)
    x = rng.standard_normal((2, 8, 16, 16)).astype(np.float32)
    style = rng.standard_normal((2, 6)).astype(np.float32)
    with torch.no_grad():
        want = tmc(torch.from_numpy(x), torch.from_numpy(style)).numpy()

    # replicate: style -> modulation linear -> op
    mod_w = tmc.modulation.weight.detach().numpy()
    mod_b = tmc.modulation.bias.detach().numpy()
    scale_lin = 1.0 / np.sqrt(6)
    s = style @ (mod_w.T * scale_lin) + mod_b
    w = tmc.weight.detach().numpy()[0].transpose(2, 3, 1, 0)  # HWIO
    w_scale = 1.0 / np.sqrt(8 * 9)
    got = modulated_conv2d(_nhwc(x), jnp.asarray(w * w_scale),
                           jnp.asarray(s), demodulate=True,
                           sample_mode=mode)
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-3, atol=1e-4)


def test_diffjpeg_differentiable_grad():
    x = jnp.full((1, 16, 16, 3), 0.5)

    def loss(x):
        return jnp.mean(diff_jpeg(x, 50.0, differentiable=True))

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.slow  # 104s; remat-vs-plain trainer equivalence
def test_gfpgan_remat_matches_nonremat(tmp_path):
    from image_restoration_tpu.models import build_model
    base = {
        "is_train": True, "manual_seed": 0, "num_devices": 1,
        "path": {"models": str(tmp_path / "m"),
                 "visualization": str(tmp_path / "v")},
        "logger": {"print_freq": 1},
        "model_type": "GFPGANModel",
        "network_g": dict(type="GFPGANv1OCR", input_width=32,
                          input_height=32, num_style_feat=16,
                          channel_multiplier=0.25, num_mlp=2,
                          input_is_latent=True, different_w=True,
                          narrow=0.5, sft_half=True),
        "network_d": dict(type="StyleGAN2Discriminator", input_width=32,
                          input_height=32, channel_multiplier=0.25,
                          narrow=0.25),
    }

    def train_opt(remat):
        return {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "optim_d": {"type": "Adam", "lr": 1e-3},
            "total_iter": 2, "remat": remat,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 0.1},
            "L1_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                        "loss_weight": 0.1},
            "net_d_iters": 1, "net_d_init_iters": 0, "net_d_reg_every": 4,
        }

    rng = np.random.default_rng(0)
    gt = rng.random((2, 32, 32, 3)).astype(np.float32)
    lq = rng.random((2, 32, 32, 3)).astype(np.float32)
    outs = []
    for remat in (False, True):
        opt = dict(base, train=train_opt(remat))
        model = build_model(opt)
        out = model.optimize_parameters(1, {"lq": lq, "gt": gt},
                                        jax.random.PRNGKey(0))
        outs.append(out)
    for k in outs[0]:
        np.testing.assert_allclose(outs[0][k], outs[1][k], rtol=1e-4,
                                   atol=1e-5)
