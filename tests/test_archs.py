"""Golden-parity tests: flax networks vs the reference PyTorch networks at
matched (imported) weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref_arch
from image_restoration_tpu.archs import build_network
from image_restoration_tpu.convert.torch_import import (
    convert_state_dict, import_network)


def to_nhwc(x):
    return np.ascontiguousarray(np.asarray(x).transpose(0, 2, 3, 1))


def to_nchw(x):
    return np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2))


def sd_numpy(torch_module):
    return {k: v.detach().numpy() for k, v in
            torch_module.state_dict().items()}


@pytest.fixture(scope="module")
def x_small(  ):
    rng = np.random.default_rng(1)
    return rng.standard_normal((2, 3, 32, 32)).astype(np.float32) * 0.2


def test_rrdbnet_parity(x_small):
    ref_mod = load_ref_arch("rrdbnet_arch")
    tnet = ref_mod.RRDBNet(3, 3, scale=4, num_feat=32, num_block=2,
                           num_grow_ch=16)
    tnet.eval()
    with torch.no_grad():
        want = tnet(torch.from_numpy(x_small)).numpy()

    net = build_network(dict(type="RRDBNet", num_in_ch=3, num_out_ch=3,
                             scale=4, num_feat=32, num_block=2,
                             num_grow_ch=16))
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.asarray(to_nhwc(x_small)))
    params = convert_state_dict(sd_numpy(tnet), variables["params"])
    got = net.apply({"params": params}, jnp.asarray(to_nhwc(x_small)))
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-4, atol=1e-5)


def test_msrresnet_parity(x_small):
    ref_mod = load_ref_arch("srresnet_arch")
    tnet = ref_mod.MSRResNet(3, 3, num_feat=16, num_block=2, upscale=4)
    tnet.eval()
    with torch.no_grad():
        want = tnet(torch.from_numpy(x_small)).numpy()

    net = build_network(dict(type="MSRResNet", num_in_ch=3, num_out_ch=3,
                             num_feat=16, num_block=2, upscale=4))
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x_small)))
    params = convert_state_dict(sd_numpy(tnet), variables["params"])
    got = net.apply({"params": params}, jnp.asarray(to_nhwc(x_small)))
    np.testing.assert_allclose(to_nchw(got), want, rtol=1e-3, atol=1e-4)


def test_stylegan2_discriminator_parity():
    ref_mod = load_ref_arch("stylegan2_arch")
    tnet = ref_mod.StyleGAN2Discriminator(input_width=64, input_height=64,
                                          channel_multiplier=1, narrow=0.5)
    tnet.eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 3, 64, 64)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = build_network(dict(type="StyleGAN2Discriminator", input_width=64,
                             input_height=64, channel_multiplier=1,
                             narrow=0.5))
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)))
    variables = import_network("StyleGAN2Discriminator", net, variables,
                               sd_numpy(tnet))
    got = net.apply({"params": variables["params"]}, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_gfpgan_ocr_parity():
    ref_mod = load_ref_arch("gfpganv1_ocr_arch")
    cfg = dict(input_width=64, input_height=64, num_style_feat=64,
               channel_multiplier=0.5, num_mlp=2, input_is_latent=True,
               different_w=True, narrow=1, sft_half=True)
    tnet = ref_mod.GFPGANv1OCR(decoder_load_path=None, fix_decoder=False,
                               **cfg)
    tnet.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.4
    # fixed noise from the registered buffers for determinism
    with torch.no_grad():
        want, want_rgbs = tnet(torch.from_numpy(x), randomize_noise=False)
    want = want.numpy()

    net = build_network(dict(type="GFPGANv1OCR", **cfg))
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)),
                         randomize_noise=False)
    variables = import_network("GFPGANv1OCR", net, variables, sd_numpy(tnet))
    # hand the torch noise buffers to the flax forward
    noises = [to_nhwc(tnet.stylegan_decoder.noises.__getattr__(f"noise{i}")
                      .numpy()) for i in range(tnet.stylegan_decoder.num_layers)]
    got, got_rgbs = net.apply({"params": variables["params"]},
                              jnp.asarray(to_nhwc(x)), randomize_noise=False,
                              noise=[jnp.asarray(n) for n in noises])
    assert len(got_rgbs) == len(want_rgbs)
    np.testing.assert_allclose(to_nchw(got), want, rtol=2e-3, atol=2e-3)
    for g, w in zip(got_rgbs, want_rgbs):
        np.testing.assert_allclose(to_nchw(g), w.detach().numpy(),
                                   rtol=2e-3, atol=2e-3)


def test_edsr_runs():
    net = build_network(dict(type="EDSR", num_feat=16, num_block=2,
                             upscale=4))
    x = jnp.zeros((1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 64, 64, 3)


def test_rcan_runs():
    net = build_network(dict(type="RCAN", num_feat=16, num_group=1,
                             num_block=2, squeeze_factor=4, upscale=2))
    x = jnp.zeros((1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 32, 32, 3)


def test_srvgg_runs():
    net = build_network(dict(type="SRVGGNetCompact", num_feat=16, num_conv=4,
                             upscale=4))
    x = jnp.zeros((1, 16, 16, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 64, 64, 3)


def test_unet_sn_discriminator_runs():
    net = build_network(dict(type="UNetDiscriminatorSN", num_feat=16))
    x = jnp.zeros((2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 64, 64, 1)


def test_spade_block_golden_vs_reference():
    """SPADEResnetBlock golden vs hifacegan_util.py:57-110 at imported
    weights, including spectral-norm folding (weight_orig/u/v → W/σ)."""
    import importlib.util
    import os.path as osp

    ref_path = ("/root/reference/Car_Plate-Restoration/basicsr/archs/"
                "hifacegan_util.py")
    if not osp.exists(ref_path):
        pytest.skip("reference not mounted")
    import torch
    spec = importlib.util.spec_from_file_location("ref_hifacegan_util",
                                                  ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    fin, fout = 8, 16
    tblock = ref.SPADEResnetBlock(fin, fout,
                                  norm_g="spectralspadeinstance3x3",
                                  semantic_nc=3).eval()
    # randomize (default init is fine but make u/v consistent: run one
    # forward so spectral norm's power iteration settles in train mode)
    x_t = torch.randn(2, fin, 16, 16)
    seg_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        tblock.train()
        for _ in range(3):
            tblock(x_t, seg_t)
        tblock.eval()
        want = tblock(x_t, seg_t).numpy()

    from image_restoration_tpu.archs.hifacegan_arch import SPADEResnetBlock
    from image_restoration_tpu.convert.hifacegan_import import (
        load_torch_hifacegan_block)

    jblock = SPADEResnetBlock(fout)
    x = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    seg = jnp.asarray(seg_t.numpy().transpose(0, 2, 3, 1))
    variables = jax.jit(jblock.init)(jax.random.PRNGKey(0), x, seg)
    params = load_torch_hifacegan_block(
        {k: v.numpy() for k, v in tblock.state_dict().items()},
        variables["params"])
    got = np.asarray(jax.jit(jblock.apply)({"params": params}, x, seg))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)
