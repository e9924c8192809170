"""Full-net HiFaceGAN golden parity vs the reference torch modules at
imported weights: SPADEGenerator, HiFaceGAN (LIP encoder) and the
multi-scale HiFaceGANDiscriminator (spectral norm folded to W/σ).

Ref: basicsr/archs/hifacegan_arch.py (+hifacegan_util.py blocks).
"""

import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ref_loader import load_ref_arch
from image_restoration_tpu.archs import build_network
from image_restoration_tpu.convert.torch_import import import_network

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not osp.exists("/root/reference/Car_Plate-Restoration"),
    reason="reference not mounted")]


def _torch_net(cls_name, **kw):
    import torch
    ref = load_ref_arch("hifacegan_arch")
    torch.manual_seed(0)
    net = getattr(ref, cls_name)(**kw)
    net.eval()
    return net


def _run_torch(net, x_nhwc):
    import torch
    with torch.no_grad():
        out = net(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    return out


def _import(jnet, tnet, x):
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    return import_network(type(jnet).__name__, jnet, variables,
                          sd)["params"]


def test_spade_generator_golden(rng):
    tnet = _torch_net("SPADEGenerator", num_feat=8, crop_size=64,
                      norm_g="spectralspadeinstance3x3")
    x = rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1
    want = _run_torch(tnet, x).numpy()
    jnet = build_network(dict(type="SPADEGenerator", num_feat=8,
                              crop_size=64,
                              norm_g="spectralspadeinstance3x3"))
    params = _import(jnet, tnet, x)
    got = np.asarray(jax.jit(jnet.apply)({"params": params},
                                         jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


def test_hifacegan_golden(rng):
    tnet = _torch_net("HiFaceGAN", num_feat=8, crop_size=64,
                      norm_g="spectralspadeinstance3x3")
    x = rng.random((2, 64, 64, 3)).astype(np.float32) * 2 - 1
    want = _run_torch(tnet, x).numpy()
    jnet = build_network(dict(type="HiFaceGAN", num_feat=8, crop_size=64,
                              norm_g="spectralspadeinstance3x3"))
    params = _import(jnet, tnet, x)
    got = np.asarray(jax.jit(jnet.apply)({"params": params},
                                         jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=5e-4, atol=5e-4)


def test_hifacegan_discriminator_golden(rng):
    tnet = _torch_net("HiFaceGANDiscriminator", num_feat=8, num_d=2,
                      n_layers_d=4)
    x = rng.random((2, 64, 64, 6)).astype(np.float32) * 2 - 1
    want = _run_torch(tnet, x)
    jnet = build_network(dict(type="HiFaceGANDiscriminator", num_feat=8,
                              num_d=2, n_layers_d=4))
    params = _import(jnet, tnet, x)
    got = jax.jit(jnet.apply)({"params": params}, jnp.asarray(x))
    assert len(got) == len(want) == 2
    for d_got, d_want in zip(got, want):
        assert len(d_got) == len(d_want) == 5
        for g, w in zip(d_got, d_want):
            np.testing.assert_allclose(
                np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
                rtol=5e-4, atol=5e-4)
