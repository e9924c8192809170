"""Full-net goldens for the remaining zoo archs at imported weights:
EDSR, RCAN, DUF, TOFlow vs the reference torch modules.

BN archs (DUF, TOFlow's SPyNetTOF) are compared with randomized
parameters and DEFAULT running statistics on both sides (torch eval uses
running stats; flax init matches them at 0-mean/1-var), which exercises
every learned weight through the full graph.
"""

import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ref_loader import install_stubs, load_ref_arch
from image_restoration_tpu.archs import build_network
from image_restoration_tpu.convert.torch_import import import_network

pytestmark = [pytest.mark.skipif(
    not osp.exists("/root/reference/Car_Plate-Restoration"),
    reason="reference not mounted")]


def _make(ref_file, cls_name, tkw):
    import torch
    install_stubs()
    ref = load_ref_arch(ref_file)
    torch.manual_seed(0)
    return getattr(ref, cls_name)(**tkw).eval()


def _import_params(jnet, arch_name, tnet, variables):
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    return import_network(arch_name, jnet, variables, sd)["params"]


def test_edsr_golden(rng):
    import torch
    tnet = _make("edsr_arch", "EDSR",
                 dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2,
                      upscale=4, res_scale=1))
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    jnet = build_network(dict(type="EDSR", num_in_ch=3, num_out_ch=3,
                              num_feat=16, num_block=2, upscale=4,
                              res_scale=1))
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _import_params(jnet, "EDSR", tnet, variables)
    got = np.asarray(jax.jit(jnet.apply)({"params": params},
                                         jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


def test_rcan_golden(rng):
    import torch
    tnet = _make("rcan_arch", "RCAN",
                 dict(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2,
                      num_block=2, squeeze_factor=4, upscale=4,
                      res_scale=1))
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    jnet = build_network(dict(type="RCAN", num_in_ch=3, num_out_ch=3,
                              num_feat=16, num_group=2, num_block=2,
                              squeeze_factor=4, upscale=4, res_scale=1))
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _import_params(jnet, "RCAN", tnet, variables)
    got = np.asarray(jax.jit(jnet.apply)({"params": params},
                                         jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_duf_golden(rng):
    import torch
    tnet = _make("duf_arch", "DUF",
                 dict(scale=4, num_layer=16, adapt_official_weights=True))
    # randomize BN running stats so the batch_stats import is exercised
    g = torch.Generator().manual_seed(1)
    sd = tnet.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
    tnet.load_state_dict(sd)
    tnet.eval()
    x = rng.random((1, 7, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()
    jnet = build_network(dict(type="DUF", scale=4, num_layer=16,
                              adapt_official_weights=True))
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd_np = {k: v.numpy() for k, v in tnet.state_dict().items()}
    new_vars = import_network("DUF", jnet, variables, sd_np)
    got = np.asarray(jax.jit(jnet.apply)(
        {"params": new_vars["params"],
         "batch_stats": new_vars["batch_stats"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_toflow_golden(rng):
    import torch
    tnet = _make("tof_arch", "TOFlow", dict(adapt_official_weights=True))
    x = rng.random((1, 7, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()
    jnet = build_network(dict(type="TOFlow", adapt_official_weights=True))
    variables = jax.jit(jnet.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _import_params(jnet, "TOFlow", tnet, variables)
    apply_vars = {"params": params}
    if "batch_stats" in variables:
        apply_vars["batch_stats"] = variables["batch_stats"]
    got = np.asarray(jax.jit(jnet.apply)(apply_vars, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)
