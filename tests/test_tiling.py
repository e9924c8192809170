"""Halo tiling: identity roundtrip + exactness vs untiled forward when the
halo covers the receptive field, including on a sharded 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.parallel import (tile_image, untile_image,
                                            tiled_apply, make_mesh)
from image_restoration_tpu.archs import build_network


def test_tile_untile_roundtrip(rng):
    img = jnp.asarray(rng.random((1, 37, 53, 3)).astype(np.float32))
    out = tiled_apply(lambda t: t, img, tile=16, halo=4, scale=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-6)


def test_tiled_matches_direct_small_net(rng):
    # Interior pixels are EXACT when the halo covers the receptive field.
    # (At the true image border the tile path sees reflect padding while the
    # direct path sees the convs' zero padding — only the outer halo ring
    # can differ, by design.)
    net = build_network(dict(type="SRVGGNetCompact", num_feat=8, num_conv=2,
                             upscale=2))
    img = jnp.asarray(rng.random((1, 40, 56, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img)
    fn = jax.jit(lambda t: net.apply(variables, t))
    halo, scale = 8, 2
    b = halo * scale
    direct = np.asarray(fn(img))[:, b:-b, b:-b]
    tiled = np.asarray(tiled_apply(fn, img, tile=16, halo=halo,
                                   scale=scale))[:, b:-b, b:-b]
    np.testing.assert_allclose(tiled, direct, rtol=1e-4, atol=1e-5)


def test_tiled_apply_sharded_mesh(rng):
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    net = build_network(dict(type="SRVGGNetCompact", num_feat=8, num_conv=2,
                             upscale=2))
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img)
    fn = jax.jit(lambda t: net.apply(variables, t))
    b = 8 * 2
    direct = np.asarray(fn(img))[:, b:-b, b:-b]
    tiled = np.asarray(tiled_apply(fn, img, tile=16, halo=8, scale=2,
                                   tile_batch=8, mesh=mesh))[:, b:-b, b:-b]
    np.testing.assert_allclose(tiled, direct, rtol=1e-4, atol=1e-5)
