"""Cross-chip spatial sharding: halo exchange must reproduce the unsharded
forward exactly in the interior on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from image_restoration_tpu.archs import build_network
from image_restoration_tpu.parallel.spatial import spatial_sharded_apply


def test_spatial_sharded_matches_direct(rng):
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1),
                axis_names=("tile",))
    net = build_network(dict(type="SRVGGNetCompact", num_feat=8, num_conv=2,
                             upscale=2))
    img = jnp.asarray(rng.random((1, 64, 48, 3)).astype(np.float32))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), img)

    def fn(t):
        return net.apply(variables, t)

    halo, scale = 4, 2
    direct = np.asarray(jax.jit(fn)(img))
    with mesh:
        sharded = np.asarray(spatial_sharded_apply(fn, img, mesh, halo,
                                                   scale))
    assert sharded.shape == direct.shape
    b = halo * scale
    np.testing.assert_allclose(sharded[:, b:-b], direct[:, b:-b],
                               rtol=1e-4, atol=1e-5)


def test_halo_exchange_identity(rng):
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1),
                axis_names=("tile",))
    img = jnp.asarray(rng.random((1, 64, 16, 2)).astype(np.float32))
    with mesh:
        out = spatial_sharded_apply(lambda t: t, img, mesh, halo=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-6)
