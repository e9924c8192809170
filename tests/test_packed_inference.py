"""Channel-packed SRVGG fast path must match the plain forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.archs import build_network
from image_restoration_tpu.ops.packed_inference import (pack_srvgg_params,
                                                        packed_srvgg_forward)


def test_packed_srvgg_matches_plain(rng):
    num_conv, upscale = 4, 2
    net = build_network(dict(type="SRVGGNetCompact", num_feat=16,
                             num_conv=num_conv, upscale=upscale))
    x = jnp.asarray(rng.random((4, 12, 10, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    plain = np.asarray(net.apply(variables, x))

    packed = pack_srvgg_params(variables["params"], num_conv,
                               dtype=jnp.float32)
    got = np.asarray(packed_srvgg_forward(packed, x, num_conv, upscale))
    np.testing.assert_allclose(got, plain, rtol=1e-4, atol=1e-5)


def test_packed_rrdbnet_matches_plain(rng):
    from image_restoration_tpu.ops.packed_inference import (
        pack_rrdbnet_params, packed_rrdbnet_forward)
    num_block = 2
    net = build_network(dict(type="RRDBNet", scale=4, num_feat=16,
                             num_block=num_block, num_grow_ch=8))
    x = jnp.asarray(rng.random((4, 10, 12, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    plain = np.asarray(net.apply(variables, x))
    packed = pack_rrdbnet_params(variables["params"], num_block, g=4,
                                 dtype=jnp.float32)
    got = np.asarray(packed_rrdbnet_forward(packed, x, num_block, 4, g=4))
    np.testing.assert_allclose(got, plain, rtol=1e-4, atol=1e-5)


def test_pallas_int8_conv_matches_xla(rng):
    from image_restoration_tpu.ops.pallas.int8_conv import (
        int8_conv3x3_requant)
    h, w, c = 16, 16, 128
    xp = jnp.asarray(rng.integers(-127, 127, (h + 2, w + 2, c)), jnp.int8)
    wt = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)
    deq = jnp.asarray(rng.random(c) * 1e-3, jnp.float32)
    b = jnp.asarray(rng.random(c) * 1e-2, jnp.float32)
    a = jnp.asarray(np.full(c, 0.25), jnp.float32)
    so = jnp.asarray(1.0, jnp.float32)

    got = int8_conv3x3_requant(xp, wt, deq, b, a, so, bh=8, interpret=True)

    acc = jax.lax.conv_general_dilated(
        xp[None], wt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)[0]
    hf = acc.astype(jnp.float32) * deq + b
    hf = jnp.where(hf >= 0, hf, hf * a)
    want = jnp.clip(jnp.round(hf * (127.0 / so)), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_widened_rrdbnet_matches_plain(rng):
    """Concat-absorbed (input-grouped) RRDB forward == plain forward.

    The re-association is FLOP-identical; f32 agreement is to summation-
    order rounding. Covers g=1 and the composed g=2 tile packing."""
    from image_restoration_tpu.ops.rrdb_widened import (
        widen_rrdbnet_params, widened_rrdbnet_forward)
    num_block = 2
    net = build_network(dict(type="RRDBNet", scale=4, num_feat=16,
                             num_block=num_block, num_grow_ch=8))
    x = jnp.asarray(rng.random((4, 10, 12, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    plain = np.asarray(net.apply(variables, x))
    for g in (1, 2):
        wp = widen_rrdbnet_params(variables["params"], num_block, g=g,
                                  nf=16, gc=8, dtype=jnp.float32)
        got = np.asarray(widened_rrdbnet_forward(wp, x, num_block, 4,
                                                 g=g, nf=16, gc=8))
        np.testing.assert_allclose(got, plain, rtol=1e-4, atol=1e-5,
                                   err_msg=f"g={g}")
