"""int8 PTQ SRVGG path: close to the fp32 forward (PSNR gate)."""

import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.archs import build_network
from image_restoration_tpu.ops.quantized_inference import (
    calibrate_srvgg_act_scales, quantize_srvgg_params,
    quantized_srvgg_forward)


def test_quantized_srvgg_close_to_fp32(rng):
    num_conv, upscale = 4, 2
    net = build_network(dict(type="SRVGGNetCompact", num_feat=16,
                             num_conv=num_conv, upscale=upscale))
    # smooth image-like input (PTQ is calibrated for image stats)
    yy, xx = np.mgrid[0:16, 0:16].astype(np.float32)
    base = np.stack([np.sin(yy / 3) * 0.4 + 0.5, np.cos(xx / 4) * 0.4 + 0.5,
                     (xx + yy) / 32], -1)
    x = jnp.asarray(np.stack([base, base[::-1]]))
    variables = net.init(jax.random.PRNGKey(0), x)
    plain = np.asarray(net.apply(variables, x))

    scales = [float(s) for s in np.asarray(
        calibrate_srvgg_act_scales(variables["params"], x, num_conv))]
    q = quantize_srvgg_params(variables["params"], scales, num_conv, pack=2)
    got = np.asarray(quantized_srvgg_forward(q, x, num_conv, upscale,
                                             pack=2))
    assert got.shape == plain.shape
    mse = float(np.mean((got - plain) ** 2))
    rng_span = float(plain.max() - plain.min()) or 1.0
    psnr = 10 * np.log10(rng_span ** 2 / max(mse, 1e-12))
    assert psnr > 35, f"int8 PTQ too lossy: {psnr:.1f} dB"


def test_crop_halo_interior_exact(rng):
    """crop_halo output must equal the center crop of the uncropped
    forward (bit-exact: same convs, the discarded ring is the only
    difference), and compose with tiled_apply(out_halo=0)."""
    num_conv, upscale, halo = 3, 2, 4
    net = build_network(dict(type="SRVGGNetCompact", num_feat=16,
                             num_conv=num_conv, upscale=upscale))
    x = jnp.asarray(rng.random((2, 24, 24, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    scales = [float(s) for s in np.asarray(
        calibrate_srvgg_act_scales(variables["params"], x, num_conv))]
    q = quantize_srvgg_params(variables["params"], scales, num_conv,
                              pack=2)
    full = np.asarray(quantized_srvgg_forward(q, x, num_conv, upscale,
                                              pack=2))
    cropped = np.asarray(quantized_srvgg_forward(
        q, x, num_conv, upscale, pack=2, crop_halo=halo))
    p = halo * upscale
    np.testing.assert_array_equal(cropped, full[:, p:-p, p:-p, :])

    # through the tiler: out_halo=0 stitches the pre-cropped tiles
    from image_restoration_tpu.parallel.tiling import tiled_apply
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    a = np.asarray(tiled_apply(
        lambda t: quantized_srvgg_forward(q, t, num_conv, upscale, pack=2),
        img, tile=16, halo=halo, scale=upscale))
    b = np.asarray(tiled_apply(
        lambda t: quantized_srvgg_forward(q, t, num_conv, upscale, pack=2,
                                          crop_halo=halo),
        img, tile=16, halo=halo, scale=upscale, out_halo=0))
    np.testing.assert_array_equal(a, b)
