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


def test_rrdb_int8_quality(rng):
    """RRDB widened int8 PTQ vs the plain f32 forward: span-normalized
    PSNR must clear the serving gate comfortably on smooth content
    (345 quantized convs with residual accumulation across blocks)."""
    import jax
    import jax.numpy as jnp
    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.ops.rrdb_quant import (
        calibrate_rrdb_act_scales, quantize_rrdb_params,
        quantized_rrdb_forward)

    num_block = 2
    net = build_network(dict(type="RRDBNet", scale=4, num_feat=64,
                             num_block=num_block))
    # smooth-ish content (like images): random low-freq mixture
    base = rng.random((2, 6, 6, 3)).astype(np.float32)
    x = jnp.asarray(np.repeat(np.repeat(base, 4, 1), 4, 2))  # 24×24
    variables = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(variables, x)).astype(np.float32)

    scales = np.asarray(calibrate_rrdb_act_scales(
        variables["params"], x, num_block))
    qp = quantize_rrdb_params(variables["params"], scales, num_block)
    got = np.asarray(quantized_rrdb_forward(qp, x, num_block)).astype(
        np.float32)
    assert got.shape == want.shape
    mse = float(np.mean((got - want) ** 2))
    span = float(want.max() - want.min()) or 1.0
    psnr = 10 * np.log10(span ** 2 / max(mse, 1e-12))
    assert psnr >= 35.0, f"int8 RRDB PSNR {psnr:.1f} dB"


def test_gfpgan_int8_serving_mode(rng):
    """Dynamic-int8 conv mode (ops/modulated_conv.int8_serving): the full
    GFPGAN graph runs with int8 convs, finite, and close to the fp
    output (per-tensor dynamic scales; plumbing correctness + a loose
    quality bound at random weights)."""
    import jax
    import jax.numpy as jnp
    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.ops.modulated_conv import int8_serving

    cfg = dict(type="GFPGANv1OCR", input_width=32, input_height=32,
               num_style_feat=16, channel_multiplier=0.25, num_mlp=2,
               input_is_latent=True, different_w=True, narrow=0.5,
               sft_half=True)
    net = build_network(cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
                    * 0.3)
    variables = net.init(jax.random.PRNGKey(0), x, randomize_noise=False)

    want = np.asarray(jax.jit(lambda v, t: net.apply(
        v, t, randomize_noise=False)[0])(variables, x))
    with int8_serving():
        got = np.asarray(jax.jit(lambda v, t: net.apply(
            v, t, randomize_noise=False)[0])(variables, x))
    assert np.all(np.isfinite(got))
    mse = float(np.mean((got - want) ** 2))
    span = float(want.max() - want.min()) or 1.0
    psnr = 10 * np.log10(span ** 2 / max(mse, 1e-12))
    assert psnr >= 25.0, f"int8 GFPGAN PSNR {psnr:.1f} dB"
