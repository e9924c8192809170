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
