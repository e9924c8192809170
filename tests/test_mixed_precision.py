"""Mixed-precision (dtype=bf16) compute paths for the hand-rolled
StyleGAN2/GFPGAN layers.

The r5 chip trace showed the "bf16" GAN trainer actually ran f32 convs:
the hand-rolled layers (ConvLayer/EqualConv2d/EqualLinear/ModulatedConv2d/
ConvUpLayer) declared a `dtype` field but never applied it — only the
flax nn.Conv-based archs (SRVGG, VGG-D) honored dtype. These tests pin
the fixed semantics:

  * params are created/stored f32 regardless of dtype (master weights —
    the torch importer and goldens depend on this),
  * with dtype=bf16 the conv/matmul COMPUTE runs in bf16 (checked by
    walking the jaxpr: every conv_general_dilated with >1e7 flops must
    consume bf16 operands),
  * bf16 output stays close to the f32 reference output (bf16 has an
    8-bit mantissa → per-pixel tolerance ~1e-1 on (-1,1) images at these
    tiny shapes, mean error much smaller),
  * dtype=None is bit-identical to the pre-fix path (the golden
    contract: goldens import torch weights and compare at f32).

Reference context: the reference trains f32 (basicsr has no AMP path in
the production GFPGAN configs, train_gfpgan_v4_square_license_basic.yml);
bf16 training is a TPU-first extension, so parity is gated at f32 and
bf16 is gated against OUR f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_tpu.archs import build_network
from image_restoration_tpu.utils.flops import count_flops


def _net(dtype):
    return build_network(dict(
        type="GFPGANv1OCR", input_width=32, input_height=32,
        num_style_feat=16, channel_multiplier=0.25, num_mlp=2,
        input_is_latent=True, different_w=True, narrow=0.5,
        sft_half=True, fix_decoder=False, dtype=dtype))


def _conv_operand_dtypes(fn, *args):
    """(dtype_lhs, flops) for every conv_general_dilated in the jaxpr."""
    rows = []

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                out = int(np.prod(eqn.outvars[0].aval.shape))
                rows.append((eqn.invars[0].aval.dtype, out))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for b in v:
                        if hasattr(b, "jaxpr"):
                            walk(b.jaxpr)

    walk(jax.make_jaxpr(fn)(*args).jaxpr)
    return rows


def test_params_stay_f32_under_bf16():
    net = _net(jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    dtypes = {a.dtype for a in jax.tree.leaves(v["params"])}
    assert dtypes == {jnp.dtype(jnp.float32)}, dtypes


def test_bf16_dtype_reaches_the_convs():
    net = _net(jnp.bfloat16)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)

    def fwd(p, x):
        out, _ = net.apply({"params": p}, x, return_rgb=True,
                           randomize_noise=False)
        return out

    rows = _conv_operand_dtypes(fwd, v["params"], x)
    assert rows, "no convs traced"
    big = [dt for dt, sz in rows if sz >= 2 * 16 * 16 * 8]
    assert big and all(dt == jnp.bfloat16 for dt in big), \
        f"large convs not bf16: {[(str(d), s) for d, s in rows]}"
    # and the f32 net must have NO bf16 convs
    net32 = _net(None)
    rows32 = _conv_operand_dtypes(
        lambda p, x: net32.apply({"params": p}, x, return_rgb=True,
                                 randomize_noise=False)[0], v["params"], x)
    assert all(dt == jnp.float32 for dt, _ in rows32)


def test_bf16_output_tracks_f32():
    net16, net32 = _net(jnp.bfloat16), _net(None)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3),
                           jnp.float32, -1.0, 1.0)
    v = jax.jit(net32.init)(jax.random.PRNGKey(0), x)

    def run(net):
        out, _ = net.apply({"params": v["params"]}, x, return_rgb=True,
                           randomize_noise=False)
        return np.asarray(out, np.float32)

    o32, o16 = run(net32), run(net16)
    assert o16.dtype == np.float32  # comparison domain
    assert np.isfinite(o16).all()
    err = np.abs(o16 - o32)
    scale = max(1.0, float(np.abs(o32).max()))
    assert float(err.mean()) / scale < 2e-2, err.mean()
    assert float(err.max()) / scale < 2e-1, err.max()


def test_discriminator_bf16_matches_f32():
    from image_restoration_tpu.archs.stylegan2_arch import (
        StyleGAN2Discriminator)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 3),
                           jnp.float32, -1.0, 1.0)
    d32 = StyleGAN2Discriminator(input_width=32, input_height=32,
                                 channel_multiplier=0.25, narrow=0.25)
    d16 = StyleGAN2Discriminator(input_width=32, input_height=32,
                                 channel_multiplier=0.25, narrow=0.25,
                                 dtype=jnp.bfloat16)
    v = jax.jit(d32.init)(jax.random.PRNGKey(0), x)
    o32 = np.asarray(d32.apply(v, x), np.float32)
    o16 = np.asarray(d16.apply(v, x), np.float32)
    scale = max(1.0, float(np.abs(o32).max()))
    assert np.abs(o16 - o32).max() / scale < 5e-2


def test_gan_step_flops_unchanged_but_bf16():
    """The bf16 cast must not change WHAT is computed (flop count is
    dtype-independent in the jaxpr counter) — only the compute dtype."""
    net16, net32 = _net(jnp.bfloat16), _net(None)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = jax.jit(net32.init)(jax.random.PRNGKey(0), x)

    def fwd(net):
        return lambda p, x: net.apply({"params": p}, x, return_rgb=True,
                                      randomize_noise=False)[0]

    fl32 = count_flops(fwd(net32), v["params"], x)
    fl16 = count_flops(fwd(net16), v["params"], x)
    assert fl32["total"] == pytest.approx(fl16["total"], rel=1e-6)
