"""Video-SR family tests: deform conv vs naive numpy, SpyNet parity vs
reference, BasicVSR/EDVR/DUF/TOF forward shape + finiteness."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref_arch
from image_restoration_tpu.archs import build_network
from image_restoration_tpu.convert.torch_import import convert_state_dict
from image_restoration_tpu.ops.deform_conv import modulated_deform_conv


def _naive_deform_conv(x, offset, mask, weight, stride=1, padding=1):
    """Independent numpy reference (bilinear sample + dot)."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    out = np.zeros((n, ho, wo, cout), np.float64)

    def sample(b, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        vals = np.zeros(cin)
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xc = y0 + dy, x0 + dx
                wgt = ((1 - abs(y - yy)) * (1 - abs(xx - xc)))
                if 0 <= yy < h and 0 <= xc < w and wgt > 0:
                    vals += wgt * x[b, yy, xc]
        return vals

    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                acc = np.zeros(cout)
                for ki in range(kh):
                    for kj in range(kw):
                        tap = ki * kw + kj
                        y = i * stride - padding + ki + \
                            offset[b, i, j, 2 * tap]
                        xx = j * stride - padding + kj + \
                            offset[b, i, j, 2 * tap + 1]
                        v = sample(b, y, xx) * mask[b, i, j, tap]
                        acc += v @ weight[ki, kj]
                out[b, i, j] = acc
    return out


def test_deform_conv_matches_naive(rng):
    x = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    offset = (rng.standard_normal((1, 6, 7, 18)) * 0.7).astype(np.float32)
    mask = rng.random((1, 6, 7, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 4, 5)).astype(np.float32)
    want = _naive_deform_conv(x, offset, mask, weight)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(weight))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_deform_conv_windowed_matches_naive(rng):
    """The gather-free bounded-offset path against the independent numpy
    reference (same gate as the exact path)."""
    x = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    offset = (rng.standard_normal((1, 6, 7, 18)) * 0.7).astype(np.float32)
    mask = rng.random((1, 6, 7, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 4, 5)).astype(np.float32)
    want = _naive_deform_conv(x, offset, mask, weight)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(weight),
                                max_offset=4, block=4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("h,w,c,g,R,dil,pad,with_mask", [
    (37, 45, 16, 4, 6, 1, 1, True),    # non-divisible odd sizes
    (24, 24, 8, 1, 2, 2, 2, False),    # dilation 2, no modulation
    (16, 16, 8, 2, 3, 1, 0, True),     # pad 0
])
def test_deform_conv_windowed_matches_exact(rng, h, w, c, g, R, dil, pad,
                                            with_mask):
    """Windowed path == exact path wherever |offset| <= R; offsets
    beyond R clamp (the documented deviation), so the exact arm gets the
    pre-clamped offsets and the windowed arm the raw ones."""
    n, k = 2, 9
    ho = h + 2 * pad - 2 * dil
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((n, ho, w + 2 * pad - 2 * dil,
                                           2 * k * g)) * (R + 1),
                      jnp.float32)  # some |off| > R: exercises the clamp
    m = jnp.asarray(rng.random((n, ho, w + 2 * pad - 2 * dil, k * g)),
                    jnp.float32) if with_mask else None
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) / np.sqrt(9 * c),
                      jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
    exact = modulated_deform_conv(x, jnp.clip(off, -R, R), m, wgt, b,
                                  padding=pad, dilation=dil,
                                  deformable_groups=g)
    fast = modulated_deform_conv(x, off, m, wgt, b, padding=pad,
                                 dilation=dil, deformable_groups=g,
                                 max_offset=R, block=8)
    err = float(jnp.abs(exact - fast).max() / jnp.abs(exact).max())
    assert err < 1e-5, err


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_flow_warp_windowed_matches_exact(rng, mode):
    """flow_warp(max_flow=R) == the gather path wherever |flow| <= R,
    in both grid_sample padding modes (flows beyond R clamp)."""
    from image_restoration_tpu.archs.arch_util import flow_warp
    R = 5
    x = jnp.asarray(rng.standard_normal((2, 37, 45, 16)), jnp.float32)
    fl = jnp.asarray(rng.standard_normal((2, 37, 45, 2)) * (R + 2),
                     jnp.float32)  # some |flow| > R: exercises the clamp
    exact = flow_warp(x, jnp.clip(fl, -R, R), padding_mode=mode)
    fast = flow_warp(x, fl, padding_mode=mode, max_flow=R, block=8)
    err = float(jnp.abs(exact - fast).max() / jnp.abs(exact).max())
    assert err < 1e-5, err


def test_deform_conv_windowed_rejects_stride():
    x = jnp.zeros((1, 8, 8, 4))
    off = jnp.zeros((1, 4, 4, 18))
    wgt = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(NotImplementedError, match="stride"):
        modulated_deform_conv(x, off, None, wgt, stride=2, max_offset=4)


def test_spynet_parity(rng):
    ref_mod = load_ref_arch("spynet_arch")
    tnet = ref_mod.SpyNet(load_path=None)
    tnet.eval()
    ref = rng.random((1, 3, 64, 64)).astype(np.float32)
    supp = rng.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(ref), torch.from_numpy(supp)).numpy()

    net = build_network(dict(type="SpyNet"))
    r = jnp.asarray(ref.transpose(0, 2, 3, 1))
    s = jnp.asarray(supp.transpose(0, 2, 3, 1))
    variables = net.init(jax.random.PRNGKey(0), r, s)
    rules = [(r"basic_module\.(\d+)\.basic_module\.(\d+)",
              lambda m: f"basic_module_{m.group(1)}."
                        f"conv{int(m.group(2)) // 2}"),
             (r"^(mean|std)$", None)]
    params = convert_state_dict(
        {k: v.numpy() for k, v in tnet.state_dict().items()},
        variables["params"], key_rules=rules)
    got = net.apply({"params": params}, r, s)
    # flow is (Δx, Δy) channel-last here vs (2,H,W) channel-first there
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_basicvsr_forward():
    net = build_network(dict(type="BasicVSR", num_feat=8, num_block=1))
    x = jnp.zeros((1, 3, 64, 64, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 3, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_edvr_forward():
    net = build_network(dict(type="EDVR", num_feat=8, num_frame=5,
                             deformable_groups=2, num_extract_block=1,
                             num_reconstruct_block=1))
    x = jnp.zeros((1, 5, 16, 16, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 64, 64, 3)


def test_duf_forward():
    net = build_network(dict(type="DUF", scale=4, num_layer=16))
    x = jnp.zeros((1, 7, 16, 16, 3))
    variables = jax.jit(lambda k, a: net.init(k, a, train=False))(
        jax.random.PRNGKey(0), x)
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)


def test_toflow_forward():
    net = build_network(dict(type="TOFlow"))
    x = jnp.zeros((1, 7, 32, 32, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 32, 32, 3)


def test_ridnet_parity(rng):
    ref_mod = load_ref_arch("ridnet_arch")
    tnet = ref_mod.RIDNet(3, 16, 3, num_block=1)
    tnet.eval()
    x = rng.random((1, 3, 24, 24)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    net = build_network(dict(type="RIDNet", in_channels=3, mid_channels=16,
                             out_channels=3, num_block=1))
    xx = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = net.init(jax.random.PRNGKey(0), xx)
    rules = [
        (r"^(sub_mean|add_mean)\..*", None),
        (r"^body\.(\d+)\.", lambda m: f"body_{m.group(1)}."),
        (r"merge\.dilation1\.0\.", "merge.d1_conv1."),
        (r"merge\.dilation1\.2\.", "merge.d1_conv2."),
        (r"merge\.dilation2\.0\.", "merge.d2_conv1."),
        (r"merge\.dilation2\.2\.", "merge.d2_conv2."),
        (r"merge\.aggregation\.0\.", "merge.agg."),
        (r"block2\.body\.0\.", "block2.conv1."),
        (r"block2\.body\.2\.", "block2.conv2."),
        (r"block2\.body\.4\.", "block2.conv3."),
        (r"ca\.attention\.1\.", "ca.fc1."),
        (r"ca\.attention\.3\.", "ca.fc2."),
    ]
    params = convert_state_dict(
        {k: v.numpy() for k, v in tnet.state_dict().items()},
        variables["params"], key_rules=rules)
    got = net.apply({"params": params}, xx)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # 101s; scan-vs-unrolled self-consistency
def test_basicvsr_scan_matches_unrolled_reference():
    """The nn.scan'd recurrence must equal the step-by-step python unroll
    (same params, same flow padding semantics)."""
    from image_restoration_tpu.archs.basicvsr_arch import BasicVSR
    from image_restoration_tpu.archs.arch_util import flow_warp
    from image_restoration_tpu.ops.pixel_ops import pixel_shuffle
    from image_restoration_tpu.ops.resize import resize

    net = BasicVSR(num_feat=8, num_block=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 5, 64, 64, 3)), jnp.float32)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    got = np.asarray(jax.jit(lambda p, x: net.apply({"params": p}, x))(
        v["params"], x))

    # independent unrolled re-implementation through the same submodules
    def unrolled(params, x):
        def run(mdl, x):
            n, t, h, w, c = x.shape
            ff, fb = mdl.get_flow(x)
            out_bwd = [None] * t
            feat = jnp.zeros((n, h, w, mdl.num_feat), x.dtype)
            for i in range(t - 1, -1, -1):
                if i < t - 1:
                    feat = flow_warp(feat, fb[:, i])
                feat = mdl.backward_trunk(
                    jnp.concatenate([x[:, i], feat], -1))
                out_bwd[i] = feat
            outs = []
            feat = jnp.zeros((n, h, w, mdl.num_feat), x.dtype)
            for i in range(t):
                if i > 0:
                    feat = flow_warp(feat, ff[:, i - 1])
                feat = mdl.forward_trunk(
                    jnp.concatenate([x[:, i], feat], -1))
                o = jnp.concatenate([out_bwd[i], feat], -1)
                o = nn_lrelu(mdl.fusion(o))
                o = nn_lrelu(pixel_shuffle(mdl.upconv1(o), 2))
                o = nn_lrelu(pixel_shuffle(mdl.upconv2(o), 2))
                o = nn_lrelu(mdl.conv_hr(o))
                o = mdl.conv_last(o)
                outs.append(o + resize(x[:, i], (4 * h, 4 * w), "bilinear"))
            return jnp.stack(outs, 1)

        return net.apply({"params": params}, x, method=run)

    def nn_lrelu(v, slope=0.1):
        return jnp.where(v >= 0, v, v * slope)

    want = np.asarray(jax.jit(unrolled)(v["params"], x))
    np.testing.assert_allclose(got, want, atol=1e-5)
