"""Golden tests for the core op layer against independent numpy/scipy/torch
formulations (and, where importable as leaf modules, the reference's own
pure-Python math)."""

import importlib.util
import math

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from image_restoration_tpu.ops import (
    upfirdn2d, make_resample_kernel, fused_leaky_relu, modulated_conv2d,
    filter2d, pixel_shuffle, pixel_unshuffle)
from image_restoration_tpu.ops.modulated_conv import conv2d, conv_transpose2d
from image_restoration_tpu.ops.resize import (
    matlab_resize_matrix, imresize, cv2_resize_matrix, resize,
    dynamic_resize_matrix)
from image_restoration_tpu.ops.pallas import fused_bias_lrelu_pallas


def _upfirdn2d_numpy(x_nchw, kernel, up, down, pad):
    """Independent reference: zero-insert -> pad -> convolve -> subsample."""
    n, c, h, w = x_nchw.shape
    out = np.zeros((n, c, h * up, w * up), dtype=np.float64)
    out[:, :, ::up, ::up] = x_nchw
    p0, p1 = pad
    padded = np.zeros((n, c, h * up + p0 + p1, w * up + p0 + p1))
    hs, ws = out.shape[2], out.shape[3]
    # place with cropping for negative pads
    src_h0, src_w0 = max(-p0, 0), max(-p0, 0)
    dst_h0, dst_w0 = max(p0, 0), max(p0, 0)
    src_h1 = hs - max(-p1, 0)
    src_w1 = ws - max(-p1, 0)
    padded[:, :, dst_h0:dst_h0 + (src_h1 - src_h0),
           dst_w0:dst_w0 + (src_w1 - src_w0)] = \
        out[:, :, src_h0:src_h1, src_w0:src_w1]
    res = np.stack([
        np.stack([scipy.signal.convolve2d(padded[i, j], kernel, mode="valid")
                  for j in range(c)]) for i in range(n)])
    return res[:, :, ::down, ::down]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 1)),
    (1, 1, (0, 0)),
])
def test_upfirdn2d_matches_numpy(rng, up, down, pad):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)  # NCHW for ref
    k1 = np.array([1.0, 3.0, 3.0, 1.0])
    k = np.outer(k1, k1) / np.outer(k1, k1).sum()
    want = _upfirdn2d_numpy(x.astype(np.float64), k, up, down, pad)
    got = upfirdn2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                    jnp.asarray(k, jnp.float32), up=up, down=down, pad=pad)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_make_resample_kernel():
    k = make_resample_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)


def test_fused_leaky_relu():
    x = jnp.asarray([[-1.0, 0.5], [2.0, -3.0]])
    b = jnp.asarray([0.5, -0.5])
    got = fused_leaky_relu(x, b)
    xb = np.array([[-0.5, 0.0], [2.5, -3.5]])
    want = np.where(xb >= 0, xb, xb * 0.2) * math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_fused_bias_lrelu_pallas_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 128)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    want = fused_leaky_relu(x, b)
    got = fused_bias_lrelu_pallas(x, b, block_m=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------- torch refs

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 4, 9, 9)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    got = conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                 jnp.asarray(w.transpose(2, 3, 1, 0)), padding=1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_matches_torch(rng):
    x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)  # (out,in,k,k)
    # torch conv_transpose2d wants (in, out, k, k)
    want = F.conv_transpose2d(torch.from_numpy(x),
                              torch.from_numpy(w.transpose(1, 0, 2, 3)),
                              stride=2).numpy()
    got = conv_transpose2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(w.transpose(2, 3, 1, 0)), stride=2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def _modulated_conv_torch(x, weight, style, demodulate):
    """Independent per-sample loop formulation of StyleGAN2 modulation."""
    n = x.shape[0]
    outs = []
    for i in range(n):
        w = weight * style[i][None, :, None, None]  # (out,in,k,k)
        if demodulate:
            d = 1.0 / np.sqrt((w ** 2).sum(axis=(1, 2, 3)) + 1e-8)
            w = w * d[:, None, None, None]
        o = F.conv2d(torch.from_numpy(x[i:i + 1]), torch.from_numpy(w),
                     padding=weight.shape[-1] // 2)
        outs.append(o.numpy())
    return np.concatenate(outs, 0)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_matches_torch(rng, demodulate):
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    style = (rng.standard_normal((2, 4)) * 0.5 + 1.0).astype(np.float32)
    want = _modulated_conv_torch(x, w, style, demodulate)
    got = modulated_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(w.transpose(2, 3, 1, 0)),
                           jnp.asarray(style), demodulate=demodulate)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


def test_filter2d_matches_scipy(rng):
    import scipy.ndimage
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = rng.standard_normal((2, 5, 5)).astype(np.float32)
    got = np.asarray(filter2d(jnp.asarray(x), jnp.asarray(k)))
    for i in range(2):
        for c in range(3):
            want = scipy.ndimage.correlate(x[i, :, :, c].astype(np.float64),
                                           k[i].astype(np.float64),
                                           mode="mirror")
            np.testing.assert_allclose(got[i, :, :, c], want,
                                       rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 16, 4, 5)).astype(np.float32)
    want = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-6)


def test_pixel_unshuffle_matches_torch(rng):
    x = rng.standard_normal((2, 4, 8, 10)).astype(np.float32)
    want = F.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_unshuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-6)
    # roundtrip
    rt = pixel_shuffle(pixel_unshuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2), 2)
    np.testing.assert_allclose(np.asarray(rt), x.transpose(0, 2, 3, 1), rtol=1e-6)


# ---------------------------------------------------------------- resizing


def _load_reference_matlab_functions():
    path = ("/root/reference/Car_Plate-Restoration/basicsr/utils/"
            "matlab_functions.py")
    spec = importlib.util.spec_from_file_location("ref_matlab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0])
def test_matlab_imresize_matches_reference(rng, scale):
    ref = _load_reference_matlab_functions()
    img = rng.random((16, 20, 3)).astype(np.float32)
    want = ref.imresize(img, scale, antialiasing=True)
    got = np.asarray(imresize(jnp.asarray(img), scale, antialiasing=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("interp,cv2_flag", [
    ("bilinear", "INTER_LINEAR"),
    ("bicubic", "INTER_CUBIC"),
    ("area", "INTER_AREA"),
    ("nearest", "INTER_NEAREST"),
])
@pytest.mark.parametrize("out_size", [(8, 12), (32, 48)])
def test_cv2_resize_matches_cv2(rng, interp, cv2_flag, out_size):
    import cv2
    if interp == "area" and out_size == (32, 48):
        pytest.skip("cv2 INTER_AREA upscale path is bilinear-approximated")
    img = rng.random((16, 24, 3)).astype(np.float32)
    want = cv2.resize(img, (out_size[1], out_size[0]),
                      interpolation=getattr(cv2, cv2_flag))
    got = np.asarray(resize(jnp.asarray(img), out_size, interp))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_dynamic_resize_matches_static_bilinear():
    in_len, out_len = 64, 32
    scale = in_len / out_len
    static = cv2_resize_matrix(in_len, out_len, "bilinear")
    dyn = np.asarray(dynamic_resize_matrix(
        out_len, in_len, jnp.float32(scale), jnp.int32(out_len), "bilinear"))
    np.testing.assert_allclose(dyn, static, rtol=1e-4, atol=1e-5)


def test_dynamic_resize_masks_invalid_rows():
    dyn = np.asarray(dynamic_resize_matrix(
        64, 256, jnp.float32(256 / 40), jnp.int32(40), "bilinear"))
    assert np.all(dyn[40:] == 0)
    np.testing.assert_allclose(dyn[:40].sum(axis=1), 1.0, rtol=1e-4)


# --------------------------------------------------------------- roi_align

def _np_roi_align(img, boxes, out_size, sr=2):
    """Scalar reference: torchvision.ops.roi_align, aligned=False."""
    H, W, _ = img.shape
    S = out_size
    out = np.zeros((boxes.shape[0], S, S, img.shape[2]), np.float64)
    for k, (x1, y1, x2, y2) in enumerate(boxes):
        bw = max(x2 - x1, 1.0) / S
        bh = max(y2 - y1, 1.0) / S
        for i in range(S):
            for j in range(S):
                acc = np.zeros(img.shape[2])
                for iy in range(sr):
                    for ix in range(sr):
                        y = y1 + (i + (iy + .5) / sr) * bh
                        x = x1 + (j + (ix + .5) / sr) * bw
                        if y < -1 or y > H or x < -1 or x > W:
                            continue
                        y_ = min(max(y, 0), H - 1)
                        x_ = min(max(x, 0), W - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1i = min(y0 + 1, H - 1)
                        x1i = min(x0 + 1, W - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += ((1 - ly) * (1 - lx) * img[y0, x0] +
                                (1 - ly) * lx * img[y0, x1i] +
                                ly * (1 - lx) * img[y1i, x0] +
                                ly * lx * img[y1i, x1i])
                out[k, i, j] = acc / (sr * sr)
    return out


def test_roi_align_matches_scalar_reference(rng):
    from image_restoration_tpu.ops.roi_align import roi_align
    N, H, W, K, S = 2, 32, 64, 4, 8
    img = rng.random((N, H, W, 3)).astype(np.float32)
    x1 = rng.uniform(-5, W - 10, (N, K))
    y1 = rng.uniform(-5, H - 10, (N, K))
    boxes = np.stack([x1, y1, x1 + rng.uniform(2, 30, (N, K)),
                      y1 + rng.uniform(2, 20, (N, K))], -1).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda i, b: roi_align(i, b, S))(img, boxes))
    want = np.stack([_np_roi_align(img[i], boxes[i], S) for i in range(N)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv3x3_im2col_pallas_matches_xla(rng):
    """Pallas im2col conv (full-K contraction) vs lax.conv, all widened
    stage channel shapes at a tiny spatial size (interpret mode)."""
    from image_restoration_tpu.ops.pallas.im2col_conv import conv3x3_im2col
    for cin, cout, bh in [(64, 192, 4), (32, 160, 8), (32, 64, 8)]:
        x = jnp.asarray(rng.standard_normal((2, 18, 26, cin)),
                        jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv3x3_im2col(x, w, bh=bh, out_dtype=jnp.float32,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
