"""ops/geometry.py vs the OpenCV host stages it replaces (the product
pipeline's crop/mask/pad/warp, ref api_plate_oto.py:264-320,455-466).

cv2's uint8 resize/warp paths round through fixed-point bilinear weights,
so parity is ~1-2 LSB for interior pixels; polygon edges differ by the
rasterization convention (≤ a 1-px boundary band)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from image_restoration_tpu.ops.geometry import (  # noqa: E402
    bbox_of_quad, crop_resize, homography_from_points, pad_resize,
    quad_mask, quad_mask_aa, warp_perspective)


def _rand_quad(rng, t=256, margin=20):
    """A convex-ish plate-like quad: jittered rectangle corners in
    [p1,p2,p5,p4] (TL,TR,BR,BL) order, like the pipeline builds."""
    x0, y0 = rng.integers(margin, t // 2, 2)
    x1 = rng.integers(x0 + 40, t - margin)
    y1 = rng.integers(y0 + 20, t - margin)
    j = lambda: rng.integers(-8, 9, 2)
    return np.array([[x0, y0] + j(), [x1, y0] + j(),
                     [x1, y1] + j(), [x0, y1] + j()], np.int32)


def test_homography_matches_cv2():
    rng = np.random.default_rng(0)
    t = 256.0
    src = np.float32([[0, 0], [t, 0], [t, t], [0, t]])
    for _ in range(5):
        dst = _rand_quad(rng).astype(np.float32)
        want = cv2.getPerspectiveTransform(src, dst)
        got = np.asarray(homography_from_points(jnp.asarray(src),
                                                jnp.asarray(dst)))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_homography_square_closed_form():
    """The LAPACK-free square→quad closed form (used inside exported
    engines) equals both cv2 and the general 8×8 solve; a degenerate
    quad yields non-finite entries (the guard's contract). inv3x3
    matches numpy."""
    from image_restoration_tpu.ops.geometry import (
        homography_square_to_quad, inv3x3)
    rng = np.random.default_rng(7)
    t = 256.0
    src = np.float32([[0, 0], [t, 0], [t, t], [0, t]])
    for _ in range(5):
        dst = _rand_quad(rng).astype(np.float32)
        want = cv2.getPerspectiveTransform(src, dst)
        got = np.asarray(homography_square_to_quad(t, jnp.asarray(dst)))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(inv3x3(jnp.asarray(got))),
                                   np.linalg.inv(got), rtol=2e-4,
                                   atol=2e-5)
    degenerate = jnp.asarray([[16., 63.], [63., 0.], [63., 0.],
                              [0., 38.]])
    m = np.asarray(homography_square_to_quad(t, degenerate))
    assert not np.isfinite(m).all()


def test_warp_perspective_matches_cv2():
    rng = np.random.default_rng(1)
    t = 128
    img = rng.random((t, t, 3)).astype(np.float32)
    src = np.float32([[0, 0], [t, 0], [t, t], [0, t]])
    dst = _rand_quad(rng, t=t, margin=10).astype(np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    want = cv2.warpPerspective(img, m, (t, t))  # float path, no fixpoint
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(m)))
    # interior agrees to float tolerance; the quad edge band differs by
    # the border convention — compare where both agree the pixel is
    # inside-ish (both nonzero)
    both = (np.abs(want).sum(-1) > 0) & (np.abs(got).sum(-1) > 0)
    assert both.mean() > 0.05
    diff = np.abs(want - got)[both]
    assert np.quantile(diff, 0.99) < 2e-2, np.quantile(diff, 0.99)
    # disagreement on membership is confined to a thin band
    disagree = (np.abs(want).sum(-1) > 0) ^ (np.abs(got).sum(-1) > 0)
    assert disagree.mean() < 0.03, disagree.mean()


def test_quad_mask_matches_fillpoly():
    rng = np.random.default_rng(2)
    t = 256
    for _ in range(5):
        quad = _rand_quad(rng, t=t)
        want = np.zeros((t, t), np.uint8)
        cv2.fillPoly(want, [quad], 1)
        got = np.asarray(quad_mask(jnp.asarray(quad, jnp.float32),
                                   (t, t)))
        disagree = (want > 0) ^ (got > 0)
        # rasterization convention differences live on the polygon edge
        assert disagree.mean() < 0.01, disagree.mean()
        # and the interior is exact: erode the cv2 mask by 2px — inside
        # it the two must agree everywhere
        k = np.ones((5, 5), np.uint8)
        core = cv2.erode(want, k) > 0
        assert (got[core] > 0).all()
        outside = cv2.dilate(want, k) == 0
        assert (got[outside] == 0).all()
    # reversed winding gives the same mask
    quad = _rand_quad(rng, t=t)
    a = np.asarray(quad_mask(jnp.asarray(quad, jnp.float32), (t, t)))
    b = np.asarray(quad_mask(jnp.asarray(quad[::-1].copy(), jnp.float32),
                             (t, t)))
    np.testing.assert_array_equal(a, b)


def test_quad_mask_nonconvex_matches_fillpoly():
    """Random-weight detectors emit arbitrary vertex orders (bowties) —
    the mask must follow cv2's even-odd fill, not a convex test (which
    returns empty and was a real bug caught by the pipeline test)."""
    t = 64
    bowtie = np.array([[17, 63], [63, 0], [63, 11], [0, 41]], np.int32)
    want = np.zeros((t, t), np.uint8)
    cv2.fillPoly(want, [bowtie], 1)
    got = np.asarray(quad_mask(jnp.asarray(bowtie, jnp.float32), (t, t)))
    assert (want > 0).mean() > 0.1          # cv2 really fills it
    disagree = (want > 0) ^ (got > 0)
    assert disagree.mean() < 0.03, disagree.mean()


def test_quad_mask_aa_matches_drawcontours():
    """The crop-composite mask (drawContours filled LINE_AA, then >0)
    keeps the AA ink band; quad_mask_aa reproduces it to ~0.1%."""
    rng = np.random.default_rng(6)
    t = 256
    for _ in range(5):
        quad = _rand_quad(rng, t=t)
        want = np.zeros((t, t), np.uint8)
        cv2.drawContours(want, [quad], -1, (255,), -1, cv2.LINE_AA)
        got = np.asarray(quad_mask_aa(jnp.asarray(quad, jnp.float32),
                                      (t, t)))
        disagree = (want > 0) ^ (got > 0)
        assert disagree.mean() < 0.01, disagree.mean()


def test_bbox_and_crop_resize_match_cv2():
    rng = np.random.default_rng(3)
    t = 256
    img = (rng.random((t, t, 3)) * 255).astype(np.float32)
    for _ in range(5):
        quad = _rand_quad(rng, t=t)
        x, y, w, h = cv2.boundingRect(quad)
        x, y = max(x, 0), max(y, 0)
        bx, by, bw, bh = [float(np.asarray(v)) for v in
                          bbox_of_quad(jnp.asarray(quad, jnp.float32),
                                       (t, t))]
        assert (bx, by) == (x, y) and (bw, bh) == (w, h), \
            ((bx, by, bw, bh), (x, y, w, h))
        want = cv2.resize(img[y:y + h, x:x + w], (t, t),
                          interpolation=cv2.INTER_LINEAR)
        got = np.asarray(crop_resize(jnp.asarray(img),
                                     (bx, by, bw, bh), (t, t)))
        np.testing.assert_allclose(got, want, rtol=0, atol=0.51)


def test_pad_resize_matches_host_helper():
    from image_restoration_tpu.serve.pipeline import resize_with_padding
    rng = np.random.default_rng(4)
    t = 256
    img = (rng.random((t, t, 3)) * 255).astype(np.float32)
    for _ in range(5):
        quad = _rand_quad(rng, t=t)
        x, y, w, h = cv2.boundingRect(quad)
        crop_u8 = img[y:y + h, x:x + w].astype(np.uint8)
        want = resize_with_padding(crop_u8, (t, t)).astype(np.float32)
        got = np.asarray(pad_resize(
            jnp.asarray(img.astype(np.uint8).astype(np.float32)),
            (float(x), float(y), float(w), float(h)), (t, t)))
        # cv2's uint8 resize is fixed-point; compare rounded with a small
        # tolerance and require most pixels near-exact
        diff = np.abs(np.round(got) - want)
        assert np.quantile(diff, 0.99) <= 2.0, np.quantile(diff, 0.99)
        assert diff.max() <= 16.0, diff.max()  # worst-case fixpoint pixel
        # the letterbox padding bands are EXACT zero (geometry computed
        # like the host helper: min-scale, floored target, centered)
        scale = min(t / w, t / h, 1.0)
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        px, py = (t - nw) // 2, (t - nh) // 2
        assert (got[:py] == 0).all() and (got[py + nh:] == 0).all()
        assert (got[:, :px] == 0).all() and (got[:, px + nw:] == 0).all()


def test_warp_roundtrip_identity():
    """warping by H then H⁻¹ at identity quad is the identity map."""
    t = 64
    img = np.random.default_rng(5).random((t, t, 3)).astype(np.float32)
    src = jnp.asarray(np.float32([[0, 0], [t, 0], [t, t], [0, t]]))
    m = homography_from_points(src, src)
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-5)
    out = np.asarray(warp_perspective(jnp.asarray(img), m))
    np.testing.assert_allclose(out, img, atol=1e-5)
