"""Device-side image geometry: homography, perspective warp, polygon
masks, crop-resize — the jittable equivalents of the cv2 host stages in
the product pipeline (ref api_plate_oto.py:264-320,455-466:
boundingRect/drawContours/bitwise_and/resize/getPerspectiveTransform/
warpPerspective/fillPoly) and of the degradation engine's perspective
round trip (ref basicsr/data/degradations.py:386-416).

Conventions (matched to OpenCV):
  * resize: half-pixel centers — src_x = (dst_x + 0.5) * (w_src / w_dst)
    - 0.5, bilinear, edge clamp (cv2.resize INTER_LINEAR; cv2's uint8
    path rounds through 5-bit fixed-point weights, so uint8 outputs can
    differ by ~1 LSB from this float path).
  * warp_perspective: dst(x) = src(H⁻¹ x), bilinear, BORDER_CONSTANT 0.
  * quad_mask: binary inside test at pixel centers for a convex quad,
    winding-robust (cv2.fillPoly semantics up to edge-pixel rounding;
    cv2.drawContours LINE_AA additionally feathers ~1 px at the edge).

All functions are single-image; batch with jax.vmap. Everything is
data-dependent VALUES only (shapes stay static), so the whole product
pipeline after JPEG decode can live in one jitted graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def homography_from_points(src, dst):
    """Solve the 8-dof homography mapping src→dst (4 points each, (4,2));
    cv2.getPerspectiveTransform equivalent (f32 solve vs cv2's f64)."""
    rows = []
    rhs = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y]))
        rhs.append(u)
        rows.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y]))
        rhs.append(v)
    a = jnp.stack(rows)
    b = jnp.stack(rhs)
    h8 = jnp.linalg.solve(a, b)
    return jnp.concatenate([h8, jnp.ones((1,))]).reshape(3, 3)


def det3x3(m):
    """Closed-form 3×3 determinant (no LAPACK custom call)."""
    return (m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
            - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
            + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]))


def inv3x3(m):
    """Closed-form 3×3 inverse (adjugate / det). No LAPACK custom call —
    keeps exported engines portable (a deserialized jax.export artifact
    whose graph contains lapack custom calls segfaults in a fresh
    process) and lowers to plain arithmetic on TPU."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e]),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f]),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d]),
    ])
    det = a * co[0, 0] + b * co[1, 0] + c * co[2, 0]
    return co / det


def homography_square_to_quad(t, quad):
    """Closed-form homography mapping the axis-aligned square
    [(0,0),(t,0),(t,t),(0,t)] to `quad` ((4,2), same vertex order:
    TL,TR,BR,BL). Equals homography_from_points(square, quad) without
    the 8×8 LAPACK solve (projective square→quad standard form), so it
    can live inside exported engines. Degenerate quads yield non-finite
    entries, like the solve."""
    q = quad.astype(jnp.float32)
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = (q[0], q[1], q[2], q[3])
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    sx, sy = x0 - x1 + x2 - x3, y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    g = (sx * dy2 - dx2 * sy) / den
    h = (dx1 * sy - sx * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    m_unit = jnp.stack([jnp.stack([a, b, x0]),
                        jnp.stack([d, e, y0]),
                        jnp.stack([g, h, jnp.ones_like(g)])])
    scale = jnp.asarray([[1.0 / t, 0.0, 0.0],
                         [0.0, 1.0 / t, 0.0],
                         [0.0, 0.0, 1.0]], jnp.float32)
    return m_unit @ scale


def warp_perspective(img, h_mat):
    """Bilinear inverse warp of (H,W,C) by 3×3 homography (dst→src uses
    h⁻¹ sampling, like cv2.warpPerspective; border = constant 0)."""
    hh, ww, c = img.shape
    hi = inv3x3(h_mat)
    gy, gx = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32),
                          jnp.arange(ww, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1) @ hi.T
    sx = pts[..., 0] / jnp.maximum(jnp.abs(pts[..., 2]), 1e-8) * \
        jnp.sign(pts[..., 2])
    sy = pts[..., 1] / jnp.maximum(jnp.abs(pts[..., 2]), 1e-8) * \
        jnp.sign(pts[..., 2])

    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    wx, wy = sx - x0, sy - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi <= hh - 1) & (xi >= 0) & (xi <= ww - 1)
        yc = jnp.clip(yi, 0, hh - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
        vals = img[yc, xc]
        return vals * inside[..., None].astype(img.dtype)

    v00, v01 = gather(y0, x0), gather(y0, x0 + 1)
    v10, v11 = gather(y0 + 1, x0), gather(y0 + 1, x0 + 1)
    wx, wy = wx[..., None], wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
            v10 * (1 - wx) * wy + v11 * wx * wy)


def quad_mask(quad, hw):
    """(4,2) quad (x,y vertices in polygon order, any winding, convex OR
    self-intersecting) → (H,W) float 0/1 inside mask at pixel centers.

    Even-odd ray casting, matching cv2.fillPoly's fill rule for the
    arbitrary quads a detector can emit — a convex half-plane test would
    return an EMPTY mask for a bowtie-ordered quad that cv2 fills."""
    h, w = hw
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    q = quad.astype(jnp.float32)
    nxt = jnp.roll(q, -1, axis=0)
    x_i, y_i = q[:, 0, None, None], q[:, 1, None, None]       # (4,1,1)
    x_j, y_j = nxt[:, 0, None, None], nxt[:, 1, None, None]
    # horizontal ray to +x from each pixel center: an edge crosses it iff
    # the endpoints straddle the scanline and the intersection lies right
    straddle = (y_i > gy[None]) != (y_j > gy[None])
    denom = jnp.where(jnp.abs(y_j - y_i) < 1e-12, 1e-12, y_j - y_i)
    x_cross = (x_j - x_i) * (gy[None] - y_i) / denom + x_i
    hits = straddle & (gx[None] < x_cross)
    inside = jnp.sum(hits.astype(jnp.int32), axis=0) % 2 == 1
    return inside.astype(jnp.float32)


def quad_mask_aa(quad, hw, radius: float = 1.5):
    """quad_mask dilated by `radius` px: the twin of cv2.drawContours
    (filled, LINE_AA) followed by `mask > 0` — the host crop composite
    keeps every pixel the anti-aliased edge ink touches, which reaches
    ~1.5 px outside the polygon (calibrated vs cv2: 0.1% residual
    disagreement at r=1.5 over random plate-like quads)."""
    h, w = hw
    inside = quad_mask(quad, hw)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    q = quad.astype(jnp.float32)
    nxt = jnp.roll(q, -1, axis=0)
    a, b = q[:, None, None, :], nxt[:, None, None, :]      # (4,1,1,2)
    ab = b - a
    ap_x, ap_y = gx[None] - a[..., 0], gy[None] - a[..., 1]
    denom = ab[..., 0] ** 2 + ab[..., 1] ** 2 + 1e-12
    t = jnp.clip((ap_x * ab[..., 0] + ap_y * ab[..., 1]) / denom, 0.0, 1.0)
    dx = ap_x - t * ab[..., 0]
    dy = ap_y - t * ab[..., 1]
    dist = jnp.min(jnp.sqrt(dx * dx + dy * dy), axis=0)
    return jnp.maximum(inside, (dist <= radius).astype(jnp.float32))


def bbox_of_quad(quad, hw):
    """cv2.boundingRect semantics on integer points: x0 = min, w =
    max - min + 1, clamped into the (H,W) image like the host path
    (serve/pipeline.py _crop_plate). Returns float32 (x0, y0, w, h)."""
    h, w = hw
    q = jnp.round(quad.astype(jnp.float32))
    x0 = jnp.maximum(jnp.min(q[:, 0]), 0.0)
    y0 = jnp.maximum(jnp.min(q[:, 1]), 0.0)
    bw = jnp.maximum(jnp.max(q[:, 0]) - x0 + 1.0, 1.0)
    bh = jnp.maximum(jnp.max(q[:, 1]) - y0 + 1.0, 1.0)
    bw = jnp.minimum(bw, w - x0)
    bh = jnp.minimum(bh, h - y0)
    return x0, y0, bw, bh


def _axis_coords(x0, extent, n_dst, out_extent):
    """Source sample coordinates for resizing a [x0, x0+extent) crop to
    out_extent pixels (cv2.resize half-pixel convention), clamped to the
    CROP (the host path crops first, so taps never leave the crop)."""
    i = jnp.arange(n_dst, dtype=jnp.float32)
    s = (i + 0.5) * (extent / out_extent) - 0.5 + x0
    return jnp.clip(s, x0, x0 + extent - 1.0)


def crop_resize(img, bbox, out_hw):
    """Crop (x0,y0,w,h) from (H,W,C) and bilinear-resize to out_hw —
    equivalent to `cv2.resize(img[y0:y0+h, x0:x0+w], out_hw)` with
    data-dependent bbox VALUES under jit (static shapes)."""
    x0, y0, bw, bh = bbox
    oh, ow = out_hw
    sx = _axis_coords(x0, bw, ow, float(ow))
    sy = _axis_coords(y0, bh, oh, float(oh))
    return _bilinear_grid(img, sy, sx, (y0, y0 + bh - 1.0),
                          (x0, x0 + bw - 1.0))


def _bilinear_grid(img, sy, sx, y_range, x_range):
    """Separable bilinear gather at the (sy × sx) grid, taps clamped to
    [y_range] × [x_range] (the crop bounds)."""
    h, w, _ = img.shape
    y0f, x0f = jnp.floor(sy), jnp.floor(sx)
    wy, wx = sy - y0f, sx - x0f

    def cl(v, lo, hi):
        return jnp.clip(v, lo, hi).astype(jnp.int32)

    yl = cl(y0f, y_range[0], y_range[1])
    yh = cl(y0f + 1, y_range[0], y_range[1])
    xl = cl(x0f, x_range[0], x_range[1])
    xh = cl(x0f + 1, x_range[0], x_range[1])
    top = img[yl][:, xl] * (1 - wx)[None, :, None] + \
        img[yl][:, xh] * wx[None, :, None]
    bot = img[yh][:, xl] * (1 - wx)[None, :, None] + \
        img[yh][:, xh] * wx[None, :, None]
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


def pad_resize(img, bbox, out_hw):
    """Aspect-preserving resize of the (x0,y0,w,h) crop into an out_hw
    canvas, centered, zero fill — the device twin of
    serve/pipeline.resize_with_padding (PIL thumbnail+expand semantics:
    scale = min(T/w, T/h, 1), integer-floored target, //2 offsets)."""
    x0, y0, bw, bh = bbox
    oh, ow = out_hw
    scale = jnp.minimum(jnp.minimum(ow / bw, oh / bh), 1.0)
    nw = jnp.maximum(jnp.floor(bw * scale), 1.0)
    nh = jnp.maximum(jnp.floor(bh * scale), 1.0)
    px = jnp.floor((ow - nw) / 2.0)
    py = jnp.floor((oh - nh) / 2.0)
    j = jnp.arange(ow, dtype=jnp.float32)
    i = jnp.arange(oh, dtype=jnp.float32)
    sx = jnp.clip((j - px + 0.5) * (bw / nw) - 0.5 + x0, x0,
                  x0 + bw - 1.0)
    sy = jnp.clip((i - py + 0.5) * (bh / nh) - 0.5 + y0, y0,
                  y0 + bh - 1.0)
    out = _bilinear_grid(img, sy, sx, (y0, y0 + bh - 1.0),
                         (x0, x0 + bw - 1.0))
    placed = ((j[None, :] >= px) & (j[None, :] < px + nw) &
              (i[:, None] >= py) & (i[:, None] < py + nh))
    return out * placed[..., None].astype(out.dtype)
