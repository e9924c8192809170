"""Image resizing as separable matrix products — the TPU-native formulation.

Replaces the reference's resize call sites:
  * MATLAB-exact bicubic `imresize`
    (Car_Plate-Restoration/basicsr/utils/matlab_functions.py:86-168)
  * cv2.resize(INTER_NEAREST/LINEAR/CUBIC/AREA) used throughout the
    degradation pipeline (basicsr/data/*_degradation_dataset.py).

Any separable resize is `out = R_h @ img @ R_w^T`. We precompute the (out,in)
row/column weight matrices in numpy at trace time (static shapes), so the
whole resize is two dense matmuls that XLA tiles straight onto the MXU —
instead of the gather-heavy formulation a CPU/GPU port would use.

For the on-device degradation chain the random scale is a *traced* value;
`dynamic_resize_matrix` builds the same weight matrices with jnp from a
traced scale + valid-length, enabling random down/up round-trips inside one
jitted step with fully static shapes (rows beyond the valid output are
masked to zero).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ------------------------------------------------------------------ kernels


def _cubic_matlab(x):
    """MATLAB bicubic kernel (a=-0.5 variant), ref matlab_functions.py:64-74."""
    absx = np.abs(x)
    absx2, absx3 = absx ** 2, absx ** 3
    return ((1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1) +
            (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2) *
            ((absx > 1) & (absx <= 2)))


def _cubic_cv2(x):
    """cv2 INTER_CUBIC kernel (a=-0.75)."""
    a = -0.75
    absx = np.abs(x)
    absx2, absx3 = absx ** 2, absx ** 3
    return (((a + 2) * absx3 - (a + 3) * absx2 + 1) * (absx <= 1) +
            (a * absx3 - 5 * a * absx2 + 8 * a * absx - 4 * a) *
            ((absx > 1) & (absx < 2)))


def _linear(x):
    absx = np.abs(x)
    return np.maximum(0.0, 1.0 - absx)


# ------------------------------------------------- MATLAB-exact imresize


def matlab_resize_matrix(in_length: int, out_length: int,
                         antialiasing: bool = True) -> np.ndarray:
    """Dense (out_length, in_length) MATLAB-bicubic weight matrix.

    Port of calculate_weights_indices (matlab_functions.py:8-61): 1-indexed
    centers, kernel widened by 1/scale when antialiased downscaling, weights
    renormalized, out-of-range taps reflected (via the mirrored aux indices).
    """
    scale = out_length / in_length
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]  # (out, p), 1-indexed
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic_matlab(dist * scale)
    else:
        weights = _cubic_matlab(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # mirror out-of-range indices (matlab symmetric padding)
    idx = (indices - 1).astype(np.int64)  # to 0-indexed
    aux = np.concatenate([np.arange(in_length),
                          np.arange(in_length - 1, -1, -1)])
    idx = aux[np.mod(idx, 2 * in_length)]

    mat = np.zeros((out_length, in_length), dtype=np.float64)
    for i in range(out_length):
        np.add.at(mat[i], idx[i], weights[i])
    return mat.astype(np.float32)


def imresize(img: jax.Array, scale: float, antialiasing: bool = True) -> jax.Array:
    """MATLAB-exact bicubic resize of an NHWC (or HWC) float image."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, h, w, c = img.shape
    oh, ow = int(np.ceil(h * scale)), int(np.ceil(w * scale))
    rh = jnp.asarray(matlab_resize_matrix(h, oh, antialiasing), img.dtype)
    rw = jnp.asarray(matlab_resize_matrix(w, ow, antialiasing), img.dtype)
    out = jnp.einsum("oh,nhwc->nowc", rh, img)
    out = jnp.einsum("pw,nowc->nopc", rw, out)
    return out[0] if squeeze else out


# --------------------------------------------------- cv2-compatible resize


def cv2_resize_matrix(in_length: int, out_length: int,
                      interpolation: str = "bilinear") -> np.ndarray:
    """Dense (out, in) matrix matching cv2.resize along one axis.

    cv2 conventions: half-pixel centers `u = (i + 0.5) * in/out - 0.5`,
    border-replicate taps. 'area' integrates pixel coverage exactly for
    downscale; for upscale cv2's INTER_AREA degenerates to bilinear-style
    sampling, which we mirror.
    """
    s = in_length / out_length  # >1 means downscale
    if interpolation == "area" and s > 1.0:
        mat = np.zeros((out_length, in_length), dtype=np.float64)
        for i in range(out_length):
            lo, hi = i * s, (i + 1) * s
            j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
            for j in range(j0, min(j1, in_length)):
                cover = min(hi, j + 1) - max(lo, j)
                if cover > 0:
                    mat[i, j] = cover / s
        return mat.astype(np.float32)

    if interpolation == "nearest":
        mat = np.zeros((out_length, in_length), dtype=np.float32)
        # cv2 INTER_NEAREST: src = floor(i * in/out)
        src = np.minimum((np.arange(out_length) * s).astype(np.int64),
                         in_length - 1)
        mat[np.arange(out_length), src] = 1.0
        return mat

    if interpolation == "bilinear_ac":
        # torch align_corners=True: src = dst*(in-1)/(out-1)
        kernel, support = _linear, 1.0
        if out_length == 1:
            u = np.zeros(1)
        else:
            u = np.arange(out_length, dtype=np.float64) * \
                (in_length - 1) / (out_length - 1)
        left = np.floor(u - support) + 1
        p = int(2 * support)
        indices = left[:, None] + np.arange(p)[None, :]
        weights = kernel(u[:, None] - indices)
        wsum = weights.sum(axis=1, keepdims=True)
        weights = np.where(wsum > 0, weights / wsum, weights)
        idx = np.clip(indices.astype(np.int64), 0, in_length - 1)
        mat = np.zeros((out_length, in_length), dtype=np.float64)
        for i in range(out_length):
            np.add.at(mat[i], idx[i], weights[i])
        return mat.astype(np.float32)

    if interpolation in ("bilinear", "linear", "area"):
        kernel, support = _linear, 1.0
    elif interpolation in ("bicubic", "cubic"):
        kernel, support = _cubic_cv2, 2.0
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    u = (np.arange(out_length, dtype=np.float64) + 0.5) * s - 0.5
    left = np.floor(u - support) + 1
    p = int(2 * support)
    indices = left[:, None] + np.arange(p)[None, :]
    weights = kernel(u[:, None] - indices)
    wsum = weights.sum(axis=1, keepdims=True)
    weights = np.where(wsum > 0, weights / wsum, weights)
    idx = np.clip(indices.astype(np.int64), 0, in_length - 1)
    mat = np.zeros((out_length, in_length), dtype=np.float64)
    for i in range(out_length):
        np.add.at(mat[i], idx[i], weights[i])
    return mat.astype(np.float32)


def resize(img: jax.Array, out_hw, interpolation: str = "bilinear") -> jax.Array:
    """cv2.resize-compatible resize of NHWC (or HWC) images. Static shapes."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, h, w, c = img.shape
    oh, ow = out_hw
    rh = jnp.asarray(cv2_resize_matrix(h, oh, interpolation), img.dtype)
    rw = jnp.asarray(cv2_resize_matrix(w, ow, interpolation), img.dtype)
    out = jnp.einsum("oh,nhwc->nowc", rh, img)
    out = jnp.einsum("pw,nowc->nopc", rw, out)
    return out[0] if squeeze else out


# ------------------------------------------- traced-scale resize matrices


def dynamic_resize_matrix(out_length: int, in_length: int, scale,
                          valid_out, interpolation: str = "bilinear"):
    """(out_length, in_length) weight matrix for a TRACED scale factor.

    Maps `in_length` source samples onto `out_length` output slots of which
    only the first `valid_out` (traced int) are meaningful; rows past
    `valid_out` are zeroed. `scale` is the traced src/dst step (in/valid_out).
    Used by the jitted degradation chain for random down/up round trips.

    'area' here is an antialiased triangle approximation of box coverage
    (exact box integration needs data-dependent sparsity; the triangle kernel
    scaled to the step is the standard smooth surrogate).
    """
    i = jnp.arange(out_length, dtype=jnp.float32)[:, None]
    j = jnp.arange(in_length, dtype=jnp.float32)[None, :]
    u = (i + 0.5) * scale - 0.5  # src center per output row
    d = u - j
    if interpolation in ("bilinear", "linear"):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    elif interpolation in ("bicubic", "cubic"):
        a = -0.75
        ad = jnp.abs(d)
        w = jnp.where(ad <= 1, (a + 2) * ad**3 - (a + 3) * ad**2 + 1,
                      jnp.where(ad < 2,
                                a * ad**3 - 5 * a * ad**2 + 8 * a * ad - 4 * a,
                                0.0))
    elif interpolation == "area":
        width = jnp.maximum(scale, 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d) / width)
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.maximum(wsum, 1e-8)
    row_valid = (i < valid_out).astype(w.dtype)
    return w * row_valid
