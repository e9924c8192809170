"""Random occlusion masks — parity with the OCR dataset's mask suite
(basicsr/data/ocr_degradation_dataset.py:92-183: regular rectangles,
irregular brush strokes, half masks).

TPU-first split: rectangle and half masks are jittable (branchless
coordinate masks); irregular brush-stroke masks come from a host-generated
constant bank selected per sample by index (same strategy as the pyblur
kernel bank).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def random_rect_masks(key: jax.Array, shape, num_rects: int = 3,
                      min_frac: float = 0.1, max_frac: float = 0.4):
    """(N,H,W,1) masks: 1 inside `num_rects` random rectangles."""
    n, h, w = shape[0], shape[1], shape[2]
    keys = jax.random.split(key, 4)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    y0 = jax.random.uniform(keys[0], (n, 1, 1, num_rects)) * h
    x0 = jax.random.uniform(keys[1], (n, 1, 1, num_rects)) * w
    hh = (min_frac + jax.random.uniform(keys[2], (n, 1, 1, num_rects))
          * (max_frac - min_frac)) * h
    ww = (min_frac + jax.random.uniform(keys[3], (n, 1, 1, num_rects))
          * (max_frac - min_frac)) * w
    inside = ((yy >= y0) & (yy <= y0 + hh) & (xx >= x0) & (xx <= x0 + ww))
    return jnp.any(inside, axis=-1, keepdims=True).astype(jnp.float32)


def half_mask(key: jax.Array, shape):
    """(N,H,W,1): one random half (top/bottom/left/right) masked."""
    n, h, w = shape[0], shape[1], shape[2]
    side = jax.random.randint(key, (n, 1, 1, 1), 0, 4)
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    masks = jnp.stack([
        jnp.broadcast_to(yy < h // 2, (n, h, w, 1)),
        jnp.broadcast_to(yy >= h // 2, (n, h, w, 1)),
        jnp.broadcast_to(xx < w // 2, (n, h, w, 1)),
        jnp.broadcast_to(xx >= w // 2, (n, h, w, 1)),
    ], axis=0)
    sel = jnp.take_along_axis(masks, side[None], axis=0)[0]
    return sel.astype(jnp.float32)


def build_irregular_mask_bank(size: int, num: int = 64,
                              seed: int = 0) -> np.ndarray:
    """(num, size, size, 1) brush-stroke masks (host, constant bank)."""
    rng = np.random.default_rng(seed)
    bank = []
    for _ in range(num):
        m = np.zeros((size, size), np.float32)
        for _ in range(rng.integers(1, 5)):
            x, y = rng.uniform(0, size, 2)
            angle = rng.uniform(0, 2 * math.pi)
            length_total = rng.uniform(size * 0.5, size * 2)
            width = rng.integers(max(2, size // 32), max(3, size // 8))
            steps = int(length_total / 4) + 1
            for _ in range(steps):
                angle += rng.normal(0, 0.5)
                nx = x + 4 * math.cos(angle)
                ny = y + 4 * math.sin(angle)
                for t in np.linspace(0, 1, 6):
                    cx = int(x + t * (nx - x))
                    cy = int(y + t * (ny - y))
                    y0, y1 = max(0, cy - width), min(size, cy + width)
                    x0, x1 = max(0, cx - width), min(size, cx + width)
                    m[y0:y1, x0:x1] = 1.0
                x, y = nx, ny
                x = min(max(x, 0), size - 1)
                y = min(max(y, 0), size - 1)
        bank.append(m[..., None])
    return np.stack(bank)


def apply_random_mask(key: jax.Array, img: jax.Array,
                      irregular_bank: jax.Array,
                      mask_prob: float = 0.5, fill: float = 1.0):
    """w.p. mask_prob, occlude each image with a random mask type
    (rect / irregular / half), filling with `fill` (white, like the
    reference's masked plate crops)."""
    n = img.shape[0]
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    rect = random_rect_masks(k1, img.shape)
    half = half_mask(k2, img.shape)
    idx = jax.random.randint(k3, (n,), 0, irregular_bank.shape[0])
    irreg = irregular_bank[idx]
    kind = jax.random.randint(k4, (n, 1, 1, 1), 0, 3)
    mask = jnp.where(kind == 0, rect, jnp.where(kind == 1, irreg, half))
    do = jax.random.bernoulli(k0, mask_prob, (n, 1, 1, 1))
    mask = mask * do
    return img * (1 - mask) + fill * mask, mask
