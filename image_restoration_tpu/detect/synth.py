"""On-device synthetic plate-scene generator for detector training.

Generates license-plate-like scenes ENTIRELY on device with jax.random —
a bright textured quadrilateral "plate" with dark character-like strokes
over a smooth noisy background — plus the matching MultiBox target row
(bbox + the reference's 5-landmark layout + class label).

Why on-device: the reference trains its detector from a disk dataset
(Plate_Detect/Retina-License-Plate/data/dataset.py); this repo's chip
sits behind the axon tunnel (~14 MB/s host↔device), so streaming host
batches would measure the tunnel, not training. Generating each batch
inside the jitted step makes a whole convergence run a handful of
dispatches — the same design as the on-device FFHQ degradation pipeline
(data/pipelines.py). Used by scripts/bench_detector_convergence.py and
as a dependency-free smoke-training data source.

Landmark order matches the product pipeline's consumption
(serve/pipeline.py _detect_quad; api_plate_oto.py:238-245): p1=TL,
p2=TR, p3=center, p4=BL, p5=BR, all normalized to [0,1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def synth_scene(key: jax.Array, size: int):
    """One (size, size, 3) BGR [0,255] scene and its (15,) target row."""
    (kbg, knz, kw, ka, kx, ky, kv, kf, kp) = jax.random.split(key, 9)

    # smooth background: bilinear-upsampled coarse noise + grain
    coarse = jax.random.uniform(kbg, (8, 8, 3), minval=30.0, maxval=190.0)
    bg = jax.image.resize(coarse, (size, size, 3), "bilinear")
    bg = bg + jax.random.normal(knz, (size, size, 3)) * 8.0

    # plate geometry as canvas fractions: width 25-55%, aspect ~2.2-3.6
    wfrac = jax.random.uniform(kw, minval=0.25, maxval=0.55)
    hfrac = wfrac * jax.random.uniform(ka, minval=0.28, maxval=0.45)
    x0 = jax.random.uniform(kx, minval=0.03, maxval=1.0) * (0.94 - wfrac) \
        + 0.03
    y0 = jax.random.uniform(ky, minval=0.03, maxval=1.0) * (0.94 - hfrac) \
        + 0.03
    x1, y1 = x0 + wfrac, y0 + hfrac

    fx = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    fy = fx
    inx = (fx >= x0) & (fx < x1)
    iny = (fy >= y0) & (fy < y1)
    plate_mask = iny[:, None] & inx[None, :]

    # character-like strokes: dark vertical bands in the plate's middle
    plate_val = jax.random.uniform(kv, minval=190.0, maxval=250.0)
    freq = jax.random.uniform(kf, minval=5.0, maxval=9.0)
    phase = jax.random.uniform(kp, minval=0.0, maxval=2.0 * jnp.pi)
    strokes = jnp.sin((fx - x0) / wfrac * freq * 2.0 * jnp.pi + phase) > 0.2
    inner_y = (fy >= y0 + 0.25 * hfrac) & (fy < y1 - 0.25 * hfrac)
    inner_x = (fx >= x0 + 0.06 * wfrac) & (fx < x1 - 0.06 * wfrac)
    text_mask = (inner_y[:, None] & (strokes & inner_x)[None, :]
                 & plate_mask)

    img = jnp.where(plate_mask[..., None], plate_val, bg)
    img = jnp.where(text_mask[..., None], 40.0, img)
    img = jnp.clip(img, 0.0, 255.0)

    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    target = jnp.stack([x0, y0, x1, y1,          # bbox
                        x0, y0, x1, y0,          # p1=TL, p2=TR
                        cx, cy,                  # p3=center
                        x0, y1, x1, y1,          # p4=BL, p5=BR
                        jnp.float32(1.0)])       # class: plate
    return img, target


def make_batch(key: jax.Array, batch: int, size: int, max_targets: int = 4):
    """(batch, size, size, 3) BGR [0,255] images + (batch, max_targets, 15)
    MultiBox targets (row 0 real, the rest label-0 padding)."""
    keys = jax.random.split(key, batch)
    imgs, rows = jax.vmap(partial(synth_scene, size=size))(keys)
    targets = jnp.zeros((batch, max_targets, 15), jnp.float32)
    targets = targets.at[:, 0].set(rows)
    return imgs, targets
