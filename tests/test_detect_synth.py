"""On-device synthetic plate-scene generator (detect/synth.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_restoration_tpu.detect.synth import make_batch, synth_scene


def test_make_batch_shapes_and_ranges():
    imgs, targets = jax.jit(make_batch, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), 4, 64)
    assert imgs.shape == (4, 64, 64, 3)
    assert targets.shape == (4, 4, 15)
    imgs = np.asarray(imgs)
    assert imgs.min() >= 0.0 and imgs.max() <= 255.0
    t = np.asarray(targets)
    # row 0 is the real target, the rest label-0 padding
    assert (t[:, 0, 14] == 1.0).all()
    assert (t[:, 1:, 14] == 0.0).all()
    # normalized bbox with positive extent
    assert (t[:, 0, :4] >= 0).all() and (t[:, 0, :4] <= 1).all()
    assert (t[:, 0, 2] > t[:, 0, 0]).all()
    assert (t[:, 0, 3] > t[:, 0, 1]).all()


def test_scene_geometry_matches_target():
    """The labeled bbox must frame the bright plate; landmarks must be the
    corners + center in the product pipeline's p1..p5 order
    (serve/pipeline.py _detect_quad)."""
    img, t = jax.jit(synth_scene, static_argnums=1)(
        jax.random.PRNGKey(3), 128)
    img, t = np.asarray(img), np.asarray(t)
    x0, y0, x1, y1 = t[:4]
    cx0, cy0 = int(x0 * 128), int(y0 * 128)
    cx1, cy1 = int(x1 * 128), int(y1 * 128)
    inside = img[cy0 + 2:cy1 - 2, cx0 + 2:cx1 - 2]
    outside = np.concatenate([img[:cy0].ravel(), img[cy1 + 1:].ravel()])
    assert inside.mean() > outside.mean() + 20  # plate is bright
    # landmarks: TL, TR, center, BL, BR
    np.testing.assert_allclose(t[4:14], [x0, y0, x1, y0,
                                         (x0 + x1) / 2, (y0 + y1) / 2,
                                         x0, y1, x1, y1], atol=1e-6)


def test_batch_deterministic_per_key():
    a = make_batch(jax.random.PRNGKey(7), 2, 48)
    b = make_batch(jax.random.PRNGKey(7), 2, 48)
    c = make_batch(jax.random.PRNGKey(8), 2, 48)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.abs(np.asarray(a[0]) - np.asarray(c[0])).max() > 1.0


def test_trainer_learns_on_synth_scenes():
    """MultiBox loss decreases when training on generator batches with the
    engine-consistent (x - BGR_MEAN) preprocess."""
    from image_restoration_tpu.detect.engine import BGR_MEAN
    from image_restoration_tpu.detect.train import DetectorTrainer

    trainer = DetectorTrainer(backbone="mobilenet0.25", image_size=64,
                              lr=5e-3)
    mean = np.asarray(BGR_MEAN, np.float32)
    losses = []
    for i in range(6):
        imgs, tgts = make_batch(jax.random.PRNGKey(i), 4, 64)
        losses.append(trainer.train_step(
            np.asarray(imgs) - mean, np.asarray(tgts))["loss"])
    assert losses[-1] < losses[0]
