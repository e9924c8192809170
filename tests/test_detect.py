"""Detector stack tests: priors/coding vs the reference, NMS parity,
RetinaFace forward, multibox training step."""

import importlib.util

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from image_restoration_tpu.detect import (cfg_re18, prior_box, decode,
                                          decode_landm, encode, nms_jax)
from image_restoration_tpu.detect.box_utils import py_cpu_nms, jaccard
from image_restoration_tpu.detect.multibox_loss import multibox_loss
from image_restoration_tpu.archs import build_network

REF = "/root/reference/Plate_Detect/Retina-License-Plate"


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prior_box_matches_reference():
    ref_pb = _load(f"{REF}/layers/functions/prior_box.py", "ref_priorbox")
    want = ref_pb.PriorBox(cfg_re18, image_size=(224, 224)).forward().numpy()
    got = prior_box(cfg_re18, (224, 224))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_decode_matches_reference(rng):
    ref_bu = _load(f"{REF}/utils/box_utils.py", "ref_boxutils")
    priors = prior_box(cfg_re18, (224, 224))
    loc = rng.standard_normal((priors.shape[0], 4)).astype(np.float32) * 0.3
    landm = rng.standard_normal((priors.shape[0], 10)).astype(
        np.float32) * 0.3
    var = [0.1, 0.2]
    want = ref_bu.decode(torch.from_numpy(loc), torch.from_numpy(priors),
                         var).numpy()
    got = np.asarray(decode(jnp.asarray(loc), jnp.asarray(priors), var))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    want = ref_bu.decode_landm(torch.from_numpy(landm),
                               torch.from_numpy(priors), var).numpy()
    got = np.asarray(decode_landm(jnp.asarray(landm), jnp.asarray(priors),
                                  var))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_encode_roundtrip(rng):
    priors = prior_box(cfg_re18, (224, 224))[:50]
    boxes = np.sort(rng.random((50, 4)).astype(np.float32), axis=1)
    var = jnp.asarray([0.1, 0.2])
    enc = encode(jnp.asarray(boxes), jnp.asarray(priors), var)
    dec = decode(enc, jnp.asarray(priors), var)
    np.testing.assert_allclose(np.asarray(dec), boxes, rtol=1e-3, atol=1e-4)


def test_nms_matches_cpu_reference(rng):
    n = 60
    centers = rng.random((n, 2)).astype(np.float32)
    wh = rng.random((n, 2)).astype(np.float32) * 0.2 + 0.05
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
    scores = rng.random(n).astype(np.float32)
    kb, ks, valid, order = nms_jax(jnp.asarray(boxes), jnp.asarray(scores),
                                   iou_threshold=0.5, top_k=n)
    got = set(np.asarray(order)[np.asarray(valid)].tolist())
    # py_cpu_nms adds +1 to areas (pixel convention); compare against a
    # same-convention host NMS instead
    iou = np.asarray(jaccard(jnp.asarray(boxes), jnp.asarray(boxes)))
    ordr = scores.argsort()[::-1]
    keep, supp = [], set()
    for i in ordr:
        if i in supp:
            continue
        keep.append(int(i))
        for j in ordr:
            if j != i and iou[i, j] > 0.5:
                supp.add(int(j))
    assert got == set(keep)


def test_py_cpu_nms_runs(rng):
    dets = np.array([[10, 10, 50, 50, 0.9], [12, 12, 52, 52, 0.8],
                     [100, 100, 150, 150, 0.7]], np.float32)
    keep = py_cpu_nms(dets, 0.4)
    assert keep == [0, 2]


def test_retinaface_forward_shapes():
    net = build_network(dict(type="RetinaFace", backbone="Resnet18",
                             out_channel=64, phase="test"))
    x = jnp.zeros((2, 224, 224, 3))
    variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
        jax.random.PRNGKey(0), x)
    loc, conf, landm = net.apply(variables, x, train=False)
    num_priors = prior_box(cfg_re18, (224, 224)).shape[0]
    assert loc.shape == (2, num_priors, 4)
    assert conf.shape == (2, num_priors, 2)
    assert landm.shape == (2, num_priors, 10)
    s = np.asarray(conf).sum(-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)  # softmax in test phase


def test_multibox_training_decreases_loss():
    from image_restoration_tpu.detect.train import DetectorTrainer
    trainer = DetectorTrainer(backbone="Resnet18", image_size=64, lr=1e-2)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 20
    targets = np.zeros((2, 8, 15), np.float32)
    targets[:, 0, :4] = [0.3, 0.3, 0.7, 0.7]
    targets[:, 0, 4:14] = np.tile([0.4, 0.4], 5)
    targets[:, 0, 14] = 1.0
    losses = [trainer.train_step(images, targets)["loss"] for _ in range(6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_plate_detector_engine(rng):
    from image_restoration_tpu.detect.engine import PlateDetector
    det = PlateDetector(backbone="Resnet18", image_size=64,
                        score_threshold=0.0, keep_top_k=5)
    img = (rng.random((2, 64, 64, 3)) * 255).astype(np.float32)
    boxes, scores, landms, valid = det(img)
    assert boxes.shape == (2, 5, 4)
    assert scores.shape == (2, 5)
    assert landms.shape == (2, 5, 10)
    assert np.isfinite(boxes).all()
    # detect_image path (resize + rescale to original size)
    full = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    b, s, l, v = det.detect_image(full)
    assert b.shape == (5, 4) and l.shape == (5, 10)
