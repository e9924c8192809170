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


@pytest.mark.slow  # 114s; builds all 4 backbones (goldens cover 2)
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


@pytest.mark.slow  # 142s; SGD trainer loop
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


def test_detector_lr_schedule_follows_state_step():
    """The decay schedule is driven by state['step'], so a resume that
    sets the step past a decay boundary trains at the decayed LR (the
    reference recomputes lr from the resumed epoch,
    Plate_Detect/Retina-License-Plate/train.py:121,154-166)."""
    import copy
    from image_restoration_tpu.detect.train import DetectorTrainer

    trainer = DetectorTrainer(backbone="mobilenet0.25", image_size=64,
                              lr=1e-2, weight_decay=0.0, decay_steps=[3])
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    targets = np.zeros((1, 4, 15), np.float32)
    targets[:, 0, :4] = [0.3, 0.3, 0.7, 0.7]
    targets[:, 0, 4:14] = np.tile([0.4, 0.4], 5)
    targets[:, 0, 14] = 1.0

    fresh = copy.deepcopy(jax.device_get(trainer.state))

    def first_update_norm(start_step):
        state = copy.deepcopy(fresh)
        state["step"] = start_step
        new_state, _ = trainer._train_step(state, jnp.asarray(images),
                                           jnp.asarray(targets))
        deltas = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).sum(),
                              new_state["params"], state["params"])
        return sum(jax.tree.leaves(deltas))

    before = first_update_norm(0)
    after = first_update_norm(10)  # past the decay boundary at 3
    # momentum trace is empty on the first step, so the update is exactly
    # lr * grad: the decayed step must be 0.1x the fresh one
    np.testing.assert_allclose(after / before, 0.1, rtol=1e-3)


def test_detector_trainer_data_parallel_matches_single():
    """DP detector training (batch sharded over the 8-device mesh, params
    replicated — the reference's nn.DataParallel analog) matches the
    single-device step. One step is compared: losses are reduction-order
    tight (~1e-6 rel), which proves the BatchNorm batch-axis means and
    the loss reductions are GLOBAL over the sharded batch. Params get a
    looser bound because hard-negative mining's top-k can swap anchors
    whose conf losses differ by <1e-6 — a swap leaves the loss equal but
    moves O(1) gradient between anchors (the reference's nn.DataParallel
    is chaotic in exactly the same way), so multi-step trajectories are
    not comparable elementwise."""
    from image_restoration_tpu.detect.train import DetectorTrainer

    rng = np.random.default_rng(1)
    images = rng.standard_normal((8, 64, 64, 3)).astype(np.float32) * 10
    targets = np.zeros((8, 4, 15), np.float32)
    targets[:, 0, :4] = [0.25, 0.3, 0.7, 0.65]
    targets[:, 0, 4:14] = np.tile([0.4, 0.4], 5)
    targets[:, 0, 14] = 1.0

    kw = dict(backbone="mobilenet0.25", image_size=64, lr=1e-2,
              decay_steps=[100])
    single = DetectorTrainer(**kw)
    dp = DetectorTrainer(**kw, data_parallel=8)

    ls = single.train_step(images, targets)
    ld = dp.train_step(images, targets)
    for k in ls:
        np.testing.assert_allclose(ld[k], ls[k], rtol=2e-5, err_msg=k)
    for name, bound in (("params", 5e-3), ("batch_stats", 1e-4)):
        leaves_s = jax.tree.leaves(jax.device_get(single.state[name]))
        leaves_d = jax.tree.leaves(jax.device_get(dp.state[name]))
        worst = max(float(np.max(np.abs(a - b))) for a, b in
                    zip(leaves_s, leaves_d))
        assert worst < bound, f"{name} diverged: {worst}"


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


# ------------------------------------------------- golden net parity

REF_DET = "/root/reference/Plate_Detect/Retina-License-Plate"


import contextlib


@contextlib.contextmanager
def _load_ref_retinaface():
    """Load the reference RetinaFace torch module with torchvision stubbed
    (IntermediateLayerGetter + a minimal torchvision-named resnet18).
    Context manager: retinaface.py re-imports torchvision inside
    __init__ (:87-99), so the stubs must stay active while the net is
    CONSTRUCTED, not just while the module loads."""
    import importlib.util
    import sys
    import types
    from collections import OrderedDict

    import torch
    from torch import nn as tnn

    class IntermediateLayerGetter(tnn.ModuleDict):
        def __init__(self, model, return_layers):
            rl = dict(return_layers)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                rl.pop(name, None)
                if not rl:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    class TBasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class TResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            feats, inp = (64, 128, 256, 512), 64
            for li, f in enumerate(feats, start=1):
                blocks = [TBasicBlock(inp, f, 2 if li > 1 else 1),
                          TBasicBlock(f, f)]
                setattr(self, f"layer{li}", tnn.Sequential(*blocks))
                inp = f
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512, 1000)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = lambda weights=None: TResNet18()
    tv_models.__all__ = ["resnet18"]
    tv_utils = types.ModuleType("torchvision.models._utils")
    tv_utils.IntermediateLayerGetter = IntermediateLayerGetter
    tv_det = types.ModuleType("torchvision.models.detection")
    tv_bb = types.ModuleType("torchvision.models.detection.backbone_utils")
    saved = {k: sys.modules.get(k) for k in
             ("torchvision", "torchvision.models",
              "torchvision.models._utils", "torchvision.models.detection",
              "torchvision.models.detection.backbone_utils", "models",
              "models.net")}
    try:
        sys.modules.update({
            "torchvision": tv, "torchvision.models": tv_models,
            "torchvision.models._utils": tv_utils,
            "torchvision.models.detection": tv_det,
            "torchvision.models.detection.backbone_utils": tv_bb})
        spec_net = importlib.util.spec_from_file_location(
            "models.net", f"{REF_DET}/models/net.py")
        net_mod = importlib.util.module_from_spec(spec_net)
        models_pkg = types.ModuleType("models")
        models_pkg.net = net_mod
        sys.modules["models"] = models_pkg
        sys.modules["models.net"] = net_mod
        spec_net.loader.exec_module(net_mod)
        spec_rf = importlib.util.spec_from_file_location(
            "ref_retinaface", f"{REF_DET}/models/retinaface.py")
        rf = importlib.util.module_from_spec(spec_rf)
        spec_rf.loader.exec_module(rf)
        yield rf
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.parametrize("backbone", ["mobilenet0.25", "Resnet18"])
def test_retinaface_golden_vs_reference(backbone):
    """Flax RetinaFace output == reference torch net at imported random
    weights (eval mode), for the live backbones."""
    import os.path as osp
    if not osp.exists(f"{REF_DET}/models/retinaface.py"):
        pytest.skip("reference not mounted")
    import torch

    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.detect.config import get_cfg
    from image_restoration_tpu.convert.retinaface_import import (
        load_torch_retinaface)

    cfg = dict(get_cfg(backbone))
    cfg["pretrain"] = False
    cfg["return_layers"] = ({"stage1": 1, "stage2": 2, "stage3": 3}
                            if backbone == "mobilenet0.25" else
                            {"layer2": 1, "layer3": 2, "layer4": 3})
    torch.manual_seed(0)
    with _load_ref_retinaface() as rf:
        tnet = rf.RetinaFace(cfg=cfg, phase="test").eval()
    # randomize EVERYTHING incl. BN affine + running stats
    gen = torch.Generator().manual_seed(1)
    sd = tnet.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        r = torch.rand(v.shape, generator=gen) * 0.4 - 0.2
        if k.endswith("running_var"):
            r = r.abs() + 0.5
        sd[k] = r
    tnet.load_state_dict(sd)

    net = build_network(dict(type="RetinaFace", backbone=backbone,
                             out_channel=cfg["out_channel"], phase="test"))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, v: net.init(k, v))(
        jax.random.PRNGKey(0), x)
    variables = load_torch_retinaface(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, variables)

    rng = np.random.default_rng(2)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_loc, t_conf, t_ldm = tnet(torch.from_numpy(
            img.transpose(0, 3, 1, 2)))
    j_loc, j_conf, j_ldm = jax.jit(
        lambda v, x: net.apply(v, x, train=False))(variables, img)
    np.testing.assert_allclose(np.asarray(j_loc), t_loc.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_conf), t_conf.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_ldm), t_ldm.numpy(),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # ~120s; full CLI wiring incl. save + resume restore
def test_detector_train_cli(tmp_path):
    """detect.train.main parity with the reference CLI
    (Plate_Detect/Retina-License-Plate/train.py:17-28): label.txt dataset,
    backbone alias, checkpoint save, --resume_net restore."""
    import cv2
    from image_restoration_tpu.detect.train import main

    d = tmp_path / "train"
    (d / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "images" / f"im{i}.jpg"), img)
        lines.append(f"# im{i}.jpg")
        lines.append("10 10 40 20 12.0 12.0 0.0 45.0 12.0 0.0 28.0 22.0 "
                     "0.0 12.0 28.0 0.0 45.0 28.0 0.0 1")
    (d / "label.txt").write_text("\n".join(lines) + "\n")

    save1 = tmp_path / "w1"
    main(["--training_dataset", str(d / "label.txt"),
          "--network", "mobile0.25", "--image_size", "64",
          "--batch_size", "2", "--epochs", "1",
          "--save_folder", str(save1)])
    ckpt = save1 / "mobilenet0.25_final"
    assert ckpt.exists()
    # resume restores without shape errors and trains another epoch
    main(["--training_dataset", str(d / "label.txt"),
          "--network", "mobile0.25", "--image_size", "64",
          "--batch_size", "2", "--epochs", "2", "--resume_epoch", "1",
          "--resume_net", str(ckpt),
          "--save_folder", str(tmp_path / "w2")])
    assert (tmp_path / "w2" / "mobilenet0.25_final").exists()
