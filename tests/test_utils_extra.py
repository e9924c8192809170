"""Utility-layer tests: flow IO, options parsing, misc helpers, usm."""

import numpy as np
import jax.numpy as jnp

from image_restoration_tpu.utils.flow_util import (flowread, flowwrite,
                                                   quantize_flow,
                                                   dequantize_flow)
from image_restoration_tpu.utils.options import parse, dict2str
from image_restoration_tpu.utils.misc import (mkdir_and_rename, scandir,
                                              sizeof_fmt)
from image_restoration_tpu.ops.filter2d import usm_sharp


def test_flow_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
    path = str(tmp_path / "a.flo")
    flowwrite(flow, path)
    back = flowread(path)
    np.testing.assert_allclose(back, flow, rtol=1e-6)


def test_flow_quantize_roundtrip(rng):
    flow = (rng.standard_normal((8, 10, 2)) * 0.005).astype(np.float32)
    dx, dy = quantize_flow(flow)
    deq = dequantize_flow(dx, dy)
    np.testing.assert_allclose(deq, flow, atol=2e-3 * 10)


def test_options_parse(tmp_path):
    cfg = tmp_path / "opt.yml"
    cfg.write_text("""
name: testexp
model_type: SRModel
scale: 4
manual_seed: 1
datasets:
  train:
    name: d
    type: PairedImageDataset
    dataroot_gt: ~/gt
    dataroot_lq: ~/lq
path:
  pretrain_network_g: ~
train:
  total_iter: 10
logger:
  print_freq: 5
""")
    opt = parse(str(cfg), root_path=str(tmp_path), is_train=True)
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["scale"] == 4
    assert opt["path"]["experiments_root"].endswith("experiments/testexp")
    assert "models" in opt["path"]
    s = dict2str(opt)
    assert "testexp" in s


def test_mkdir_and_rename_archives(tmp_path):
    d = tmp_path / "exp"
    d.mkdir()
    (d / "marker.txt").write_text("x")
    mkdir_and_rename(str(d))
    assert d.exists() and not (d / "marker.txt").exists()
    archived = [p for p in tmp_path.iterdir() if "archived" in p.name]
    assert archived and (archived[0] / "marker.txt").exists()


def test_sizeof_fmt():
    assert sizeof_fmt(1024) == "1.0 KB"
    assert sizeof_fmt(1536 * 1024) == "1.5 MB"


def test_usm_sharp_runs(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    out = usm_sharp(img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1
