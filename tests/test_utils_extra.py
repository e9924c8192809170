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


def test_tfrecord_example_parser_roundtrip(tmp_path):
    """The dependency-free TFRecord/tf.Example reader in
    scripts/data_preparation/extract_images_from_tfrecords.py decodes a
    hand-encoded record (framing + protobuf wire format)."""
    import importlib.util
    import struct
    import os.path as osp

    spec = importlib.util.spec_from_file_location(
        "tfrec", osp.join(osp.dirname(__file__), "..", "scripts",
                          "data_preparation",
                          "extract_images_from_tfrecords.py"))
    tfrec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tfrec)

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def field(num, wire, payload):
        key = varint((num << 3) | wire)
        if wire == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    # Feature{bytes_list=1{value=1}} for 'data'
    img_bytes = bytes(range(12))  # 2*2*3 CHW
    bytes_list = field(1, 2, img_bytes)
    feat_data = field(1, 2, bytes_list)
    entry_data = field(1, 2, b"data") + field(2, 2, feat_data)
    # Feature{int64_list=3{value=1 repeated}} for 'shape' (3,2,2)
    int64_list = field(1, 0, varint(3)) + field(1, 0, varint(2)) + \
        field(1, 0, varint(2))
    feat_shape = field(3, 2, int64_list)
    entry_shape = field(1, 2, b"shape") + field(2, 2, feat_shape)
    features = field(1, 2, entry_data) + field(1, 2, entry_shape)
    example = field(1, 2, features)

    rec_path = tmp_path / "toy.tfrecords"
    with open(rec_path, "wb") as f:
        f.write(struct.pack("<Q", len(example)) + b"\0\0\0\0" +
                example + b"\0\0\0\0")

    records = list(tfrec.iter_tfrecord(str(rec_path)))
    assert len(records) == 1
    feats = tfrec.parse_example(records[0])
    assert feats["shape"] == [3, 2, 2]
    assert feats["data"][0] == img_bytes
