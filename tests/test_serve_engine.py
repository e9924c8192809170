"""/SRx4/ endpoint: an exported engine (scripts/export_restorer.py) served
through the tiler at arbitrary image sizes, over HTTP."""

import json
import os.path as osp
import sys
import threading
import urllib.request

import numpy as np
import cv2
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def engine_dir(tmp_path_factory):
    from export_restorer import build_engine
    d = tmp_path_factory.mktemp("engine")
    ser, meta, _ = build_engine(num_feat=16, num_conv=2, tile=32, halo=4,
                                batch=2)
    (d / "engine.bin").write_bytes(ser)
    (d / "engine.json").write_text(json.dumps(meta))
    return str(d)


def test_engine_restorer_arbitrary_size(engine_dir, rng):
    from image_restoration_tpu.serve.engine_restorer import EngineRestorer
    eng = EngineRestorer(engine_dir)
    img_u8 = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    img = img_u8.astype(np.float32) / 255.0  # not tile-aligned
    out = eng(img)
    assert out.shape == (200, 280, 3) and out.dtype == np.uint8
    # uint8 input accepted too: converted host-side to exactly `img`,
    # so the outputs are identical
    np.testing.assert_array_equal(eng(img_u8), out)


def test_u8_io_engine_matches_bf16_io(tmp_path, rng):
    """A --u8-io export (device-side /255 + clip/round baked into the
    artifact) must match the bf16-IO engine of the same weights. Packed
    bf16 mode (int8=False) so the only differences are IO rounding."""
    from export_restorer import build_engine
    from image_restoration_tpu.serve.engine_restorer import EngineRestorer

    kw = dict(num_feat=16, num_conv=2, tile=32, halo=4, batch=2,
              int8=False, seed=0)
    for io in ("bf16", "u8"):
        d = tmp_path / io
        d.mkdir()
        ser, meta, _ = build_engine(io=io, **kw)
        (d / "engine.bin").write_bytes(ser)
        (d / "engine.json").write_text(json.dumps(meta))
    ref = EngineRestorer(str(tmp_path / "bf16"))
    u8 = EngineRestorer(str(tmp_path / "u8"))
    assert u8.u8_io and not ref.u8_io
    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    a, b = ref(img), u8(img)
    assert a.shape == b.shape == (160, 224, 3)
    assert b.dtype == np.uint8
    d = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert d.max() <= 2, f"max dev {d.max()}"


def test_srx4_http_roundtrip(engine_dir, rng):
    from image_restoration_tpu.serve.api import ServiceCore
    from image_restoration_tpu.serve.api import make_stdlib_handler
    from image_restoration_tpu.serve.engine_restorer import EngineRestorer
    from http.server import ThreadingHTTPServer

    core = ServiceCore.__new__(ServiceCore)  # skip heavy PlatePipeline
    core.pipeline = None
    core.restorer = None
    core.sr_engine = EngineRestorer(engine_dir)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_stdlib_handler(core))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".png", img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/SRx4/", data=buf.tobytes(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = resp.read()
        out = cv2.imdecode(np.frombuffer(payload, np.uint8),
                           cv2.IMREAD_COLOR)
        assert out.shape == (160, 160, 3)
    finally:
        server.shutdown()
