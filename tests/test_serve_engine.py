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
    img = rng.random((50, 70, 3)).astype(np.float32)  # not tile-aligned
    out = eng(img)
    assert out.shape == (200, 280, 3) and out.dtype == np.uint8


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
