"""Restorer engine export: jax.export round trip is exact and the engine
file loads + runs without the builder (the TRT-engine analog)."""

import json
import os.path as osp
import subprocess
import sys

import numpy as np
import jax.numpy as jnp


def test_engine_roundtrip_small(tmp_path):
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))
    from export_restorer import build_engine
    from jax import export as jexport

    ser, meta, serve = build_engine(num_feat=16, num_conv=4, tile=32,
                                    halo=4, batch=2)
    assert meta["input_shape"] == [2, 40, 40, 3]
    x = jnp.asarray(np.random.default_rng(0).random((2, 40, 40, 3)),
                    jnp.bfloat16)
    eng = jexport.deserialize(ser)
    got = np.asarray(eng.call(x), np.float32)
    want = np.asarray(serve(x), np.float32)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (2, 160, 160, 3)


def test_engine_cli_writes_artifacts(tmp_path):
    root = osp.abspath(osp.join(osp.dirname(__file__), ".."))
    out = str(tmp_path / "eng")
    r = subprocess.run(
        [sys.executable, osp.join(root, "scripts", "export_restorer.py"),
         "--out", out, "--tile", "32", "--halo", "4", "--batch", "2",
         "--num_conv", "2"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.load(open(osp.join(out, "engine.json")))
    assert meta["tile"] == 32 and meta["mode"] == "int8"
    assert osp.getsize(osp.join(out, "engine.bin")) > 0
