"""Exported GFPGAN engine (scripts/export_gfpgan.py +
EngineFaceRestorer) — the TorchScript-parity serving artifact."""

import json
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))

TINY_GFPGAN = dict(type="GFPGANv1OCR", input_width=64, input_height=64,
                   num_style_feat=16, channel_multiplier=0.25, num_mlp=2,
                   input_is_latent=True, different_w=True, narrow=0.5,
                   sft_half=True)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from export_gfpgan import build_engine
    ser, meta, restorer = build_engine(net_opt=TINY_GFPGAN, batch=2)
    d = tmp_path_factory.mktemp("gfpgan_engine")
    (d / "engine.bin").write_bytes(ser)
    (d / "engine.json").write_text(json.dumps(meta))
    return str(d), restorer


def test_engine_matches_live_restorer(built, rng):
    from image_restoration_tpu.serve.engine_restorer import (
        EngineFaceRestorer)
    engine_dir, restorer = built
    eng = EngineFaceRestorer(engine_dir)
    assert eng.input_size == (64, 64) and eng.batch == 2
    u8 = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    want = restorer.restore_batch_u8(u8)
    got = eng.restore_batch_u8(u8)
    assert got.dtype == np.uint8
    d = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 1, f"max dev {d.max()}"  # separate f32 compilation


def test_engine_ragged_batch_chunking(built, rng):
    from image_restoration_tpu.serve.engine_restorer import (
        EngineFaceRestorer)
    engine_dir, _ = built
    eng = EngineFaceRestorer(engine_dir)
    u8 = (rng.random((5, 64, 64, 3)) * 255).astype(np.uint8)  # 2+2+1(pad)
    got = eng.restore_batch_u8(u8)
    assert got.shape == (5, 64, 64, 3)
    # each row must equal its own single-image restore (padding discarded)
    for i in range(5):
        np.testing.assert_array_equal(
            got[i], eng.restore_batch_u8(np.repeat(u8[i:i + 1], 2, 0))[0])


def test_full_pipeline_from_artifacts(built, tmp_path, rng):
    """The reference's deployment shape — TRT detector engine +
    TorchScript restorers (api_plate_oto.py:331-336) — reproduced from
    our artifacts: an exported detector checkpoint (export_detector's
    orbax format) + the GFPGAN engine, driving the FULL product pipeline
    with no model-construction weights in sight."""
    import jax
    import orbax.checkpoint as ocp
    from image_restoration_tpu.detect.engine import PlateDetector
    from image_restoration_tpu.serve.engine_restorer import (
        EngineFaceRestorer)
    from image_restoration_tpu.serve.pipeline import PlatePipeline

    src = PlateDetector(backbone="Resnet18", image_size=64,
                        score_threshold=0.0, keep_top_k=5)
    det_dir = tmp_path / "det"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(det_dir.resolve()),
               jax.tree.map(np.asarray, src.variables), force=True)
    ckptr.wait_until_finished()

    det = PlateDetector(backbone="Resnet18", image_size=64,
                        score_threshold=0.0, keep_top_k=5,
                        ckpt_path=str(det_dir))
    eng = EngineFaceRestorer(built[0])

    class TinyPipeline(PlatePipeline):
        TARGET = 64

    pipe = TinyPipeline(detector=det, plate_restorer=eng,
                        car_restorer=eng)
    assert pipe.device_io  # engines expose the u8 entry point
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    res = pipe.process(img)
    assert res["montage"].shape == (64, 6 * 64, 3)
    assert res["pasted"].dtype == np.uint8
    # batched path: fused 2N restore goes through the engine's chunking
    batched = pipe.process_batch([img, img, img], chunk_size=2)
    assert len(batched) == 3
    np.testing.assert_array_equal(batched[0]["montage"], res["montage"])


def test_geometry_engine_matches_live_fused(built, tmp_path_factory, rng):
    """--with-geometry exports the FUSED post-detector graph; loaded via
    EngineGeoPipeline and slotted into PlatePipeline(geo_engine=...) it
    must reproduce the live device_geometry pipeline."""
    from export_gfpgan import build_engine
    from image_restoration_tpu.detect.engine import PlateDetector
    from image_restoration_tpu.serve.engine_restorer import (
        EngineGeoPipeline)
    from image_restoration_tpu.serve.pipeline import PlatePipeline

    _, restorer = built
    ser, meta, _ = build_engine(net_opt=TINY_GFPGAN, batch=2,
                                with_geometry=True)
    assert meta["geometry"]
    d = tmp_path_factory.mktemp("geo_engine")
    (d / "engine.bin").write_bytes(ser)
    (d / "engine.json").write_text(json.dumps(meta))
    geo_eng = EngineGeoPipeline(str(d))
    assert geo_eng.target == 64 and geo_eng.batch == 2

    det = PlateDetector(backbone="Resnet18", image_size=64,
                        score_threshold=0.0, keep_top_k=5)

    class TinyPipeline(PlatePipeline):
        TARGET = 64

    live = TinyPipeline(detector=det, plate_restorer=restorer,
                        car_restorer=restorer, device_geometry=True)
    from_artifact = TinyPipeline(detector=det, plate_restorer=restorer,
                                 car_restorer=restorer,
                                 geo_engine=geo_eng)
    assert from_artifact.device_geometry

    canvas = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    quad = np.array([[10, 22], [52, 18], [54, 44], [8, 47]], np.float32)
    want_m, want_k = live._geo_batch(canvas[None], quad[None])
    got_m, got_k = from_artifact._geo_batch(canvas[None], quad[None])
    # separate compilation of the same f32 graph → ≤1 LSB after rounding
    assert np.abs(got_m.astype(np.int16) -
                  want_m.astype(np.int16)).max() <= 1
    np.testing.assert_array_equal(got_k, want_k)
    # ragged batch: 3 images through the frozen batch-2 engine
    mont3, masked3 = from_artifact._geo_batch(
        np.repeat(canvas[None], 3, 0), np.repeat(quad[None], 3, 0))
    assert mont3.shape == (3, 64, 6 * 64, 3)
    assert np.abs(mont3[2].astype(np.int16) -
                  want_m[0].astype(np.int16)).max() <= 1
    # the pytest wrong-artifact guard
    with pytest.raises(ValueError, match="geometry"):
        EngineGeoPipeline(built[0])


def test_engine_slots_into_service_core(built, rng):
    """Duck-compatibility: ServiceCore serves /Restore/ from the
    source-free artifact, micro-batching included."""
    from types import SimpleNamespace
    from image_restoration_tpu.serve.api import ServiceCore
    from image_restoration_tpu.serve.engine_restorer import (
        EngineFaceRestorer)
    import cv2

    engine_dir, _ = built
    eng = EngineFaceRestorer(engine_dir)
    core = ServiceCore(pipeline=SimpleNamespace(car_restorer=eng),
                       restorer=eng, microbatch=2)
    assert core.device_io  # the engine exposes the u8 entry point
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    payload = core.restore(img)
    out = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)
    assert out.shape == (64, 64, 3)
    core.batcher.stop()
