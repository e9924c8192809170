"""Serving tests: pipeline stages + HTTP round trip over the stdlib host."""

import threading
import urllib.request

import numpy as np
import pytest
import cv2

import jax.numpy as jnp

from image_restoration_tpu.infer import Restorer
from image_restoration_tpu.detect.engine import PlateDetector
from image_restoration_tpu.serve.pipeline import (PlatePipeline,
                                                  resize_with_padding,
                                                  image_to_base64,
                                                  base64_to_image)
from image_restoration_tpu.serve.api import ServiceCore, run_server


TINY_GFPGAN = dict(type="GFPGANv1OCR", input_width=64, input_height=64,
                   num_style_feat=16, channel_multiplier=0.25, num_mlp=2,
                   input_is_latent=True, different_w=True, narrow=0.5,
                   sft_half=True)


@pytest.fixture(scope="module")
def pipeline():
    class TinyPipeline(PlatePipeline):
        TARGET = 64

    det = PlateDetector(backbone="Resnet18", image_size=64,
                        score_threshold=0.0, keep_top_k=5)
    restorer = Restorer(TINY_GFPGAN)
    return TinyPipeline(detector=det, plate_restorer=restorer,
                        car_restorer=restorer)


@pytest.fixture(scope="module")
def geo_pipeline(pipeline):
    """device_geometry twin sharing the host pipeline's nets."""
    class TinyPipeline(PlatePipeline):
        TARGET = 64

    return TinyPipeline(detector=pipeline.detector,
                        plate_restorer=pipeline.plate_restorer,
                        car_restorer=pipeline.car_restorer,
                        device_geometry=True)


def test_device_geometry_matches_host_path(pipeline, geo_pipeline, rng,
                                           monkeypatch):
    """device_geometry=True (mask/crop/resize/restore/warp/paste/montage
    as ONE dispatch) must reproduce the host cv2 stages up to cv2's
    fixed-point bilinear rounding and the polygon-edge rasterization
    band. The detector quad is pinned to a proper plate-like quad — the
    random-weight detector can emit degenerate quads (repeated corners),
    where BOTH paths produce garbage (covered separately below)."""
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    quad = np.array([[10, 22], [52, 18], [54, 44], [8, 47]], np.int32)
    for p in (pipeline, geo_pipeline):
        monkeypatch.setattr(type(p), "_detect_quad",
                            lambda self, im: (quad.copy(), 0.9, True),
                            raising=True)
    want = pipeline.process(img)
    got = geo_pipeline.process(img)

    t = pipeline.TARGET
    assert got["montage"].shape == (t, 6 * t, 3)
    assert got["montage"].dtype == np.uint8
    np.testing.assert_array_equal(got["input"], want["input"])
    np.testing.assert_array_equal(got["quad"], want["quad"])

    # pure-geometry panels: tight agreement (no net in the loop)
    for key in ("crop", "crop_padded", "transform"):
        a = got[key].astype(np.float32)
        b = want[key].astype(np.float32)
        assert a.shape == b.shape, key
        diff = np.abs(a - b)
        # most pixels within cv2's fixed-point rounding; the polygon /
        # warp edge band may differ by full pixel values
        assert np.quantile(diff, 0.90) <= 2.0, (key, np.quantile(diff, .9))
        assert diff.mean() <= 8.0, (key, diff.mean())

    # net-bearing panels: the ≤1 LSB input difference passes through a
    # random-weight generator — gate on mean drift, not exactness
    for key in ("plate_restored", "car_restored", "pasted"):
        a = got[key].astype(np.float32)
        b = want[key].astype(np.float32)
        assert a.shape == b.shape, key
        assert np.abs(a - b).mean() <= 12.0, (key, np.abs(a - b).mean())

    # batch path consistency: same graph at batch shape, panels identical
    # to the single-image device path up to XLA fusion ulps
    canvas = want["input"]
    mont2, masked2 = geo_pipeline._geo_batch(
        np.stack([canvas, canvas]),
        np.stack([quad, quad]).astype(np.float32))
    for i in range(2):
        assert np.abs(mont2[i].astype(np.int16) -
                      got["montage"].astype(np.int16)).max() <= 1


def test_device_geometry_degenerate_quad(geo_pipeline, rng):
    """A degenerate quad (repeated corner → singular homography) must
    not NaN-poison the device path: warped content goes black (matching
    the host path, whose f64 garbage matrix also lands ~nowhere) and the
    paste falls back to the restored car inside the polygon."""
    t = geo_pipeline.TARGET
    canvas = (rng.random((t, t, 3)) * 255).astype(np.uint8)
    # two degeneracy shapes: repeated q2/q3 corner → non-finite
    # homography; repeated q0/q1 corner → FINITE but singular (det=0),
    # which would NaN-poison the warp if only isfinite were guarded
    for quad in (np.array([[16, 63], [63, 0], [63, 0], [0, 38]],
                          np.float32),
                 np.array([[16, 63], [16, 63], [63, 0], [0, 38]],
                          np.float32)):
        mont, masked = geo_pipeline._geo_batch(canvas[None], quad[None])
        assert np.isfinite(mont.astype(np.float32)).all()
        transform = mont[0][:, 4 * t:5 * t]
        assert (transform > 0).mean() < 0.01  # black warped content
        pasted = mont[0][:, 5 * t:6 * t]
        assert pasted.dtype == np.uint8 and pasted.shape == (t, t, 3)


def test_device_geometry_auto_select(pipeline, rng):
    """device_geometry="auto" defers the host-vs-device choice to a
    measured first batch: single process() stays on the host path, the
    first process_batch wall-times both paths on one warmed chunk and
    locks in the faster (serve/pipeline.py _autoselect_geometry; the r3
    measurement showed neither choice is safe to hardcode)."""
    class TinyPipeline(PlatePipeline):
        TARGET = 64

    auto = TinyPipeline(detector=pipeline.detector,
                        plate_restorer=pipeline.plate_restorer,
                        car_restorer=pipeline.car_restorer,
                        device_geometry="auto")
    assert auto._geo_auto_pending and not auto.device_geometry
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    auto.process(img)  # single-image path must not trigger the probe
    assert auto._geo_auto_pending
    outs = auto.process_batch([img] * 2, chunk_size=2)
    assert len(outs) == 2 and not auto._geo_auto_pending
    ms = auto.geo_auto_ms_per_image
    assert set(ms) == {"host", "device"} and min(ms.values()) > 0
    assert auto.device_geometry == (ms["device"] <= ms["host"])
    t = auto.TARGET
    for o in outs:
        assert o["montage"].shape == (t, 6 * t, 3)
        assert o["montage"].dtype == np.uint8


def test_base64_roundtrip(rng):
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    back = base64_to_image(image_to_base64(img))
    assert back.shape == img.shape


def test_resize_with_padding(rng):
    img = (rng.random((30, 60, 3)) * 255).astype(np.uint8)
    out = resize_with_padding(img, (64, 64))
    assert out.shape == (64, 64, 3)
    # letterboxed: top/bottom black bands
    assert out[0].sum() == 0 and out[-1].sum() == 0


def test_finish_one_paste_semantics(pipeline, rng):
    """The cv2.copyTo paste must equal the reference's boolean-mask paste
    (api_plate_oto.py:455-466 pastes warped-plate pixels where the quad
    polygon mask is set, car pixels elsewhere)."""
    import cv2

    t = pipeline.TARGET
    canvas = (rng.random((t, t, 3)) * 255).astype(np.uint8)
    plate = (rng.random((t, t, 3)) * 255).astype(np.uint8)
    car = (rng.random((t, t, 3)) * 255).astype(np.uint8)
    quad = np.array([[t // 6, t // 3], [5 * t // 6, t // 4],
                     [4 * t // 5, 2 * t // 3], [t // 7, 3 * t // 4]],
                    np.int32)
    crop = canvas[t // 4: 3 * t // 4, t // 6: 5 * t // 6].copy()
    got = pipeline._finish_one(canvas, quad, 0.9, True, crop, plate, car)

    pst1 = np.float32([[0, 0], [t, 0], [t, t], [0, t]])
    matrix = cv2.getPerspectiveTransform(pst1, quad.astype(np.float32))
    plate_warp = cv2.warpPerspective(plate, matrix, (t, t))
    mask = np.zeros((t, t), np.uint8)
    cv2.fillPoly(mask, [quad], 255)
    want = car.copy()
    want[mask > 0] = plate_warp[mask > 0]
    np.testing.assert_array_equal(got["pasted"], want)


def test_restore_batch_u8_matches_float(pipeline, rng):
    """Device-IO path (uint8 wire, on-device norm/convert) must equal the
    host float path to ≤1 LSB (f32 ulp/rounding differences only)."""
    restorer = pipeline.plate_restorer
    u8 = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    want = restorer.restore_batch(u8.astype(np.float32) / 255.0)
    got = restorer.restore_batch_u8(u8)
    assert got.dtype == np.uint8 and got.shape == want.shape
    d = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 1, f"max dev {d.max()}"


def test_restore_batch_u8_dyn_int8_psnr_gate(rng):
    """With quant="dyn-int8" the u8 path is a separate compilation of the
    int8 chain — requant rounding is compilation-dependent, so equivalence
    holds to the serving PSNR gate, not bitwise."""
    restorer = Restorer(TINY_GFPGAN, quant="dyn-int8")
    u8 = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    want = restorer.restore_batch(u8.astype(np.float32) / 255.0) \
        .astype(np.float32)
    got = restorer.restore_batch_u8(u8).astype(np.float32)
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 30.0, f"dyn-int8 u8 path vs float path: {psnr:.1f} dB"


def test_restore_batch_u8_rejects_float(pipeline, rng):
    with pytest.raises(TypeError):
        pipeline.plate_restorer.restore_batch_u8(
            rng.random((1, 64, 64, 3)).astype(np.float32))


def test_pipeline_device_io_equivalence(pipeline, rng):
    """process() with device_io (the default) equals the reference-exact
    host-normalize path to ≤1 LSB on restored panels; host-computed
    fields are identical."""

    class TinyPipeline(PlatePipeline):
        TARGET = pipeline.TARGET

    host = TinyPipeline(detector=pipeline.detector,
                        plate_restorer=pipeline.plate_restorer,
                        car_restorer=pipeline.car_restorer,
                        device_io=False)
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    got, want = pipeline.process(img), host.process(img)
    np.testing.assert_array_equal(got["input"], want["input"])
    np.testing.assert_array_equal(got["quad"], want["quad"])
    np.testing.assert_array_equal(got["crop"], want["crop"])
    for k in ("plate_restored", "car_restored", "pasted", "montage"):
        d = np.abs(got[k].astype(np.int16) - want[k].astype(np.int16))
        assert d.max() <= 1, f"{k}: max dev {d.max()}"


def test_pipeline_process(pipeline, rng):
    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    result = pipeline.process(img)
    t = pipeline.TARGET
    assert result["montage"].shape == (t, 6 * t, 3)
    assert result["car_restored"].shape == (t, t, 3)
    assert result["plate_restored"].shape == (t, t, 3)
    assert result["quad"].shape == (4, 2)
    assert np.isfinite(result["score"])


def test_pipeline_process_batch_matches_process(pipeline, rng):
    """Batched+pipelined E2E == per-image process on every stage output.

    Host stages are identical code; the restores run at a different batch
    size, so uint8 outputs may differ by ±1 where XLA's batch-1 vs batch-N
    conv lowerings round differently — bound that, require exact host
    fields, and exercise a ragged final chunk (5 images, chunk 2)."""
    imgs = [(rng.random((100 + 7 * i, 140, 3)) * 255).astype(np.uint8)
            for i in range(5)]
    batched = pipeline.process_batch(imgs, chunk_size=2, host_workers=3)
    assert len(batched) == len(imgs)
    for img, got in zip(imgs, batched):
        want = pipeline.process(img)
        assert sorted(got) == sorted(want)
        np.testing.assert_array_equal(got["input"], want["input"])
        np.testing.assert_array_equal(got["quad"], want["quad"])
        assert got["detected"] == want["detected"]
        np.testing.assert_allclose(got["score"], want["score"], rtol=1e-5)
        np.testing.assert_array_equal(got["crop"], want["crop"])
        for k in ("plate_restored", "car_restored", "pasted", "montage"):
            d = np.abs(got[k].astype(np.int16) - want[k].astype(np.int16))
            assert d.max() <= 2, f"{k}: max dev {d.max()}"
            assert (d > 0).mean() < 0.05, f"{k}: {(d > 0).mean():.3f} differ"


def test_run_pipeline_cli(pipeline, rng, tmp_path):
    """scripts/run_pipeline.py batch CLI over a glob, injected pipeline."""
    import sys
    sys.path.insert(0, "scripts")
    try:
        from run_pipeline import main as run_main
    finally:
        sys.path.pop(0)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        img = (rng.random((80, 120, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"im{i}.jpg"), img)
    out = tmp_path / "out"
    results = run_main(["--input", str(src / "*.jpg"),
                        "--output", str(out), "--chunk", "2",
                        "--save", "montage,pasted"],
                       pipeline=pipeline)
    assert len(results) == 3
    t = pipeline.TARGET
    for i in range(3):
        m = cv2.imread(str(out / f"im{i}_montage.png"))
        assert m.shape == (t, 6 * t, 3)
        assert (out / f"im{i}_pasted.png").exists()


def test_http_server_roundtrip(pipeline, rng):
    core = ServiceCore(pipeline=pipeline)
    from http.server import ThreadingHTTPServer
    from image_restoration_tpu.serve.api import make_stdlib_handler
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_stdlib_handler(core))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        for route, media in [("/Vehicle_Resolution_GFPGAN/", "image/png"),
                             ("/Restore/", "image/jpeg"),
                             ("/RestoreConcat/", "image/jpeg")]:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{route}", data=buf.tobytes(),
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=120) as resp:
                assert resp.status == 200
                assert resp.headers["Content-Type"] == media
                payload = resp.read()
            out = cv2.imdecode(np.frombuffer(payload, np.uint8),
                               cv2.IMREAD_COLOR)
            assert out is not None and out.size > 0
        # error envelope on garbage
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/Restore/", data=b"not an image",
            headers={"Content-Type": "application/octet-stream"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            import json
            assert json.loads(e.read())["is_success"] is False
    finally:
        server.shutdown()


def test_restorer_dyn_int8_quant(rng):
    """quant="dyn-int8" Restorer: batch path works and tracks the f32
    output at random init (dynamic per-tensor scales; loose gate — the
    44.1 dB production figure is measured at real weights on chip)."""
    base = Restorer(TINY_GFPGAN)
    quant = Restorer(TINY_GFPGAN, quant="dyn-int8")
    quant.variables = base.variables  # same random weights
    imgs = rng.random((4, 64, 64, 3)).astype(np.float32)
    want = base.restore_batch(imgs)
    got = quant.restore_batch(imgs)
    assert got.shape == want.shape == (4, 64, 64, 3)
    assert got.dtype == np.uint8
    # uint8 outputs: mean abs difference stays small
    d = np.abs(got.astype(np.float32) - want.astype(np.float32)).mean()
    assert d < 8.0, f"dyn-int8 diverged: mean|d|={d}"
