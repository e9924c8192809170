"""Serving hosts — parity with the reference FastAPI servers.

  * /Vehicle_Resolution_GFPGAN/  (api_plate_oto.py:404-489) — full pipeline,
    returns the 6-panel montage PNG
  * /Restore/  (api.py:125-151) — restoration-only, returns the restored JPEG
  * /RestoreConcat/  (api1.py:140-174) — input|output side-by-side

`create_app()` builds a FastAPI app when fastapi is installed; otherwise
`run_server()` serves the same endpoints on a stdlib http.server (this image
has no fastapi/uvicorn). Both paths share `PlatePipeline`/`Restorer` — the
HTTP layer is a thin shell over the jitted graphs.
"""

from __future__ import annotations

import email
import email.policy
import io
import json
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .pipeline import PlatePipeline, image_to_base64


def _decode_request_image(body: bytes, content_type: str = "") -> np.ndarray:
    """Accept raw image bytes or multipart/form-data with a `file` field."""
    if content_type.startswith("multipart/form-data"):
        msg = email.message_from_bytes(
            b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body,
            policy=email.policy.HTTP)
        for part in msg.iter_parts():
            payload = part.get_payload(decode=True)
            if payload:
                body = payload
                break
    arr = np.frombuffer(body, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("could not decode image payload")
    return img


class ServiceCore:
    """Endpoint logic shared by both HTTP shells."""

    def __init__(self, pipeline: Optional[PlatePipeline] = None,
                 restorer=None, sr_engine=None,
                 microbatch=None,  # int, "auto", or None (env)
                 microbatch_wait_ms: float = 5.0,
                 device_io: bool = True, device_geometry: bool = False):
        """device_io routes /Restore//RestoreConcat/ through
        Restorer.restore_batch_u8: uint8 on the wire both ways,
        normalization + uint8 conversion on device (≤1 LSB vs the host
        float path; 4× less host↔device traffic and 4× smaller
        micro-batch buffers). False = reference-exact host normalize.

        device_geometry additionally runs the /Vehicle_Resolution_GFPGAN/
        pipeline's mask/crop/warp/paste/montage on device as ONE dispatch
        per chunk (PlatePipeline device_geometry; cv2-equivalent up to
        fixed-point rounding and the polygon-edge band)."""
        import os
        self.pipeline = pipeline or PlatePipeline(
            device_io=device_io, device_geometry=device_geometry)
        self.restorer = restorer or self.pipeline.car_restorer
        # custom restorers (stubs, exported engines) may not implement the
        # device-IO entry point — fall back to the host float path
        self.device_io = device_io and hasattr(self.restorer,
                                               "restore_batch_u8")
        # tiled-SR engine (scripts/export_restorer.py artifact); also
        # loadable from the IRT_SR_ENGINE env var
        if sr_engine is None:
            eng_dir = os.environ.get("IRT_SR_ENGINE")
            if eng_dir:
                from .engine_restorer import EngineRestorer
                sr_engine = EngineRestorer(eng_dir)
        self.sr_engine = sr_engine
        # dynamic micro-batching of concurrent /Restore//RestoreConcat/
        # requests into one device dispatch (serve/batching.py); opt-in via
        # the arg or IRT_MICROBATCH=<max batch>. 0/absent = per-request
        # dispatch, matching the reference servers' behavior. "auto"
        # MEASURES both dispatch regimes on this host↔device link at
        # startup (serve/batching.py calibrate) and enables batching only
        # where coalescing actually beats concurrent per-request
        # dispatches — it wins on a local chip (batch scaling 358→632
        # imgs/s) and loses through a high-latency tunnel (measured
        # 0.45–0.55×, docs/assets/microbatch_bench.json).
        if microbatch is None:
            microbatch = os.environ.get("IRT_MICROBATCH", "0") or 0
        if isinstance(microbatch, str) and microbatch.strip().lower() != "auto":
            microbatch = int(microbatch.strip() or 0)
        self.batcher = None
        self.pipeline_batcher = None
        self.microbatch_decision = None
        if isinstance(microbatch, str):  # "auto"
            from .batching import calibrate
            max_b = int(os.environ.get("IRT_MICROBATCH_MAX", "32") or 32)
            size = self.restorer.input_size[0] or 256
            probe = (np.random.default_rng(0).random((size, size, 3))
                     * 255)
            if self.device_io:
                item, fn = probe.astype(np.uint8), \
                    self.restorer.restore_batch_u8
            else:
                item, fn = (probe / 255.0).astype(np.float32), \
                    self.restorer.restore_batch
            self.microbatch_decision = calibrate(fn, item, max_batch=max_b)
            microbatch = max_b if self.microbatch_decision["recommend"] \
                else 0
            print("microbatch auto-select:",
                  "ON" if microbatch else "OFF (per-request dispatch)",
                  self.microbatch_decision, flush=True)
        if microbatch:
            from .batching import MicroBatcher
            # pipeline_depth > 1 overlaps a batch's device round-trip with
            # gathering + dispatching the next one (jitted restore calls
            # are thread-safe); IRT_MICROBATCH_DEPTH overrides
            depth = int(os.environ.get("IRT_MICROBATCH_DEPTH", "2") or 2)
            self.batcher = MicroBatcher(
                self.restorer.restore_batch_u8 if self.device_io
                else self.restorer.restore_batch,
                max_batch=microbatch, max_wait_ms=microbatch_wait_ms,
                pipeline_depth=depth)
            # full-pipeline endpoint: coalesce concurrent requests into one
            # process_batch call (list mode — inputs are arbitrary-size;
            # the pipeline pads its own fixed-shape chunks). depth 1:
            # process_batch mutates host-side pipeline state.
            chunk = min(int(microbatch), 8)
            self.pipeline_batcher = MicroBatcher(
                lambda imgs: self.pipeline.process_batch(
                    imgs, chunk_size=chunk),
                max_batch=microbatch, max_wait_ms=microbatch_wait_ms,
                stack=False, pipeline_depth=1)

    def _restore_one(self, rgb: np.ndarray) -> np.ndarray:
        """One HWC RGB image (uint8 with device_io, float [0,1] without)
        → restored BGR uint8, through the micro-batcher when enabled
        (requests arriving within the wait window share a single device
        dispatch)."""
        if self.batcher is not None:
            return self.batcher(rgb)
        if self.device_io:
            return self.restorer.restore_batch_u8(rgb[None])[0]
        return self.restorer(rgb)

    def _as_input(self, rgb_u8: np.ndarray) -> np.ndarray:
        return rgb_u8 if self.device_io else \
            rgb_u8.astype(np.float32) / 255.0

    def vehicle_resolution(self, img_bgr: np.ndarray) -> bytes:
        if self.pipeline_batcher is not None:
            result = self.pipeline_batcher(img_bgr)
        else:
            result = self.pipeline.process(img_bgr)
        ok, buf = cv2.imencode(".png", result["montage"])
        return buf.tobytes()

    def _size(self) -> int:
        return self.restorer.input_size[0] or 256

    def restore(self, img_bgr: np.ndarray) -> bytes:
        """api.py behavior: resize to model size, restore, JPEG (:92-151)."""
        s = self._size()
        img = cv2.resize(img_bgr, (s, s))
        out = self._restore_one(self._as_input(img[..., ::-1]))
        ok, buf = cv2.imencode(".jpg", out)
        return buf.tobytes()

    def restore_concat(self, img_bgr: np.ndarray) -> bytes:
        """api1.py behavior: hconcat(input, output) (:106-174)."""
        s = self._size()
        img = cv2.resize(img_bgr, (s, s))
        out = self._restore_one(self._as_input(img[..., ::-1]))
        concat = cv2.hconcat([img, out])
        ok, buf = cv2.imencode(".jpg", concat)
        return buf.tobytes()


    def sr_x4(self, img_bgr: np.ndarray) -> bytes:
        """Tiled ×upscale SR of an arbitrary-size image through the
        exported serving engine (no resize — the tiler handles size)."""
        if self.sr_engine is None:
            raise RuntimeError(
                "no SR engine configured: export one with "
                "scripts/export_restorer.py and set IRT_SR_ENGINE")
        # uint8 through: EngineRestorer converts only if the engine's IO
        # needs it (u8-IO engines take it to the device untouched)
        rgb = np.ascontiguousarray(img_bgr[..., ::-1])
        out = self.sr_engine(rgb)
        ok, buf = cv2.imencode(".png", out[..., ::-1])
        return buf.tobytes()


ROUTES = {
    "/Vehicle_Resolution_GFPGAN/": ("vehicle_resolution", "image/png"),
    "/Restore/": ("restore", "image/jpeg"),
    "/RestoreConcat/": ("restore_concat", "image/jpeg"),
    "/SRx4/": ("sr_x4", "image/png"),
}


def create_app(core: Optional[ServiceCore] = None):
    """FastAPI app (requires fastapi to be installed)."""
    from fastapi import FastAPI, File
    from fastapi.responses import Response

    core = core or ServiceCore()
    app = FastAPI()

    @app.post("/Vehicle_Resolution_GFPGAN/")
    async def vehicle(file: bytes = File(...)):  # noqa: ANN001
        img = _decode_request_image(file)
        return Response(core.vehicle_resolution(img), media_type="image/png")

    @app.post("/Restore/")
    async def restore(file: bytes = File(...)):  # noqa: ANN001
        img = _decode_request_image(file)
        return Response(core.restore(img), media_type="image/jpeg")

    @app.post("/RestoreConcat/")
    async def restore_concat(file: bytes = File(...)):  # noqa: ANN001
        img = _decode_request_image(file)
        return Response(core.restore_concat(img), media_type="image/jpeg")

    @app.post("/SRx4/")
    async def sr_x4(file: bytes = File(...)):  # noqa: ANN001
        img = _decode_request_image(file)
        return Response(core.sr_x4(img), media_type="image/png")

    return app


def make_stdlib_handler(core: ServiceCore):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                route = ROUTES.get(self.path)
                if route is None:
                    self.send_error(404, f"unknown endpoint {self.path}")
                    return
                method, media = route
                img = _decode_request_image(
                    body, self.headers.get("Content-Type", ""))
                payload = getattr(core, method)(img)
                self.send_response(200)
                self.send_header("Content-Type", media)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as exc:  # mirror the reference error envelope
                payload = json.dumps({"is_success": False,
                                      "msg": "Server error",
                                      "results": str(exc)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        def log_message(self, *args):
            pass

    return Handler


def run_server(host: str = "0.0.0.0", port: int = 8000,
               core: Optional[ServiceCore] = None, use_fastapi: bool = True):
    core = core or ServiceCore()
    if use_fastapi:
        try:
            import uvicorn
            app = create_app(core)
            uvicorn.run(app, host=host, port=port)
            return
        except ImportError:
            pass
    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer((host, port), make_stdlib_handler(core))
    print(f"serving on http://{host}:{port} (stdlib http.server)")
    server.serve_forever()


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(description="restoration serving host")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--microbatch", default="0",
                    help="coalesce concurrent restore requests into one "
                         "device dispatch of up to N (0 = per-request; "
                         "'auto' = measure both regimes at startup and "
                         "pick the faster)")
    ap.add_argument("--microbatch-wait-ms", type=float, default=5.0)
    ap.add_argument("--host-io", action="store_true",
                    help="normalize/convert on the host (reference-exact) "
                         "instead of inside the device graph")
    ap.add_argument("--device-geometry", action="store_true",
                    help="run the full-pipeline endpoint's crop/mask/warp/"
                         "paste/montage on device (ONE dispatch per chunk "
                         "after the detector)")
    a = ap.parse_args()
    run_server(a.host, a.port,
               core=ServiceCore(microbatch=a.microbatch,
                                microbatch_wait_ms=a.microbatch_wait_ms,
                                device_io=not a.host_io,
                                device_geometry=a.device_geometry))
