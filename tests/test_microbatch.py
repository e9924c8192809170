"""Micro-batching serving layer (serve/batching.py).

Unit tests drive MicroBatcher with a recording batch_fn; the integration
test runs the stdlib HTTP host with micro-batching enabled and fires
concurrent /Restore/ requests, asserting they coalesce into fewer device
dispatches than requests.
"""

import threading
import time
import urllib.request
from types import SimpleNamespace

import numpy as np
import cv2
import pytest

from image_restoration_tpu.serve.batching import MicroBatcher


def make_recorder(out_fn=lambda a: a * 2.0, delay_s=0.0):
    calls = []

    def batch_fn(arr):
        calls.append(arr.shape[0])
        if delay_s:
            time.sleep(delay_s)
        return out_fn(arr)

    return batch_fn, calls


def test_coalesces_concurrent_submits():
    batch_fn, calls = make_recorder(delay_s=0.02)
    b = MicroBatcher(batch_fn, max_batch=8, max_wait_ms=100.0)
    items = [np.full((4, 4, 3), i, np.float32) for i in range(8)]
    futs = [b.submit(x) for x in items]
    outs = [f.result(timeout=10) for f in futs]
    for i, o in enumerate(outs):  # result routed back to the right caller
        np.testing.assert_allclose(o, items[i] * 2.0)
    assert sum(calls) >= 8  # padding rows included
    assert len(calls) < 8  # strictly fewer dispatches than requests
    assert b.stats["items"] == 8
    b.stop()


def test_bucket_padding():
    batch_fn, calls = make_recorder()
    b = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=50.0,
                     buckets=(1, 2, 4))
    futs = [b.submit(np.ones((2, 2), np.float32) * i) for i in range(3)]
    outs = [f.result(timeout=10) for f in futs]
    assert len(outs) == 3
    # 3 items pad up to the 4-bucket (maybe split across dispatches, but
    # every dispatch size must be a bucket)
    assert all(c in (1, 2, 4) for c in calls)
    assert b.stats["padded_rows"] >= 1 or len(calls) > 1
    b.stop()


def test_exception_fans_out():
    def boom(arr):
        raise RuntimeError("device on fire")

    b = MicroBatcher(boom, max_batch=4, max_wait_ms=20.0)
    futs = [b.submit(np.zeros((2,), np.float32)) for _ in range(3)]
    for f in futs:
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(timeout=10)
    b.stop()


def test_shape_mismatch_rejected_at_submit():
    batch_fn, _ = make_recorder()
    b = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=20.0)
    b.submit(np.zeros((4, 4), np.float32)).result(timeout=10)
    with pytest.raises(ValueError, match="resize before submitting"):
        b.submit(np.zeros((8, 8), np.float32))
    b.stop()


def test_single_request_latency_bounded():
    batch_fn, calls = make_recorder()
    b = MicroBatcher(batch_fn, max_batch=32, max_wait_ms=30.0)
    t0 = time.monotonic()
    b(np.zeros((2, 2), np.float32), timeout=10)
    assert time.monotonic() - t0 < 5.0  # window closes, no deadlock
    assert calls == [1]
    b.stop()


def test_list_mode_heterogeneous_shapes():
    """stack=False hands the raw item list to batch_fn (the
    PlatePipeline.process_batch contract) — no shape check, no padding."""
    calls = []

    def list_fn(items):
        calls.append([i.shape for i in items])
        time.sleep(0.02)
        return [i.sum() for i in items]

    b = MicroBatcher(list_fn, max_batch=8, max_wait_ms=100.0, stack=False)
    items = [np.ones((4 + i, 3), np.float32) for i in range(6)]
    futs = [b.submit(x) for x in items]
    outs = [f.result(timeout=10) for f in futs]
    for x, o in zip(items, outs):
        np.testing.assert_allclose(o, x.sum())
    assert sum(len(c) for c in calls) == 6
    assert len(calls) < 6  # coalesced
    assert b.stats["padded_rows"] == 0
    b.stop()


def test_list_mode_wrong_result_count():
    b = MicroBatcher(lambda items: items[:-1] if len(items) > 1 else items,
                     max_batch=4, max_wait_ms=50.0, stack=False)
    futs = [b.submit(np.zeros(2, np.float32)) for _ in range(3)]
    # either coalesced (wrong count -> error fans out) or some singles
    # succeed; every future must resolve either way
    for f in futs:
        try:
            f.result(timeout=10)
        except RuntimeError as e:
            assert "results for" in str(e)
    b.stop()


class _StubRestorer:
    """Restorer-shaped stub: RGB float [0,1] in, BGR uint8 out."""

    input_size = (16, 16)

    def __init__(self):
        self.batch_sizes = []

    def restore_batch(self, imgs):
        self.batch_sizes.append(imgs.shape[0])
        time.sleep(0.02)  # emulate a device dispatch
        return (imgs[..., ::-1] * 255).astype(np.uint8)

    def __call__(self, img):
        return self.restore_batch(img[None])[0]


def test_http_concurrent_requests_coalesce():
    from http.server import ThreadingHTTPServer
    from image_restoration_tpu.serve.api import (ServiceCore,
                                                 make_stdlib_handler)

    stub = _StubRestorer()
    core = ServiceCore(pipeline=SimpleNamespace(car_restorer=stub),
                       restorer=stub, microbatch=8,
                       microbatch_wait_ms=100.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_stdlib_handler(core))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        img = (np.random.default_rng(0).random((16, 16, 3)) * 255)
        ok, buf = cv2.imencode(".jpg", img.astype(np.uint8))
        results, errs = [], []

        def post():
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/Restore/",
                    data=buf.tobytes(),
                    headers={"Content-Type": "application/octet-stream"})
                with urllib.request.urlopen(req, timeout=30) as resp:
                    results.append(resp.read())
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        threads = [threading.Thread(target=post) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errs
        assert len(results) == 8
        for r in results:  # each response decodes back to a 16² image
            out = cv2.imdecode(np.frombuffer(r, np.uint8), cv2.IMREAD_COLOR)
            assert out.shape == (16, 16, 3)
        # the 8 concurrent requests shared device dispatches
        assert core.batcher.stats["items"] == 8
        assert core.batcher.stats["dispatches"] < 8
    finally:
        server.shutdown()
        core.batcher.stop()


class _StubPipeline:
    """PlatePipeline-shaped stub recording process_batch coalescing."""

    def __init__(self, restorer):
        self.car_restorer = restorer
        self.batch_calls = []

    def process(self, img):  # pragma: no cover - batched path should win
        raise AssertionError("per-image process called with batcher on")

    def process_batch(self, imgs, chunk_size=8):
        self.batch_calls.append(len(imgs))
        time.sleep(0.02)
        return [{"montage": np.full((8, 48, 3), 7, np.uint8)}
                for _ in imgs]


def test_http_vehicle_endpoint_coalesces():
    """Concurrent /Vehicle_Resolution_GFPGAN/ requests share
    process_batch calls through the list-mode batcher."""
    from http.server import ThreadingHTTPServer
    from image_restoration_tpu.serve.api import (ServiceCore,
                                                 make_stdlib_handler)

    stub = _StubRestorer()
    pipe = _StubPipeline(stub)
    core = ServiceCore(pipeline=pipe, restorer=stub, microbatch=8,
                       microbatch_wait_ms=100.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_stdlib_handler(core))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        img = (np.random.default_rng(0).random((20, 30, 3)) * 255)
        ok, buf = cv2.imencode(".jpg", img.astype(np.uint8))
        results, errs = [], []

        def post():
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/Vehicle_Resolution_GFPGAN/",
                    data=buf.tobytes(),
                    headers={"Content-Type": "application/octet-stream"})
                with urllib.request.urlopen(req, timeout=30) as resp:
                    results.append(resp.read())
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        threads = [threading.Thread(target=post) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errs
        assert len(results) == 6
        for r in results:
            out = cv2.imdecode(np.frombuffer(r, np.uint8), cv2.IMREAD_COLOR)
            assert out.shape == (8, 48, 3) and (out == 7).all()
        assert sum(pipe.batch_calls) == 6
        assert len(pipe.batch_calls) < 6  # coalesced
    finally:
        server.shutdown()
        core.batcher.stop()
        core.pipeline_batcher.stop()


def test_pipeline_overlaps_dispatches():
    """With pipeline_depth=2 a second batch dispatches while the first is
    still in flight: 2 batches of a 50 ms batch_fn finish in well under
    2×50 ms + overheads (the r3 serialized dispatcher took the sum)."""
    started, lock = [], threading.Lock()

    def slow_fn(arr):
        with lock:
            started.append(time.monotonic())
        time.sleep(0.05)
        return arr * 2.0

    b = MicroBatcher(slow_fn, max_batch=2, max_wait_ms=5.0,
                     pipeline_depth=2)
    items = [np.full((2, 2), i, np.float32) for i in range(4)]
    t0 = time.monotonic()
    futs = [b.submit(x) for x in items]
    outs = [f.result(timeout=10) for f in futs]
    wall = time.monotonic() - t0
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, items[i] * 2.0)
    assert len(started) >= 2
    # the two dispatches overlapped: second started before first finished
    assert started[1] - started[0] < 0.045, started
    assert wall < 0.095, f"no overlap: {wall:.3f}s"
    b.stop()


def test_pipeline_depth_one_serializes():
    """pipeline_depth=1 keeps the host-stateful contract: batch_fn is
    never re-entered concurrently."""
    active, peak, lock = [0], [0], threading.Lock()

    def fn(arr):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        time.sleep(0.02)
        with lock:
            active[0] -= 1
        return arr

    b = MicroBatcher(fn, max_batch=2, max_wait_ms=1.0, pipeline_depth=1)
    futs = [b.submit(np.zeros((2,), np.float32)) for _ in range(6)]
    for f in futs:
        f.result(timeout=10)
    assert peak[0] == 1
    b.stop()


def test_min_fill_blocks_starved_dispatches():
    """A freed pipeline slot must not drain one-item batches (the r4
    chip-measured pathology: 7 size-1 dispatches in a 256-item run,
    docs/assets/microbatch_bench.json). With min_fill=4, a trickle that
    arrives while a batch is in flight coalesces to >=4 (or waits out
    the full window) instead of shipping singles."""
    batch_fn, calls = make_recorder(delay_s=0.15)
    b = MicroBatcher(batch_fn, max_batch=8, max_wait_ms=100.0,
                     pipeline_depth=2, min_fill=4)
    first = [b.submit(np.full((2, 2), i, np.float32)) for i in range(8)]
    time.sleep(0.01)  # first batch (size 8) now in flight
    trickle = []
    for i in range(4):  # one item every 10 ms while it round-trips
        trickle.append(b.submit(np.full((2, 2), 10 + i, np.float32)))
        time.sleep(0.01)
    for f in first + trickle:
        f.result(timeout=10)
    assert all(c >= 4 for c in calls), calls
    b.stop()


def test_calibrate_recommends_batching_for_overhead_bound_fn():
    """Fixed per-dispatch cost (the local-chip regime: dispatch overhead
    dwarfs per-item compute at these sizes) -> coalescing wins."""
    from image_restoration_tpu.serve.batching import calibrate

    def overhead_fn(arr):
        time.sleep(0.03)  # constant, batch-size independent
        return arr

    d = calibrate(overhead_fn, np.zeros((2, 2), np.float32),
                  max_batch=16, concurrency=8, repeats=2)
    assert d["recommend"] is True
    assert d["batched_imgs_per_s"] > d["per_request_imgs_per_s"]


def test_calibrate_recommends_per_request_for_item_bound_fn():
    """Pure per-item cost with no batch advantage (the high-latency
    tunnel regime: concurrent small RPCs already overlap) -> coalescing
    cannot win and must not be recommended."""
    from image_restoration_tpu.serve.batching import calibrate

    def item_fn(arr):  # concurrent calls overlap (tunnel RPCs do)
        time.sleep(0.002 * arr.shape[0])
        return arr

    d = calibrate(item_fn, np.zeros((2, 2), np.float32),
                  max_batch=16, concurrency=8, repeats=2)
    assert d["recommend"] is False


def test_service_core_auto_selects_and_records_decision(monkeypatch):
    """ServiceCore(microbatch='auto') measures the link and keeps the
    batcher only when coalescing wins; the calibration that decided it
    is recorded either way."""
    from image_restoration_tpu.serve.api import ServiceCore
    monkeypatch.setenv("IRT_MICROBATCH_MAX", "8")

    class OverheadStub(_StubRestorer):
        # serialized "device" (a real chip runs one graph at a time)
        # with a fixed per-dispatch cost -> coalescing wins
        lock = threading.Lock()

        def restore_batch(self, imgs):
            self.batch_sizes.append(imgs.shape[0])
            with self.lock:
                time.sleep(0.005 + 0.001 * imgs.shape[0])
            return (imgs[..., ::-1] * 255).astype(np.uint8)

    stub = OverheadStub()
    core = ServiceCore(pipeline=SimpleNamespace(car_restorer=stub),
                       restorer=stub, microbatch="auto")
    try:
        assert core.microbatch_decision["recommend"] is True
        assert core.batcher is not None
        assert core.batcher.max_batch == 8
    finally:
        if core.batcher is not None:
            core.batcher.stop()
        if core.pipeline_batcher is not None:
            core.pipeline_batcher.stop()

    class ItemBoundStub(_StubRestorer):
        # concurrent calls overlap (tunnel RPCs do) with pure per-item
        # cost -> coalescing cannot win
        def restore_batch(self, imgs):
            time.sleep(0.002 * imgs.shape[0])
            return (imgs[..., ::-1] * 255).astype(np.uint8)

    stub2 = ItemBoundStub()
    core2 = ServiceCore(pipeline=SimpleNamespace(car_restorer=stub2),
                        restorer=stub2, microbatch="auto")
    assert core2.microbatch_decision["recommend"] is False
    assert core2.batcher is None  # falls back to per-request dispatch
    assert core2.pipeline_batcher is None


def test_cancelled_future_does_not_kill_dispatcher():
    """A caller that cancels its Future (gave up waiting) must not crash
    the dispatcher thread — later requests still get served."""
    batch_fn, _ = make_recorder(delay_s=0.05)
    b = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=1.0)
    doomed = b.submit(np.zeros((2, 2), np.float32))
    doomed.cancel()  # races the dispatch; either way it must be survivable
    for _ in range(3):
        out = b.submit(np.ones((2, 2), np.float32)).result(timeout=10)
        np.testing.assert_allclose(out, 2.0)
    assert b._thread.is_alive()
    b.stop()
