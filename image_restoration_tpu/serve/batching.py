"""Dynamic micro-batching for concurrent serving requests.

TPU-first serving: chip throughput rises steeply with batch size (measured
on the production GFPGAN 256² generator: 358 → 632 imgs/s from batch 4 → 32
in bf16, and +42% on top of that with dyn-int8 at batch ≥ 32 —
docs/PERFORMANCE.md "GFPGAN serving PTQ"), while the reference FastAPI
servers dispatch every HTTP request as its own forward
(Car_Plate-Restoration/api.py:125-151, api_plate_oto.py:404-489).
`MicroBatcher` closes that gap: requests that arrive within a short window
are coalesced into ONE padded device dispatch and the results are fanned
back out to the callers.

Shapes stay static for XLA: batches are padded up to a fixed bucket ladder
(powers of two by default) so the jitted forward compiles once per bucket —
never per arrival pattern. Padding replicates the last real item, so the
padded rows cost compute but cannot produce NaN/denormal surprises.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Optional, Sequence

import numpy as np

_SENTINEL = object()


def _default_buckets(max_batch: int) -> tuple:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


class MicroBatcher:
    """Coalesce concurrent `submit()` calls into batched `batch_fn` calls.

    Args:
        batch_fn: maps a stacked (N, ...) array to an (N, ...) result array.
            With pipeline_depth == 1 it is called from the single
            dispatcher thread only; with pipeline_depth > 1 it may be
            called from up to that many completer threads concurrently
            (jitted JAX callables are thread-safe; host-stateful
            batch_fns must pass pipeline_depth=1).
        max_batch: hard cap per dispatch (and largest bucket).
        max_wait_ms: how long the dispatcher holds the FIRST request of a
            batch while waiting for more to arrive. Latency cost under low
            concurrency; amortized to ~0 under load (the window closes as
            soon as max_batch is reached).
        buckets: ascending pad targets; batches are padded up to the next
            bucket so XLA sees a bounded shape set. Default: powers of two
            up to max_batch.
        stack: True (default) stacks same-shape items into one (N, ...)
            array and pads to a bucket. False passes the raw item LIST to
            batch_fn and expects a same-length sequence back — for
            consumers that handle heterogeneous shapes and their own
            padding, e.g. PlatePipeline.process_batch.
    """

    def __init__(self, batch_fn: Callable[[np.ndarray], np.ndarray],
                 max_batch: int = 32, max_wait_ms: float = 5.0,
                 buckets: Optional[Sequence[int]] = None,
                 stack: bool = True):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.batch_fn = batch_fn
        self.stack = stack
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.buckets = tuple(sorted(buckets)) if buckets else \
            _default_buckets(self.max_batch)
        if self.buckets[-1] < self.max_batch:
            raise ValueError("largest bucket must cover max_batch")
        self.stats = {"items": 0, "dispatches": 0, "padded_rows": 0,
                      "batch_hist": {}}
        self._q: queue.Queue = queue.Queue()
        self._shape = None
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="microbatcher")
        self._thread.start()

    # ---- client side ----
    def submit(self, item: np.ndarray) -> Future:
        item = np.asarray(item)
        if self.stack:
            with self._lock:
                if self._shape is None:
                    self._shape = item.shape
                elif item.shape != self._shape:
                    raise ValueError(
                        f"item shape {item.shape} != batcher shape "
                        f"{self._shape}; resize before submitting")
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def __call__(self, item: np.ndarray, timeout: Optional[float] = None):
        return self.submit(item).result(timeout)

    def stop(self):
        self._q.put(_SENTINEL)
        self._thread.join(timeout=5)

    # ---- dispatcher side ----
    def _run(self):
        while True:
            entry = self._q.get()
            if entry is _SENTINEL:
                return
            batch = [entry]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    entry = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if entry is _SENTINEL:
                    self._q.put(_SENTINEL)  # let the outer loop exit
                    break
                batch.append(entry)
            self._dispatch(batch)

    def _dispatch(self, batch):
        futs = [b[1] for b in batch]
        n = len(futs)
        bucket = next(b for b in self.buckets if b >= n)
        try:
            if self.stack:
                items = np.stack([b[0] for b in batch])
                if bucket > n:
                    pad = np.repeat(items[-1:], bucket - n, axis=0)
                    items = np.concatenate([items, pad], axis=0)
                out = np.asarray(self.batch_fn(items))[:n]
            else:  # list mode: the consumer pads/chunks itself
                bucket = n
                out = self.batch_fn([b[0] for b in batch])
                if len(out) != n:
                    raise RuntimeError(
                        f"batch_fn returned {len(out)} results for {n} "
                        "items")
        except Exception as exc:  # fan the failure out to every caller
            for f in futs:
                try:
                    f.set_exception(exc)
                except Exception:
                    pass  # caller cancelled; must not kill the dispatcher
            return
        self.stats["items"] += n
        self.stats["dispatches"] += 1
        self.stats["padded_rows"] += bucket - n
        hist = self.stats["batch_hist"]
        hist[bucket] = hist.get(bucket, 0) + 1
        for f, o in zip(futs, out):
            try:
                f.set_result(o)
            except Exception:
                pass  # caller cancelled; must not kill the dispatcher
