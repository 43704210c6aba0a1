"""Request batcher: a production serving front-end for the jitted engines.

The reference serves predictions image-at-a-time from a Python loop
(/root/reference/src/predict.py:128-186); on TPU the economics invert —
one jitted call over a filled batch is ~7x cheaper per image than b1
dispatches (tools/bench_latency.py: 1.69 ms @b1 vs 60.4/256 = 0.24 ms
@b256) — so a deployment puts a batcher in front of the engine:

- Requests (single preprocessed images) arrive on any thread via
  ``submit()`` and resolve through ``concurrent.futures.Future``s.
- A worker thread coalesces them and dispatches ONE engine call per
  batch, padding the count up to a fixed **bucket** size. Buckets keep
  shapes static under jit — the TPU serving pattern: N precompiled
  graphs (one per bucket) instead of a recompile per request count.
- ``max_delay_ms`` bounds the fill wait: the first request in a batch
  never waits longer than this for co-riders (latency/throughput knob).

Padding rows are zeros; every engine path is per-image independent in
eval mode (convs/BN-folded/decode/NMS all batch-map), so pad rows cannot
perturb real outputs — pinned by test_serving.py against per-image calls.

Works with any ``(images) -> Detections`` batch callable: the int8 engine
(``make_int8_engine_fn``), the exact bf16 graph, or the mesh-sharded
engine (``make_sharded_int8_engine_fn``) — for the sharded case choose
buckets divisible by the mesh's data axis.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Sequence, Tuple

import jax
import numpy as np


class RequestBatcher:
    """Coalesce single-image requests into fixed-bucket engine batches.

    Args:
        predict: batch callable ``(images (n, H, W, C)) -> Detections``
            (already closed over q-params/thresholds).
        image_shape: per-image shape, e.g. ``(448, 448, 3)``.
        buckets: ascending batch sizes to pad to; each compiles once.
        max_delay_ms: max time the FIRST request of a batch waits for
            co-riders before dispatch.
        dtype: wire dtype of the stacked batch (uint8 for the in-graph
            normalize path, or the engine's float dtype).
    """

    def __init__(
        self,
        predict: Callable,
        image_shape: Tuple[int, ...],
        buckets: Sequence[int] = (1, 4, 16, 64),
        max_delay_ms: float = 2.0,
        dtype=np.float32,
    ):
        if not buckets or list(buckets) != sorted(set(buckets)):
            raise ValueError(f"buckets must be ascending+unique: {buckets!r}")
        self._predict = predict
        self._image_shape = tuple(image_shape)
        self._buckets = tuple(int(b) for b in buckets)
        self._max_delay = max_delay_ms / 1e3
        self._dtype = np.dtype(dtype)
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self.batches_dispatched = 0
        self.images_served = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- public
    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one preprocessed image; resolves to its per-image
        Detections (numpy, no batch dim)."""
        if self._closed:
            raise RuntimeError("RequestBatcher is closed")
        image = np.asarray(image, self._dtype)
        if image.shape != self._image_shape:
            raise ValueError(
                f"image shape {image.shape} != batcher shape "
                f"{self._image_shape}"
            )
        fut: Future = Future()
        self._queue.put((image, fut))
        return fut

    def warmup(self) -> None:
        """Compile every bucket once (zeros batches) before serving."""
        for b in self._buckets:
            batch = np.zeros((b, *self._image_shape), self._dtype)
            jax.block_until_ready(self._predict(batch))

    def close(self) -> None:
        """Flush pending requests, then stop the worker."""
        self._closed = True
        self._worker.join()
        # submit()'s closed-check and the worker's exit race by a hair: a
        # request enqueued in that window would strand its future. Fail any
        # leftovers crisply instead.
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                return
            if not fut.cancelled():
                fut.set_exception(RuntimeError("RequestBatcher closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- worker
    def _run(self) -> None:
        max_bucket = self._buckets[-1]
        while True:
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                if self._closed:
                    return
                continue
            batch = [first]
            deadline = time.monotonic() + self._max_delay
            while len(batch) < max_bucket:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._dispatch(batch)

    def _dispatch(self, batch) -> None:
        images = [b[0] for b in batch]
        futures = [b[1] for b in batch]
        n = len(images)
        bucket = next((b for b in self._buckets if b >= n), self._buckets[-1])
        stacked = np.zeros((bucket, *self._image_shape), self._dtype)
        stacked[:n] = np.stack(images)
        try:
            dets = jax.device_get(self._predict(stacked))
        except Exception as exc:  # noqa: BLE001 — fail the waiters, keep serving
            for fut in futures:
                if not fut.cancelled():
                    fut.set_exception(exc)
            return
        self.batches_dispatched += 1
        self.images_served += n
        for i, fut in enumerate(futures):
            # A caller may have cancelled while we computed; set_result on a
            # cancelled future raises and would kill the worker thread.
            if not fut.cancelled():
                fut.set_result(jax.tree.map(lambda a: a[i], dets))
