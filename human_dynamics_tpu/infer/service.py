"""Concurrent prediction service: pipelined single-chip serving.

The reference serves predictions one blocking ``sess.run`` at a time
(demo_video.py / tester.py). On TPU the right serving shape is
different: jit dispatch is asynchronous, so a single dispatcher thread
that issues requests back-to-back keeps the chip busy with zero gaps,
while callers block only on their own (device-resident) results. This
is the same pipelining that bench.py measures — the service packages
it behind a thread-safe, future-based API:

    service = PredictionService(predictor)
    fut = service.submit(frames)          # any thread, returns a Future
    preds = fut.result()                  # device arrays (see as_numpy)

Design notes:
- One dispatcher thread owns all jit calls (dispatch ordering stays
  deterministic; no interpreter-level contention on the JAX client).
- Results resolve as *device* arrays by default: the caller decides
  what (if anything) to fetch. `as_numpy=True` fetches on the
  dispatcher thread — fine locally, slow through a tunnel (CLAUDE.md).
- The predictor buckets window/chunk counts to the {2^k, 3*2^k} grid
  (``HmmrPredictor._bucket``), so mixed clip lengths reuse a handful of
  compiled programs; the first request of a new bucket pays that
  compile once per process.
- Errors in a request resolve only that request's future; the service
  keeps running. `close()` drains the queue and joins the thread.

No reference counterpart (SURVEY §2.3-style TPU-native addition).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, Optional

import numpy as np


class PredictionService:
    """Thread-safe, pipelined serving wrapper around ``HmmrPredictor``.

    Args:
        predictor: a constructed ``HmmrPredictor`` (weights already on
            device).
        as_numpy: resolve futures with host numpy arrays instead of
            device arrays (adds a device->host fetch per request).
        max_queue: backpressure bound — ``submit`` blocks once this many
            requests are waiting (0 = unbounded).
    """

    def __init__(
        self,
        predictor,
        as_numpy: bool = False,
        max_queue: int = 0,
    ):
        self.predictor = predictor
        self.as_numpy = as_numpy
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._lock = threading.Lock()
        # Lifecycle lock: makes the closed-check + enqueue in submit()
        # atomic against close()'s closed-set + sentinel enqueue, so no
        # request can land behind the sentinel and hang its Future.
        # Separate from _lock: the dispatcher takes _lock for stats, and
        # a bounded-queue put may block in submit while holding this.
        self._close_lock = threading.Lock()
        self._stats = {
            "submitted": 0, "completed": 0, "failed": 0, "frames": 0,
        }
        self._closed = False
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="hd-tpu-serve", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(
        self, frames: np.ndarray, phi: Optional[np.ndarray] = None
    ) -> "Future[Dict[str, Any]]":
        """Enqueue one clip; returns a Future of the prediction dict.

        ``frames``/``phi`` follow ``HmmrPredictor.predict_all_images``.
        Raises RuntimeError after ``close()``.
        """
        fut: "Future[Dict[str, Any]]" = Future()
        with self._close_lock:
            if self._closed:
                raise RuntimeError("PredictionService is closed")
            # Count before enqueueing so a fast dispatcher can never
            # make a concurrent stats() read completed > submitted.
            with self._lock:
                self._stats["submitted"] += 1
            self._queue.put((fut, frames, phi))
        return fut

    def stats(self) -> Dict[str, int]:
        with self._lock:
            return dict(self._stats)

    def close(self, drain: bool = True) -> None:
        """Stop accepting work; by default finish what's queued."""
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            if not drain:
                # Fail queued-but-unstarted requests.
                try:
                    while True:
                        fut, _, _ = self._queue.get_nowait()
                        fut.set_exception(
                            RuntimeError("PredictionService closed")
                        )
                except queue.Empty:
                    pass
            self._queue.put(None)  # sentinel
        self._thread.join()

    def __enter__(self) -> "PredictionService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------------

    def _dispatch_loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            fut, frames, phi = item
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                out = self.predictor.predict_all_images(
                    frames, phi=phi, as_numpy=self.as_numpy
                )
            except Exception as e:  # resolve only this request
                fut.set_exception(e)
                with self._lock:
                    self._stats["failed"] += 1
                continue
            fut.set_result(out)
            with self._lock:
                self._stats["completed"] += 1
                self._stats["frames"] += int(
                    len(frames) if frames is not None else len(phi)
                )
