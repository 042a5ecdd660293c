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
        mesh: optional 1-D ``jax.sharding.Mesh``. When set, offline
            ``submit`` clips run sharded over the mesh — one big
            request uses every chip. Live streams (``open_stream``)
            keep the single-device latency path regardless: one
            emission is quantum-sized (batch_size*8 frames), far too
            small to amortize cross-chip collectives, and its state
            must stay where the next quantum lands.
        mesh_mode: which sharded clip path ``submit`` uses:
            ``"windowed"`` (default) — ``predict_all_images_sharded``:
            window groups data-parallel, features replicated;
            single-device-identical results (the reference's
            overlap-stitch semantics, tester.py:260-312).
            ``"halo"`` — ``parallel.halo.predict_clip_sharded``: the
            clip's frames time-sharded with exact conv halo exchange
            and clip-global GroupNorm; this is the *full-clip* forward
            (no window stitching), so its outputs are the exact math
            the windowed path approximates, under the halo path's key
            set.
    """

    def __init__(
        self,
        predictor,
        as_numpy: bool = False,
        max_queue: int = 0,
        mesh=None,
        mesh_mode: str = "windowed",
    ):
        if mesh_mode not in ("windowed", "halo"):
            raise ValueError(
                f"mesh_mode must be 'windowed' or 'halo', got {mesh_mode!r}"
            )
        self.predictor = predictor
        self.as_numpy = as_numpy
        self.mesh = mesh
        self.mesh_mode = mesh_mode
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
        With a service ``mesh``, the clip's window groups run
        data-parallel over it. Raises RuntimeError after ``close()``.
        """
        n = int(len(frames) if frames is not None else len(phi))
        if self.mesh is not None and self.mesh_mode == "halo":
            thunk = lambda: self._predict_halo(frames, phi)
        elif self.mesh is not None:
            thunk = lambda: self.predictor.predict_all_images_sharded(
                frames, self.mesh, phi=phi, as_numpy=self.as_numpy
            )
        else:
            thunk = lambda: self.predictor.predict_all_images(
                frames, phi=phi, as_numpy=self.as_numpy
            )
        return self._submit_thunk(thunk, num_frames=n)

    def _predict_halo(self, frames, phi) -> Dict[str, Any]:
        """One clip through the exact time-sharded full-clip forward
        (parallel.halo.predict_clip_sharded) on the service mesh.

        Image clips encode to phi on one device first (the encoder is
        per-frame; only the temporal pipeline needs the halo mesh)."""
        import jax.numpy as jnp

        from human_dynamics_tpu.parallel.halo import predict_clip_sharded

        p = self.predictor
        if phi is None:
            if getattr(frames, "ndim", 0) == 2:
                phi = frames
            else:
                phi = p.encode_frames(frames)
        out = predict_clip_sharded(
            p.model, p.variables, p.smpl,
            jnp.asarray(phi, jnp.float32), self.mesh,
            axis_name=self.mesh.axis_names[0],
        )
        if self.as_numpy:
            out = {k: np.asarray(v) for k, v in out.items()}
        return out

    def _submit_thunk(self, thunk, num_frames: int = 0) -> "Future":
        """Enqueue arbitrary work on the dispatcher thread (the single
        owner of all jit calls); used by submit() and StreamingSession."""
        fut: "Future" = Future()
        with self._close_lock:
            if self._closed:
                raise RuntimeError("PredictionService is closed")
            # Count before enqueueing so a fast dispatcher can never
            # make a concurrent stats() read completed > submitted.
            with self._lock:
                self._stats["submitted"] += 1
            self._queue.put((fut, thunk, num_frames))
        return fut

    def open_stream(
        self, predictor=None, as_numpy: Optional[bool] = None
    ) -> "StreamingSession":
        """Open an online (live-video) stream served through this
        service's dispatcher thread.

        The session wraps ``StreamingPredictor`` (infer/streaming.py):
        emissions are offline-identical, with ``quantum`` frames per
        emission and ``latency_frames`` of input lookahead. Multiple
        concurrent streams (and offline ``submit`` clips) interleave
        safely — the dispatcher serializes all device work, and each
        session's emissions resolve in feed order.

        Args:
            predictor: optionally a differently-configured
                ``HmmrPredictor`` (e.g. batch_size=1 for lowest
                latency); defaults to the service's offline predictor.
            as_numpy: fetch emissions to host (default: the service's
                setting).
        """
        from human_dynamics_tpu.infer.streaming import StreamingPredictor

        sp = StreamingPredictor(
            predictor if predictor is not None else self.predictor,
            as_numpy=self.as_numpy if as_numpy is None else as_numpy,
        )
        return StreamingSession(self, sp)

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
            fut, thunk, num_frames = item
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                out = thunk()
            except Exception as e:  # resolve only this request
                fut.set_exception(e)
                with self._lock:
                    self._stats["failed"] += 1
                continue
            fut.set_result(out)
            with self._lock:
                self._stats["completed"] += 1
                self._stats["frames"] += num_frames


class StreamingSession:
    """A live stream multiplexed onto a ``PredictionService``.

    All methods return Futures resolved by the service's dispatcher
    thread in feed order:

        session = service.open_stream()
        for frames in camera:
            for out in session.feed(frames).result():
                consume(out)           # list of emission dicts
        for out in session.flush().result():
            consume(out)

    ``feed``/``flush``/``reset`` order is preserved per session (one
    FIFO queue); feeding after ``flush`` requires ``reset`` first
    (StreamingPredictor's contract).
    """

    def __init__(self, service: "PredictionService", sp):
        self._service = service
        self._sp = sp

    @property
    def quantum(self) -> int:
        """Frames per emission (batch_size * g)."""
        return self._sp.quantum

    @property
    def latency_frames(self) -> int:
        """Input lookahead before a frame's output can emit."""
        return self._sp.latency_frames

    def feed(self, frames) -> "Future":
        """Future of the (possibly empty) list of emission dicts the
        frames complete."""
        frames = np.asarray(frames)
        return self._service._submit_thunk(
            lambda: self._sp.feed(frames), num_frames=len(frames)
        )

    def flush(self) -> "Future":
        """Future of the final emissions (zero-phi back fill)."""
        return self._service._submit_thunk(self._sp.flush)

    def reset(self) -> "Future":
        """Start a new clip (runs on the dispatcher, after queued work)."""
        return self._service._submit_thunk(self._sp.reset)
