"""Online (live-video) streaming inference.

The reference handles long videos only OFFLINE: demo_video.py collects
every frame, then Tester.predict_all_images slides windows over the
complete clip (/root/reference/src/evaluation/tester.py:260-312). A
live deployment cannot wait for the whole clip. StreamingPredictor
emits the SAME per-frame outputs as the offline stitch, incrementally,
with a fixed input lookahead of ``latency_frames`` frames:

- The temporal encoder has a finite receptive field (fov = 13), so
  frame k's output depends only on phi[k-6 : k+7) — once 6 frames of
  lookahead exist, outputs are final. No approximation: emissions are
  bit-compatible with predict_all_images on the full clip (same
  window-group program on the same phi values; the flush pads with
  zero PHI exactly like the offline schedule, tester.py:281-311).
- State between steps is just the last 2*margin per-frame features
  (a (12, 2048) device array) — not images, so the steady-state cost
  is one ResNet pass per frame plus one window group per
  batch_size*g frames.
- Emission quantum = batch_size * g frames (g = T - 2*margin = 8):
  construct the wrapped HmmrPredictor with batch_size=1 for lowest
  latency (emit every 8 frames, ~0.3 s at 30 fps) or larger for
  better MXU utilization.

Usage:
    pred = HmmrPredictor(model, variables, smpl, batch_size=1)
    sp = StreamingPredictor(pred)
    for frames in camera:              # any-size frame batches
        for out in sp.feed(frames):    # dicts of (quantum, ...) arrays
            consume(out)
    for out in sp.flush():             # remaining frames
        consume(out)
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.infer.predictor import HmmrPredictor, _bucket


class StreamingPredictor:
    """Incremental windowed prediction with offline-identical outputs.

    Args:
        predictor: configured HmmrPredictor (its batch_size sets the
            emission quantum; all precision flags are honored).
        as_numpy: fetch emissions to host numpy (default keeps them
            device-resident, like predict_all_images(as_numpy=False)).
    """

    def __init__(self, predictor: HmmrPredictor, as_numpy: bool = False):
        self._p = predictor
        self.as_numpy = as_numpy
        self.margin = (predictor.model.fov - 1) // 2
        self.good = predictor.seq_length - 2 * self.margin
        self.quantum = predictor.batch_size * self.good
        self._image_mode = getattr(
            predictor.model, "include_resnet", False
        )
        self.reset()

    def reset(self) -> None:
        """Forget all stream state (start a new clip)."""
        self._pending: List[np.ndarray] = []   # un-encoded real frames
        self._pending_n = 0
        self._tail = None      # (2*margin, C) device phi; None = step 0
        self._uint8: Optional[bool] = None
        self._finished = False

    @property
    def latency_frames(self) -> int:
        """Input frames needed beyond a frame before its output emits
        (worst case: quantum-1 queue wait + margin lookahead)."""
        return self.quantum + self.margin

    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _encode(self, variables, enc_qp, is_uint8, frames):
        encode = self._p._chunk_encoder(variables, enc_qp, is_uint8)
        return encode(frames)

    @functools.partial(jax.jit, static_argnums=0)
    def _step(self, variables, buf):
        """buf ((B-1)*g + T, C) phi -> dict of (quantum, ...) outputs."""
        out = self._p._predict_window_groups(
            variables, buf, jnp.arange(1)
        )
        return {
            k: v.reshape((-1,) + v.shape[3:]) for k, v in out.items()
        }

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _emit_fused(self, variables, enc_qp, is_uint8, first, frames,
                    tail):
        """Image-mode steady path: ONE program per emission — encode
        the quantum's frames AND run the window group. Per-emission
        dispatch count drops from 2 to 1 (each dispatch carries real
        overhead on any deployment, and ~25 ms of handle marshalling on
        tunnel-grade links), and XLA can overlap the encoder with the
        temporal tail inside the single program."""
        encode = self._p._chunk_encoder(variables, enc_qp, is_uint8)
        phi = encode(frames)                 # (quantum [+margin], C)
        if first:
            front = jnp.zeros(
                (self.margin, phi.shape[-1]), phi.dtype
            )
        else:
            front = tail
        buf = jnp.concatenate([front, phi], axis=0)
        out = self._p._predict_window_groups(
            variables, buf, jnp.arange(1)
        )
        out = {
            k: v.reshape((-1,) + v.shape[3:]) for k, v in out.items()
        }
        return out, buf[-2 * self.margin:]

    def _encode_frames(self, frames_np: np.ndarray) -> jax.Array:
        """Encode real frames to phi (bucket-padded, trimmed)."""
        if not self._image_mode:
            return jnp.asarray(frames_np, jnp.float32)
        n = len(frames_np)
        padded_n = _bucket(n)
        dtype = np.uint8 if self._uint8 else np.float32
        padded = np.zeros(
            (padded_n,) + frames_np.shape[1:], dtype
        )
        padded[:n] = frames_np
        phi = self._encode(
            self._p._fused_vars, self._p._int8_qp, bool(self._uint8),
            jnp.asarray(padded),
        )
        return phi[:n]

    def _take(self, n: int) -> np.ndarray:
        """Pop the first n pending frames."""
        parts, got = [], 0
        while got < n:
            head = self._pending[0]
            need = n - got
            if len(head) <= need:
                parts.append(head)
                got += len(head)
                self._pending.pop(0)
            else:
                parts.append(head[:need])
                self._pending[0] = head[need:]
                got = n
        self._pending_n -= n
        return np.concatenate(parts, axis=0)

    def _run_step(self, phi_new: jax.Array) -> Dict:
        """Advance one window group; phi_new has quantum entries
        (+margin on step 0, where the front pad is zeros)."""
        if self._tail is None:
            front = jnp.zeros(
                (self.margin, phi_new.shape[-1]), phi_new.dtype
            )
        else:
            front = self._tail
        buf = jnp.concatenate([front, phi_new], axis=0)
        out = self._step(self._p._fused_vars, buf)
        self._tail = buf[-2 * self.margin:]
        if self.as_numpy:
            out = jax.device_get(out)
        return out

    def _need(self) -> int:
        """Real frames required before the next step can run."""
        return self.quantum + (self.margin if self._tail is None else 0)

    # ------------------------------------------------------------------

    def feed(self, frames) -> List[Dict]:
        """Append frames ((N, H, W, 3) images or (N, C) phi); returns
        the emissions they complete (possibly empty)."""
        if self._finished:
            raise RuntimeError("stream finished; call reset() first")
        frames = np.asarray(frames)
        if len(frames) == 0:
            return []
        is_uint8 = frames.dtype == np.uint8
        if self._uint8 is None:
            self._uint8 = is_uint8
        elif self._uint8 != is_uint8:
            raise ValueError("mixed uint8/float frames in one stream")
        self._pending.append(
            frames if is_uint8 else frames.astype(np.float32)
        )
        self._pending_n += len(frames)

        emissions = []
        while self._pending_n >= self._need():
            take = self._need()
            frames_np = self._take(take)
            if self._image_mode:
                # Fused single-dispatch emission (encode + window group
                # in one program; frame counts are fixed per phase, so
                # no bucket padding is needed).
                first = self._tail is None
                c = self._p.model.feature_dim
                tail = (
                    jnp.zeros((2 * self.margin, c), jnp.float32)
                    if first else self._tail
                )
                out, self._tail = self._emit_fused(
                    self._p._fused_vars, self._p._int8_qp,
                    bool(self._uint8), first,
                    jnp.asarray(frames_np), tail,
                )
                if self.as_numpy:
                    out = jax.device_get(out)
                emissions.append(out)
            else:
                phi = self._encode_frames(frames_np)
                emissions.append(self._run_step(phi))
        return emissions

    def flush(self) -> List[Dict]:
        """Finish the stream: emit outputs for all remaining frames
        (zero-phi back fill, exactly the offline schedule's padding).
        The final emission is trimmed to the real frame count."""
        if self._finished:
            raise RuntimeError("stream finished; call reset() first")
        self._finished = True
        r = self._pending_n   # un-encoded real frames
        # Un-emitted frames: the tail additionally holds `margin`
        # encoded-but-not-yet-emitted lookahead frames.
        u = r + (self.margin if self._tail is not None else 0)
        if u == 0:
            return []
        if r:
            phi_real = self._encode_frames(self._take(r))
            c = phi_real.shape[-1]
        else:
            c = self._tail.shape[-1]
            phi_real = jnp.zeros((0, c), self._tail.dtype)
        steps = int(np.ceil(u / self.quantum))
        emissions = []
        emitted = 0
        offset = 0  # consumed entries of phi_real
        for _ in range(steps):
            need = self.quantum + (
                self.margin if self._tail is None else 0
            )
            chunk = phi_real[offset:offset + need]
            offset += chunk.shape[0]
            if chunk.shape[0] < need:
                chunk = jnp.concatenate([
                    chunk,
                    jnp.zeros((need - chunk.shape[0], c), chunk.dtype),
                ], axis=0)
            out = self._run_step(chunk)
            keep = min(self.quantum, u - emitted)
            if keep < self.quantum:
                out = {k: v[:keep] for k, v in out.items()}
            emitted += keep
            emissions.append(out)
        return emissions
