"""Windowed HMMR inference engine.

TPU-first replacement for Tester (/root/reference/src/evaluation/tester.py):

- The per-window ``sess.run`` loop (tester.py:293-303, the reference's hot
  host<->device boundary) becomes ONE jitted program: a ``lax.map`` over
  window groups that gathers each window from the padded per-frame feature
  buffer with dynamic slices, runs the temporal model + IEF heads, trims
  to the good center frames, and evaluates SMPL for all heads in a single
  stacked batched call.
- The ResNet runs once per *unique* frame, not once per window: the
  reference re-encodes every frame ~T/g = 2.5x because windows overlap
  (tester.py:171-180). Identical outputs (phi is per-frame), 2.5x less
  encoder compute.
- SMPL is evaluated only for kept frames ((B, g) not (B, T)): another
  2.5x saving with bit-identical kept outputs.

Output schema matches Tester.make_fetch_dict / predict_all_images
(tester.py:217-255,260-312): keys cams/joints/kps/poses/shapes/verts/omegas
(N, ...) plus '*_delta' stacked (N, D, ...) over sorted delta_t values.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.core.smpl import SmplModel
from human_dynamics_tpu.infer.window import WindowSchedule
from human_dynamics_tpu.models.hmmr import HmmrModel
from human_dynamics_tpu.models.omega import compute_smpl, split_omega
from human_dynamics_tpu.utils.precision import tree_bf16


def _next_pow2(x: int) -> int:
    """Smallest power of two >= x (compile-count bucketing)."""
    return 1 << max(0, (x - 1)).bit_length()


def _bucket(x: int) -> int:
    """Smallest of {2^k, 3*2^k} >= x.

    Compile-count bucketing for chunk/window counts: assorted video
    lengths share a small set of compiled programs while bounding padded
    compute waste to < 50% (pure powers of two waste up to 100%).
    """
    p = _next_pow2(x)
    if p >= 4 and 3 * (p // 4) >= x:
        return 3 * (p // 4)
    return p


class HmmrPredictor:
    """Holds (model, params, smpl) and runs windowed prediction.

    Args:
        model: HmmrModel (include_resnet toggles image input).
        variables: flax variables for the model.
        smpl: SmplModel used to decode omegas.
        batch_size: windows per group (B).
        seq_length: window length (T).
        pred_mode: 'pred' (temporal encoder) or 'hal' (hallucinator),
            mirroring tester.py:183-194.
    """

    def __init__(
        self,
        model: HmmrModel,
        variables,
        smpl: SmplModel,
        batch_size: int = 8,
        seq_length: int = 20,
        pred_mode: str = "pred",
        use_fused_smpl: bool = False,
        bf16_encoder: bool = False,
        int8_encoder: bool = False,
        int8_calibration=None,
        int8_root: bool = False,
        int8_stream=False,
        bf16_temporal: bool = False,
        groups_per_step: int = 8,
        encode_chunk: int = 120,
        unroll_chunks: int = 0,
    ):
        if pred_mode not in ("pred", "hal"):
            raise ValueError(f"Pred mode {pred_mode!r} not recognized")
        if seq_length < model.fov:
            # g = T - (fov - 1) good frames per window; T < fov leaves
            # zero, which the stitch schedule cannot cover.
            raise ValueError(
                f"seq_length={seq_length} is below the temporal "
                f"fov={model.fov}; windows would contribute no frames"
            )
        self.model = model
        self.variables = variables
        self.smpl = smpl
        self.batch_size = batch_size
        self.seq_length = seq_length
        self.pred_mode = pred_mode
        self.use_fused_smpl = use_fused_smpl
        # bf16 ResNet inference: ~2x encoder throughput at ~2e-3 relative
        # phi deviation; keep False where checkpoint bit-parity matters.
        self.bf16_encoder = bf16_encoder
        # int8 ResNet inference (models/resnet_int8.py). NOTE: measured
        # ~25% SLOWER than bf16 on v5e via XLA (quant/dequant passes
        # outweigh the 2x MXU rate — see that module's docstring);
        # provided for weight-memory-bound serving and as the substrate
        # for a future fused kernel. Takes precedence over bf16_encoder.
        # Weights are quantized ONCE here and stay device-resident; a
        # memory-bound caller may then drop the fp32 resnet subtree from
        # `variables` (the window tail never binds it).
        self.int8_encoder = int8_encoder
        # int8 root stem (True: s2d stride-folded conv + int8 maxpool;
        # "wfold": width-only fold whose input view is a free reshape,
        # no transpose pass; "u8": byte-direct — raw uint8 frames enter
        # the wfold conv as (u ^ 0x80) with an exact affine border
        # correction, removing the full-res normalize AND quantize
        # passes) and per-block int8 residual stream —
        # static-scale-only variants of the int8 encoder
        # (models/resnet_int8.py docstring has the per-variant v5e
        # measurements).
        self.int8_root = int8_root
        self.int8_stream = int8_stream
        if (int8_root or int8_stream) and int8_calibration is None:
            raise ValueError(
                "int8_root/int8_stream need int8_calibration (static "
                "scales calibrate the stream/root requantization)"
            )
        self._int8_qp = None
        if int8_encoder and int8_calibration is None:
            import warnings

            warnings.warn(
                "int8_encoder WITHOUT int8_calibration uses dynamic "
                "activation scales, measured ~25% SLOWER than "
                "bf16_encoder on TPU v5e via XLA (the per-conv max "
                "reduction blocks epilogue fusion; see "
                "models/resnet_int8.py). Pass a calibration batch for "
                "the static-scale fast path, or enable it only for "
                "weight memory.",
                RuntimeWarning, stacklevel=2,
            )
        if int8_encoder and variables is not None:
            from human_dynamics_tpu.models.resnet_int8 import (
                calibrate_int8_scales, prepare_int8_params,
            )

            self._int8_qp = jax.jit(prepare_int8_params)({
                "params": variables["params"]["resnet_v2_50"],
                "batch_stats": variables["batch_stats"]["resnet_v2_50"],
            })
            if int8_calibration is not None:
                # Static per-layer activation scales: observed once on
                # the calibration images, then every requant fuses into
                # its conv epilogue (the fast path; resnet_int8.py).
                # Stored inside the qp dict (calib/ prefix) so the
                # fused-predict jit carries one pytree.
                calib = jnp.asarray(int8_calibration)
                if calib.dtype == jnp.uint8:
                    # Raw frames: apply the same on-device
                    # normalization the fused path uses (crop.py:52).
                    calib = (
                        calib.astype(jnp.float32) * (2.0 / 255.0) - 1.0
                    )
                calib = calib.astype(jnp.float32)
                scales = jax.jit(
                    lambda qp, im: calibrate_int8_scales(qp, im)
                )(self._int8_qp, calib)
                self._int8_qp = {
                    **self._int8_qp,
                    **{"calib/" + k: v for k, v in scales.items()},
                }
        # bf16 temporal encoder + IEF heads (the non-resnet matmuls of the
        # window tail; GroupNorm stats stay fp32 inside flax). Omegas are
        # cast back to fp32 before SMPL decode. Same accuracy caveat.
        self.bf16_temporal = bf16_temporal
        # Frames per encoder step inside the fused program. Full
        # int8-static trunk batch sweep on v5e (img/s): 80: 15.8k,
        # 96: 18.3k, 112: 18.7k, 120: 18.5k, 128: 19.1k, 144: 14.7k
        # (XLA tiling cliff), 160: 16.0k, 240: 16.8k. 128 peaks
        # per-image, but 120 divides common clip lengths (480 = 4*120
        # exactly vs 32 padded frames at 128) so it stays the default;
        # both sit on the plateau and well clear of the 144/160 cliff.
        self.encode_chunk = encode_chunk
        # Unroll the per-chunk encoder loop inside the fused program when
        # the (static) chunk count is <= this. lax.map lowers to a
        # while-loop: strict iteration ordering plus a dynamic-update-
        # slice of the phi buffer per step; unrolling hands XLA one flat
        # graph of independent chunk encoders it may schedule/fuse
        # across. MEASURED NEGATIVE on v5e (10-rep interleaved A/B,
        # bench config, 480-frame clips): 37.6 ms/clip unrolled vs
        # 33.2 ms lax.map — the flat graph schedules no better and the
        # final phi concatenate is an extra materialized pass the
        # while-loop's in-place buffer update avoids. Kept as a tested
        # opt-in; 0 (default) keeps the lax.map path.
        self.unroll_chunks = unroll_chunks
        # Window groups are flattened into the batch dimension and
        # processed `groups_per_step` at a time: big batched matmuls and
        # few kernel launches (the per-group lax.map was latency-bound),
        # while bounding peak memory for very long clips (SMPL decode of
        # groups_per_step*B*g frames x heads at once).
        self.groups_per_step = groups_per_step
        self.delta_ts = tuple(sorted(model.delta_t_values))
        # Precast bf16 weights ONCE when no consumer of the variables
        # tree needs fp32: with bf16_temporal, the in-jit tree_bf16
        # otherwise re-reads every fp32 weight and writes its bf16 copy
        # on EVERY clip dispatch (~0.5 ms of pure HBM traffic for the
        # temporal/IEF stack; tail probe in scripts/probe_mxu.py).
        # tree_bf16 is identity on bf16 leaves, so the traced tail math
        # is unchanged bit-for-bit vs the per-call cast. Legal whenever
        # the encoder inside the fused program doesn't read fp32
        # weights: int8 encoder (reads only the quantized qp tree),
        # bf16 encoder (casts the same way), or phi-only models. The
        # fp32 default path keeps the fp32 tree (bit-parity).
        self._fused_vars = variables
        if bf16_temporal and variables is not None and (
            int8_encoder or bf16_encoder
            or not getattr(model, "include_resnet", False)
        ):
            src = variables
            if int8_encoder:
                # The fused program's encoder reads only the int8 qp
                # tree; dropping the resnet subtree from the bf16 copy
                # avoids ~50 MB of never-bound device residency (the
                # window tail binds only the temporal/IEF stack).
                src = {
                    col: {
                        k: v for k, v in tree.items()
                        if k != "resnet_v2_50"
                    } if isinstance(tree, dict) else tree
                    for col, tree in variables.items()
                }
            self._fused_vars = tree_bf16(src)

    # ------------------------------------------------------------------
    # Feature extraction (image mode)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_chunk(self, variables, images: jax.Array) -> jax.Array:
        return self.model.apply(
            variables, images[None], train=False,
            method=lambda m, im, train: m.encode_images(im, train),
        )[0]

    def encode_frames(self, images, chunk: int = 64) -> jax.Array:
        """(N, H, W, 3) [-1,1] images -> (N, 2048) phi, fixed-size chunks.

        Pads the tail chunk (cf. resnet_extractor.py:74-98's batch-64
        zero padding) so only one program is compiled. Features stay on
        device — nothing is fetched to host.
        """
        n = len(images)
        num_chunks = int(np.ceil(n / chunk))
        if isinstance(images, np.ndarray):
            padded = np.zeros(
                (num_chunks * chunk,) + images.shape[1:], np.float32
            )
            padded[:n] = images
            padded = jnp.asarray(padded)
        else:
            padded = jnp.pad(
                images, [(0, num_chunks * chunk - n)] + [(0, 0)] * 3
            )
        phis = [
            self._encode_chunk(
                self.variables, padded[i * chunk:(i + 1) * chunk]
            )
            for i in range(num_chunks)
        ]
        return jnp.concatenate(phis, axis=0)[:n]

    # ------------------------------------------------------------------
    # Windowed prediction
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _predict_windows(self, variables, phi_padded: jax.Array, count: int):
        """phi_padded (P, 2048) -> dict of (count, B, g, ...) outputs."""
        return self._predict_window_groups(
            variables, phi_padded, jnp.arange(count)
        )

    def _predict_window_groups(
        self, variables, phi_padded: jax.Array, group_ids: jax.Array
    ):
        """Process the window groups in ``group_ids`` (the sharded entry
        point maps a per-device slice of groups over a replicated
        feature buffer).

        Groups are flattened into the batch dimension, up to
        ``groups_per_step`` at a time: one gather builds all windows, one
        model.apply + one stacked SMPL call decode them. Returns a dict
        of (num_groups, B, g, ...) arrays.
        """
        b = self.batch_size
        t = self.seq_length
        margin = (self.model.fov - 1) // 2
        g = t - 2 * margin
        n_groups = group_ids.shape[0]

        def run_groups(ids):
            """ids (S,) -> dict of (S, B, g, ...)."""
            s = ids.shape[0]
            # Window w starts at frame w*g of the padded buffer; one
            # gather builds all S*B windows of T frames.
            win = (ids[:, None] * b + jnp.arange(b)[None]).reshape(-1)
            idx = win[:, None] * g + jnp.arange(t)[None]   # (S*B, T)
            windows = phi_padded[idx]                       # (S*B, T, C)

            apply_vars = variables
            if self.bf16_temporal:
                apply_vars = tree_bf16(variables)
                windows = windows.astype(jnp.bfloat16)
            out = self.model.apply(apply_vars, windows, train=False)
            if self.bf16_temporal:
                to_f32 = lambda v: v.astype(jnp.float32)
                out = out._replace(
                    omega_pred=to_f32(out.omega_pred),
                    omegas_delta={
                        k: to_f32(v) for k, v in out.omegas_delta.items()
                    },
                    omega_hal=(
                        None if out.omega_hal is None
                        else to_f32(out.omega_hal)
                    ),
                    omegas_hal_delta={
                        k: to_f32(v)
                        for k, v in out.omegas_hal_delta.items()
                    },
                )
            if self.pred_mode == "hal":
                present = out.omega_hal
                deltas = out.omegas_hal_delta
            else:
                present = out.omega_pred
                deltas = out.omegas_delta

            # Keep only full-fov center frames BEFORE SMPL decode.
            keep = lambda x: x[:, margin:margin + g]
            present = keep(present)
            deltas = {dt: keep(v) for dt, v in deltas.items()}

            # One stacked SMPL call for all heads (present + D deltas).
            head_list = [present] + [deltas[dt] for dt in self.delta_ts
                                     if dt in deltas]
            stacked = jnp.stack(head_list)            # (H, S*B, g, 85)
            cams_present = split_omega(present)[0]    # (S*B, g, 3)
            # Deltas are projected with the PRESENT camera
            # (tester.py:208-213 set_cams + omega.py:282-289 test branch).
            cams_all = jnp.broadcast_to(
                cams_present[None], stacked.shape[:-1] + (3,)
            )
            sm = compute_smpl(
                self.smpl, stacked, use_optcam=False,
                cams_override=cams_all, fused=self.use_fused_smpl,
            )

            def head_dict(i, suffix=""):
                c, p, sh = split_omega(stacked[i])
                return {
                    "cams" + suffix: cams_all[i],
                    "joints" + suffix: sm.joints[i],
                    "kps" + suffix: sm.kps[i],
                    "poses" + suffix: sm.poses_rot[i],
                    "shapes" + suffix: sh,
                    "verts" + suffix: sm.verts[i],
                    "omegas" + suffix: stacked[i],
                }

            result = head_dict(0)
            if len(head_list) > 1:
                delta_stack = {
                    k + "_delta": []
                    for k in ("cams", "joints", "kps", "poses", "shapes",
                              "verts", "omegas")
                }
                for i in range(1, len(head_list)):
                    hd = head_dict(i)
                    for k in ("cams", "joints", "kps", "poses", "shapes",
                              "verts", "omegas"):
                        delta_stack[k + "_delta"].append(hd[k])
                # (S*B, g, D, ...) per tester.py:252-254 stack axis=2.
                for k, v in delta_stack.items():
                    result[k] = jnp.stack(v, axis=2)
            # (S*B, g, ...) -> (S, B, g, ...).
            return {
                k: v.reshape((s, b) + v.shape[1:])
                for k, v in result.items()
            }

        # Largest divisor of n_groups that fits the per-step bound.
        # Counts come from _bucket's {2^k, 3*2^k} set, so e.g. count 12
        # with groups_per_step 8 runs as 2 steps of 6 — NOT one 12-group
        # mega-step, which would breach the peak-memory bound this
        # chunking exists to enforce.
        step = min(self.groups_per_step, n_groups)
        while n_groups % step != 0:
            step -= 1
        if n_groups == step:
            return run_groups(group_ids)
        mapped = jax.lax.map(
            run_groups, group_ids.reshape(n_groups // step, step)
        )
        # (R, S, B, g, ...) -> (R*S, B, g, ...).
        return {
            k: v.reshape((n_groups,) + v.shape[2:])
            for k, v in mapped.items()
        }

    # ------------------------------------------------------------------
    # Multi-chip data-parallel windowed inference
    # ------------------------------------------------------------------

    def predict_all_images_sharded(
        self, frames, mesh, phi=None, as_numpy: bool = True
    ) -> Dict[str, np.ndarray]:
        """predict_all_images with window groups sharded over a mesh.

        The per-frame feature buffer is replicated (N x 2048 — small);
        each device runs its slice of window groups; outputs come back
        sharded on the group axis and are stitched identically to the
        single-chip path. Same results as predict_all_images.

        Args:
            frames/phi: as in predict_all_images (phi mode; image mode
                encodes on one device first).
            mesh: 1-D jax.sharding.Mesh.
        """
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        n_dev = mesh.devices.size

        if phi is None:
            if hasattr(frames, "ndim") and frames.ndim == 2:
                phi = frames
            else:
                phi = self.encode_frames(frames)
        n = len(phi)

        sched = WindowSchedule(
            num_frames=n,
            batch_size=self.batch_size,
            seq_length=self.seq_length,
            fov=self.model.fov,
        )
        # Round group count up to the mesh size.
        count = int(np.ceil(sched.count / n_dev)) * n_dev
        extra = (count - sched.count) * self.batch_size * sched.good_frames
        phi_padded = jnp.pad(
            jnp.asarray(phi, jnp.float32),
            [(sched.margin, sched.num_fill + extra), (0, 0)],
        )

        run = jax.shard_map(
            lambda v, p, ids: self._predict_window_groups(v, p, ids),
            mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=P(axis),
        )
        out = run(self._fused_vars, phi_padded, jnp.arange(count))

        def stitch(v):
            flat = v.reshape((-1,) + v.shape[3:])[:n]
            return np.asarray(flat) if as_numpy else flat

        return {k: stitch(v) for k, v in out.items()}

    def _chunk_encoder(self, variables, enc_qp, is_uint8: bool):
        """Build the traced frame-chunk encoder closure for the active
        precision config: (M, H, W, 3) frames -> (M, 2048) fp32 phi.

        Shared by the offline fused program and the streaming
        predictor, so both run the identical encoder math.
        """
        if is_uint8:
            # Raw video frames: normalize ([0,255] -> [-1,1],
            # crop.py:52's convention) on device, fused into the
            # encoder's first elementwise pass. The clip rides HBM
            # (and, in real serving, the host->device link) at
            # 1 byte/pixel instead of 4.
            norm = lambda im: (
                im.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            )
        else:
            norm = lambda im: im
        if self.int8_encoder:
            from human_dynamics_tpu.models.resnet_int8 import (
                apply_int8, apply_int8_static,
            )

            scales = {
                k[len("calib/"):]: v
                for k, v in enc_qp.items() if k.startswith("calib/")
            }
            qp = {
                k: v for k, v in enc_qp.items()
                if not k.startswith("calib/")
            }
            if self.int8_root == "u8":
                # Byte-direct root: raw uint8 frames feed the int8
                # conv as (u ^ 0x80) — the normalize pass disappears
                # entirely (resnet_int8.py handles both uint8 frames
                # and already-normalized float crops exactly).
                norm = lambda im: im
            return (
                (lambda im: apply_int8_static(
                    qp, scales, norm(im), int8_root=self.int8_root,
                    int8_stream=self.int8_stream))
                if scales else (lambda im: apply_int8(qp, norm(im)))
            )
        enc_vars = variables
        cast = (
            (lambda im: im.astype(jnp.bfloat16))
            if self.bf16_encoder else (lambda im: im)
        )
        if self.bf16_encoder:
            enc_vars = tree_bf16(variables)
        return lambda im: self.model.apply(
            enc_vars, cast(norm(im))[None], train=False,
            method=lambda m, x, train: m.encode_images(x, train),
        )[0].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def _predict_fused(
        self, variables, enc_qp, frames, n: int, count: int,
        image_mode: bool,
    ):
        """ONE program: [resnet over chunks ->] pad -> windows -> stitch.

        Per-call dispatch through a remote/tunneled runtime costs far
        more than the math here; fusing the whole clip prediction into a
        single dispatch is worth ~20x wall clock on such links (and is
        free on local PCIe).
        """
        if image_mode:
            chunk = self.encode_chunk
            n_chunks = frames.shape[0] // chunk
            chunks = frames.reshape(
                (n_chunks, chunk) + frames.shape[1:]
            )
            encode = self._chunk_encoder(
                variables, enc_qp, frames.dtype == jnp.uint8
            )
            if 0 < n_chunks <= self.unroll_chunks:
                phi = jnp.concatenate(
                    [encode(chunks[i]) for i in range(n_chunks)]
                )[:n]
            else:
                phi = jax.lax.map(encode, chunks).reshape(
                    n_chunks * chunk, -1
                )[:n]
        else:
            phi = frames

        sched = WindowSchedule(
            num_frames=n,
            batch_size=self.batch_size,
            seq_length=self.seq_length,
            fov=self.model.fov,
        )
        # `count` may be bucketed above sched.count: extend the back
        # zero-fill accordingly (extra windows see zeros; trimmed below).
        extra = (count - sched.count) * self.batch_size * sched.good_frames
        phi_padded = jnp.pad(
            phi, [(sched.margin, sched.num_fill + extra), (0, 0)]
        )
        out = self._predict_windows(variables, phi_padded, count)
        return {
            k: v.reshape((-1,) + v.shape[3:])[:n] for k, v in out.items()
        }

    def predict_all_images(
        self,
        frames,
        phi=None,
        as_numpy: bool = True,
    ) -> Dict[str, np.ndarray]:
        """Predict a whole sequence with sliding windows.

        Args:
            frames: (N, 224, 224, 3) images (image mode) — either
                [-1, 1] floats, or RAW uint8 [0, 255] frames, which are
                normalized on device inside the fused program (4x less
                host->device + HBM input traffic; crop.py:52's
                convention) — or (N, 2048) phi when the model has no
                resnet; numpy or device arrays.
            phi: optionally precomputed (N, 2048) features.
            as_numpy: if True, fetch results to host numpy (the demo/pkl
                path). If False, return device arrays — callers that only
                need a slice (or feed a renderer on-device) avoid the
                device->host transfer of the big vertex tensors.

        Returns:
            dict of (N, ...) arrays (see module docstring for schema).
        """
        image_mode = False
        if phi is None:
            if hasattr(frames, "ndim") and frames.ndim == 2:
                phi = frames
            else:
                image_mode = getattr(self.model, "include_resnet", False)
                if not image_mode:
                    phi = self.encode_frames(frames)

        if image_mode:
            n = len(frames)
            chunk = self.encode_chunk
            n_chunks = int(np.ceil(n / chunk))
            # Bucket the chunk count ({2^k, 3*2^k}) so assorted video
            # lengths share compiled programs.
            n_chunks = _bucket(n_chunks)
            # uint8 frames stay uint8 (raw video bytes: 4x less
            # upload/HBM traffic; normalized on device in the fused
            # program). Anything else is treated as already-normalized
            # [-1, 1] float.
            dtype = (
                jnp.uint8
                if getattr(frames, "dtype", None) == np.uint8
                else jnp.float32
            )
            frames = jnp.asarray(frames, dtype)
            inputs = jnp.pad(
                frames, [(0, n_chunks * chunk - n)] + [(0, 0)] * 3
            )
        else:
            n = len(phi)
            inputs = jnp.asarray(phi, jnp.float32)

        sched = WindowSchedule(
            num_frames=n,
            batch_size=self.batch_size,
            seq_length=self.seq_length,
            fov=self.model.fov,
        )
        count = _bucket(sched.count)
        out = self._predict_fused(
            self._fused_vars, self._int8_qp, inputs, n, count, image_mode
        )
        if as_numpy:
            out = jax.device_get(out)
        return out
