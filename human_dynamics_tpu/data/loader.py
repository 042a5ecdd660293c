"""Training input pipeline: tfrecord shards -> balanced device batches.

Replaces the reference's TF queue-runner pipeline
(/root/reference/src/data_loader_sequence.py) with a plain-python reader
(our no-TF tfrecord codec) plus a background prefetch thread that
double-buffers host->device transfers:

- 2D/3D split balancing: each batch is half in-the-wild 2D data, half 3D
  (h36m) data, shuffled (the reference enqueues [2d, 3d] pairs,
  data_loader_sequence.py:72-143).
- Random contiguous T-window per tube (pick_sequences,
  data_utils.py:340-358), short tubes edge-padded like process_tensors'
  zero-fill then clamped (data_utils.py:478-509 semantics).
- Mocap real-pose stream sized exactly to the discriminator's fake pool
  (data_loader_sequence.py:185-202 == train.trainer.fake_pool_size).
- Per-host sharding hook for multi-host training: pass
  (host_id, num_hosts) and each host reads a disjoint shard subset.
"""

from __future__ import annotations

import glob
import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from human_dynamics_tpu.data.schema import parse_temporal_example
from human_dynamics_tpu.data.tfrecord import decode_example
# Native C++ framing (falls back to the pure-Python reader internally).
from human_dynamics_tpu.data.tfrecord_native import (
    read_tfrecord_native as read_tfrecord,
)

THREED_DATASETS = ("h36m",)  # data_loader_sequence.py:20


def get_all_files(
    dataset_dir: str,
    datasets: Sequence[str],
    split: str = "train",
) -> List[str]:
    """Shard discovery ({data_dir}/{dataset}/{split}/*.tfrecord), with the
    reference's h36m->human36m alias (data_utils.py:381-399)."""
    datasets = list(datasets)
    if "h36m" in datasets:
        datasets.append("human36m")
    files: List[str] = []
    for dataset in datasets:
        files += sorted(
            glob.glob(os.path.join(dataset_dir, dataset, split,
                                   "*.tfrecord"))
        )
    return files


def _item_nbytes(item) -> int:
    """Approximate host-RAM footprint of one buffered example."""
    if not isinstance(item, dict):
        return 64
    total = 0
    for v in item.values():
        if isinstance(v, np.ndarray):
            total += v.nbytes
        elif isinstance(v, (list, tuple)):
            total += sum(
                len(b) if isinstance(b, (bytes, bytearray))
                else getattr(b, "nbytes", 64)
                for b in v
            )
        elif isinstance(v, (bytes, bytearray)):
            total += len(v)
        else:
            total += 64
    return total


def shuffle_buffered(
    iterator: Iterator,
    rng: np.random.RandomState,
    capacity: int = 300,
    max_bytes: Optional[int] = None,
) -> Iterator:
    """Buffered shuffle: yields items in randomized order from a rolling
    buffer of `capacity` items, decorrelating consecutive tubes that
    come from the same shard (shuffle_batch with capacity ~300,
    data_loader_sequence.py:145-152).

    ``max_bytes`` additionally bounds the buffer's host-RAM footprint
    (used by image mode, where items carry jpeg byte strings): when a
    new item would push the total over budget, random items are yielded
    first until it fits, so RSS stays bounded regardless of tube size.
    """
    if capacity <= 1:
        yield from iterator
        return
    buf: List = []
    sizes: List[int] = []
    total = 0
    for item in iterator:
        sz = _item_nbytes(item) if max_bytes is not None else 0
        while buf and (
            len(buf) >= capacity
            or (max_bytes is not None and total + sz > max_bytes)
        ):
            idx = rng.randint(len(buf))
            out = buf[idx]
            buf[idx] = buf[-1]
            sizes[idx] = sizes[-1]
            buf.pop()
            total -= sizes.pop()
            yield out
        buf.append(item)
        sizes.append(sz)
        total += sz
    order = rng.permutation(len(buf))
    for idx in order:
        yield buf[idx]


def pick_window(n: int, t: int, rng: np.random.RandomState) -> slice:
    """Random contiguous T window (pick_sequences)."""
    if n <= t:
        return slice(0, n)
    start = rng.randint(0, n - t + 1)
    return slice(start, start + t)


def _pad_to_t(arr: np.ndarray, t: int) -> np.ndarray:
    """Zero-pad short sequences to T frames (process_tensors default-fill
    semantics, data_utils.py:478-509)."""
    if len(arr) >= t:
        return arr[:t]
    pad = np.zeros((t - len(arr),) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


class ExampleStream:
    """Infinite shuffled stream of per-tube training examples."""

    def __init__(
        self,
        files: List[str],
        t: int,
        num_kps: int = 25,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        decode_images: bool = False,
        shuffle_buffer: int = 300,
        shuffle_bytes: Optional[int] = None,
    ):
        if not files:
            raise FileNotFoundError("No tfrecord shards found")
        self.files = files[host_id::num_hosts]
        self.t = t
        self.num_kps = num_kps
        self.decode_images = decode_images
        self.shuffle_buffer = shuffle_buffer
        # Host-RAM cap for the shuffle buffer (image mode: items hold
        # compressed jpegs; None = count-only bound).
        self.shuffle_bytes = shuffle_bytes
        self.rng = np.random.RandomState(seed + host_id)

    def _raw_stream(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            order = self.rng.permutation(len(self.files))
            for fi in order:
                for serialized in read_tfrecord(self.files[fi]):
                    if not self.decode_images:
                        fast = self._fast_example(serialized)
                        if fast is not None:
                            yield fast
                            continue
                    ex = parse_temporal_example(serialized)
                    window = pick_window(ex.n, self.t, self.rng)
                    yield self._make_example(ex, window)

    def _fast_example(self, serialized) -> Optional[Dict[str, np.ndarray]]:
        """Windowed native parse: extract ONLY the sampled T-frame slice
        of each per-frame field via ranged C++ FloatList reads. A T=20
        window of a 120-frame tube touches ~1/6 of the ~1 MB phi
        payload; ~5x faster than the full-proto Python parse. Returns
        None (caller falls back to the slow path) when the native lib or
        an expected field is unavailable. Identical output (and rng
        draw order) to parse_temporal_example + _make_example."""
        from human_dynamics_tpu.data.tfrecord_native import (
            NativeExample,
            load_library,
        )

        if load_library() is None:
            return None
        ne = NativeExample(serialized)
        meta_n = ne.ints("meta/N")
        n_phi = ne.count("image/phis")
        if meta_n is None or n_phi is None or n_phi <= 0:
            return None
        n = int(meta_n[0])
        # The ranged reads below assume the standard per-frame strides
        # (14 kps, 24*3 pose, 14*3 gt3ds). Records with other joint
        # counts (the slow path handles them via reshape(n,-1,3)[:,:14])
        # must fall back BEFORE the rng draw so draw order is preserved.
        if (ne.count("image/xys") != n * 28
                or ne.count("mosh/poses") != n * 72
                or ne.count("mosh/gt3ds") != n * 42):
            return None
        # Optional face/toe keypoints: absent is fine, but a present
        # list with a nonstandard per-frame stride must also fall back
        # (otherwise the reshape below raises in the prefetch worker).
        n_face = ne.count("image/face_pts")
        n_toe = ne.count("image/toe_pts")
        if (n_face > 0 and n_face != n * 15) or (
                n_toe > 0 and n_toe != n * 18):
            return None
        window = pick_window(n, self.t, self.rng)
        s, e = window.start, window.stop
        w = e - s
        t = self.t

        xys = ne.floats_range("image/xys", s * 28, w * 28)
        vis_all = ne.ints("image/visibilities")
        poses = ne.floats_range("mosh/poses", s * 72, w * 72)
        gt3ds = ne.floats_range("mosh/gt3ds", s * 42, w * 42)
        shape = ne.floats("mosh/shape")
        has_3d = ne.ints("meta/has_3d")
        has_3d_joints = ne.ints("meta/has_3d_joints")
        if any(v is None for v in (xys, vis_all, poses, gt3ds, shape,
                                   has_3d, has_3d_joints)):
            return None

        parts = [np.concatenate([
            xys.reshape(w, 2, 14),
            vis_all[s * 14:e * 14].astype(np.float32).reshape(w, 1, 14),
        ], axis=1)]
        face = ne.floats_range("image/face_pts", s * 15, w * 15)
        if face is not None:
            parts.append(face.reshape(w, 3, 5))
            toe = ne.floats_range("image/toe_pts", s * 18, w * 18)
            if toe is not None:
                parts.append(toe.reshape(w, 3, 6))
        kps = np.transpose(np.concatenate(parts, axis=2), (0, 2, 1))

        d = n_phi // n
        phis = ne.floats_range("image/phis", s * d, w * d)
        if phis is None or len(phis) != w * d:
            return None

        return {
            "kps": _pad_to_t(kps, t)[:, :self.num_kps].astype(np.float32),
            "poses": _pad_to_t(poses.reshape(w, 24, 3), t),
            "shape": shape.astype(np.float32),
            "gt3ds": _pad_to_t(gt3ds.reshape(w, 14, 3), t),
            "has_3d_joints": np.float32(int(has_3d_joints[0])),
            "has_3d_smpl": np.float32(int(has_3d[0])),
            "phis": _pad_to_t(phis.reshape(w, d), t),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # Within-shard shuffle (shuffle_batch parity): without it,
        # consecutive batches stream tubes in file order per shard.
        # Image-mode items pass through COMPRESSED (_jpegs) and are
        # decoded on the way out, so capacity matches the reference's
        # ~300 tubes within a bounded RSS.
        shuffled = shuffle_buffered(
            self._raw_stream(), self.rng, self.shuffle_buffer,
            max_bytes=self.shuffle_bytes,
        )
        return (self._finalize(d) for d in shuffled)

    def _make_example(self, ex, window) -> Dict[str, np.ndarray]:
        t = self.t
        kps = _pad_to_t(ex.kps[window], t)[:, :self.num_kps]
        out = {
            "kps": kps.astype(np.float32),
            "poses": _pad_to_t(ex.poses[window], t).astype(np.float32),
            "shape": ex.shape.astype(np.float32),
            "gt3ds": _pad_to_t(ex.gt3ds[window], t).astype(np.float32),
            "has_3d_joints": np.float32(ex.has_3d_joints),
            "has_3d_smpl": np.float32(ex.has_3d),
        }
        if ex.phis is not None:
            out["phis"] = _pad_to_t(ex.phis[window], t).astype(np.float32)
        if self.decode_images and ex.image_datas is not None:
            # Image-mode training (precomputed_phi=False): carry the
            # sampled window's jpegs COMPRESSED through the shuffle
            # buffer (so capacity can match the reference's ~300 tubes
            # at ~1-2 MB/item instead of ~20 MB decoded) and decode at
            # pop time in _finalize. Labels stay in crop pixel coords
            # (3, K) for the on-device tube augmentation (read_data,
            # data_loader_sequence.py:298-308).
            # Pre-decoded records (image_format=raw_u8, written by
            # datasets/reencode_records.py) skip the decode entirely —
            # the remaining host cost on a decode-bound box.
            out["_jpegs"] = [bytes(d) for d in ex.image_datas[window]]
            if ex.image_format == b"raw_u8":
                out["_raw_hw"] = ex.image_shapes[window]
            out["labels_raw"] = _pad_to_t(
                np.transpose(ex.kps[window], (0, 2, 1)), t
            )[:, :, :self.num_kps].astype(np.float32)
            out["centers"] = _pad_to_t(
                ex.centers[window].astype(np.float32), t
            )
        return out

    def _finalize(self, out: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Decode deferred jpegs after the shuffle buffer.

        Frames stay uint8: normalization happens on device inside the
        batched tube augmentation (TrainDataPipeline._augment_batch), so
        the host->device transfer moves 1 byte/pixel instead of 4."""
        jpegs = out.pop("_jpegs", None)
        raw_hw = out.pop("_raw_hw", None)
        if jpegs is not None:
            if raw_hw is not None:
                imgs = np.stack([
                    np.frombuffer(d, np.uint8).reshape(int(h), int(w), 3)
                    for d, (h, w) in zip(jpegs, raw_hw)
                ])
            else:
                import cv2

                imgs = np.stack([
                    cv2.cvtColor(
                        cv2.imdecode(
                            np.frombuffer(d, np.uint8), cv2.IMREAD_COLOR
                        ),
                        cv2.COLOR_BGR2RGB,
                    )
                    for d in jpegs
                ])
            out["images"] = _pad_to_t(imgs, self.t)
        return out


class MocapStream:
    """Real (pose, shape) pairs for the adversarial prior
    (read_smpl_data + get_smpl_loader)."""

    def __init__(self, files: List[str], seed: int = 0):
        if not files:
            raise FileNotFoundError("No mocap tfrecord shards found")
        self.files = files
        self.rng = np.random.RandomState(seed)
        self._cache: Optional[Tuple[np.ndarray, np.ndarray]] = None

    @staticmethod
    def mocap_files(dataset_dir: str, mocap_datasets: Sequence[str]):
        """{data_dir}/mocap_neutrMosh/neutrSMPL_{ds}_*.tfrecord
        (data_loader_sequence.py:167-174)."""
        files: List[str] = []
        for ds in mocap_datasets:
            files += sorted(glob.glob(os.path.join(
                dataset_dir, "mocap_neutrMosh",
                f"neutrSMPL_{ds}_*.tfrecord",
            )))
        return files

    def _load_all(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decode every (pose, shape) record ONCE into memory (cached
        across iterators).

        The reference also holds the whole mocap set in RAM
        (read_smpl_data, data_utils.py:416-455) — (72+10) float32s =
        ~330 KB per 1k pairs. Decoding lazily per draw was the training
        input bottleneck (the fake pool needs B*T*heads real poses per
        step)."""
        if self._cache is not None:
            return self._cache
        poses, shapes = [], []
        for path in self.files:
            for serialized in read_tfrecord(path):
                feats = decode_example(serialized)
                poses.append(
                    np.asarray(feats["pose"], np.float32).reshape(72)
                )
                shapes.append(
                    np.asarray(feats["shape"], np.float32).reshape(10)
                )
        self._cache = (np.stack(poses), np.stack(shapes))
        return self._cache

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        poses, shapes = self._load_all()
        n = len(poses)
        while True:
            for i in self.rng.permutation(n):
                yield poses[i], shapes[i]


class MocapTemporalStream:
    """Real delta-pose windows for temporal priors
    (get_smpl_loader_temporal, data_loader_sequence.py:221-264; records
    written by datasets.mocap.write_mocap_temporal_records)."""

    def __init__(self, files: List[str], seed: int = 0):
        if not files:
            raise FileNotFoundError("No temporal mocap shards found")
        self.files = files
        self.rng = np.random.RandomState(seed)

    @staticmethod
    def mocap_files(dataset_dir: str, mocap_datasets: Sequence[str]):
        import glob as _glob

        files: List[str] = []
        for ds in mocap_datasets:
            files += sorted(_glob.glob(os.path.join(
                dataset_dir, "mocap_neutrMosh_temporal_pose",
                f"neutrSMPL_{ds}_*.tfrecord",
            )))
        return files

    def __iter__(self):
        """Yields (poses (T, 72), delta_poses (T-1, 72))."""
        while True:
            order = self.rng.permutation(len(self.files))
            for fi in order:
                for serialized in read_tfrecord(self.files[fi]):
                    feats = decode_example(serialized)
                    t = int(np.asarray(feats["T"])[0])
                    pose = np.asarray(
                        feats["pose"], np.float32
                    ).reshape(t, 72)
                    deltas = np.asarray(
                        feats["delta_pose"], np.float32
                    ).reshape(t - 1, 72)
                    yield pose, deltas


class TrainDataPipeline:
    """Assembles split-balanced batches + mocap pool; prefetches in a
    background thread."""

    def __init__(
        self,
        config,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
    ):
        from human_dynamics_tpu.train.trainer import fake_pool_size

        self.config = config
        self.pool_size = fake_pool_size(config)

        if config.split_balanced:
            datasets_2d = [d for d in config.datasets
                           if d not in THREED_DATASETS]
            datasets_3d = [d for d in config.datasets
                           if d in THREED_DATASETS]
        else:
            datasets_2d = list(config.datasets)
            datasets_3d = datasets_2d[::-1]

        files_2d = get_all_files(config.data_dir, datasets_2d)
        files_3d = get_all_files(config.data_dir, datasets_3d)

        def split_list(lst):
            mid = len(lst) // 2
            return lst[:mid], lst[mid:]

        if not files_2d:
            files_2d, files_3d = split_list(files_3d)
        elif not files_3d:
            files_2d, files_3d = split_list(files_2d)

        decode_images = not config.precomputed_phi
        # Shuffle-buffer parity with shuffle_batch's ~300 capacity in
        # BOTH modes (data_loader_sequence.py:145-152). Image tubes ride
        # the buffer jpeg-compressed (~1-2 MB vs ~20 MB decoded); the
        # byte cap bounds host RSS per stream even for fat tubes.
        shuffle_bytes = (1 << 30) if decode_images else None
        self.stream_2d = iter(ExampleStream(
            files_2d, config.T, config.num_kps, config.seed,
            host_id, num_hosts, decode_images=decode_images,
            shuffle_buffer=300, shuffle_bytes=shuffle_bytes,
        ))
        self.stream_3d = iter(ExampleStream(
            files_3d, config.T, config.num_kps, config.seed + 1,
            host_id, num_hosts, decode_images=decode_images,
            shuffle_buffer=300, shuffle_bytes=shuffle_bytes,
        ))
        self._aug_rng_counter = 0
        self._augment_batch_fn = None
        self.mocap = iter(MocapStream(
            MocapStream.mocap_files(config.data_dir,
                                    config.mocap_datasets),
            seed=config.seed,
        ))
        self.rng = np.random.RandomState(config.seed + 2)
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None
        self._stopping = False

    def _assemble_batch(self):
        from human_dynamics_tpu.train.trainer import Batch

        b = self.config.batch_size
        n2 = b // 2
        examples = [next(self.stream_2d) for _ in range(n2)]
        examples += [next(self.stream_3d) for _ in range(b - n2)]
        self.rng.shuffle(examples)

        def stack(key):
            return np.stack([e[key] for e in examples])

        poses_real = np.stack(
            [next(self.mocap)[0] for _ in range(self.pool_size)]
        )

        if not self.config.precomputed_phi:
            return self._assemble_image_batch(examples, poses_real)

        return Batch(
            phis=stack("phis"),
            kps=stack("kps"),
            poses_gt=stack("poses").reshape(b, self.config.T, 24, 3),
            shapes_gt=stack("shape"),
            joints_gt=stack("gt3ds"),
            has_3d_joints=stack("has_3d_joints"),
            has_3d_smpl=stack("has_3d_smpl"),
            poses_real=poses_real.reshape(self.pool_size, 24, 3),
        )

    def _make_batched_augment(self):
        """One jitted program for the whole batch's tube augmentation:
        PRNG-key derivation, per-tube random walks, and the fused
        affine warp all run on device in a single dispatch, on uint8
        frames normalized in-program.

        The per-example version dispatched 2 programs per tube and
        uploaded float32 frames; batching cuts the host->device bytes
        4x and the dispatch count from ~2B to 1 per batch — the
        difference between the loader being augmentation-bound and
        decode-bound (scripts/bench_loader.py numbers in
        docs/perf_image_training.md)."""
        import jax
        import jax.numpy as jnp

        from human_dynamics_tpu.data.augment import (
            augment_tube,
            sample_tube_params,
        )

        c = self.config
        t = c.T

        def one(seed, im, lab, cen, po, g3):
            params = sample_tube_params(
                jax.random.PRNGKey(seed),
                t,
                trans_max=c.trans_max,
                delta_trans_max=c.delta_trans_max,
                scale_max=c.scale_max,
                delta_scale_max=c.delta_scale_max,
                rotate_max=c.rotate_max,
                delta_rotate_max=c.delta_rotate_max,
            )
            crops, labels, poses, gt3ds = augment_tube(
                im.astype(jnp.float32) / 255.0,
                lab, cen, po, g3, params,
                output_size=c.img_size,
                apply_rotation=c.rotate_max != 0,
            )
            return crops, jnp.transpose(labels, (0, 2, 1)), poses, gt3ds

        return jax.jit(jax.vmap(one))

    def _assemble_image_batch(self, examples, poses_real):
        """Image-mode batch: on-device tube augmentation, batched into
        one dispatch (read_data's TubePreprocessor call,
        data_loader_sequence.py:298-308)."""
        import jax.numpy as jnp

        from human_dynamics_tpu.train.trainer import Batch

        c = self.config
        b, t = c.batch_size, c.T
        if self._augment_batch_fn is None:
            self._augment_batch_fn = self._make_batched_augment()

        # Same per-example key schedule as the historical per-tube path:
        # PRNGKey(seed*100003 + running counter).
        seeds = np.asarray(
            [
                c.seed * 100003 + self._aug_rng_counter + 1 + i
                for i in range(b)
            ],
            np.uint32,
        )
        self._aug_rng_counter += b

        crops, kps, poses_a, gt3ds_a = self._augment_batch_fn(
            jnp.asarray(seeds),
            jnp.asarray(np.stack([e["images"] for e in examples])),
            jnp.asarray(np.stack([e["labels_raw"] for e in examples])),
            jnp.asarray(np.stack([e["centers"] for e in examples])),
            jnp.asarray(np.stack(
                [e["poses"].reshape(t, 72) for e in examples]
            )),
            jnp.asarray(np.stack([e["gt3ds"] for e in examples])),
        )

        return Batch(
            phis=crops,                      # (B, T, S, S, 3) images
            kps=kps,
            poses_gt=poses_a.reshape(b, t, 24, 3),
            shapes_gt=jnp.asarray(
                np.stack([e["shape"] for e in examples])
            ),
            joints_gt=gt3ds_a,
            has_3d_joints=jnp.asarray(
                np.stack([e["has_3d_joints"] for e in examples])
            ),
            has_3d_smpl=jnp.asarray(
                np.stack([e["has_3d_smpl"] for e in examples])
            ),
            poses_real=jnp.asarray(
                poses_real.reshape(self.pool_size, 24, 3)
            ),
        )

    def _worker(self):
        # Exceptions are forwarded to the consumer instead of dying
        # silently (which would leave __iter__ blocked forever).
        try:
            while not self._stopping:
                self._queue.put(self._assemble_batch())
        except BaseException as exc:  # noqa: BLE001 - forwarded
            if not self._stopping:
                self._queue.put(_WorkerError(exc))

    def __iter__(self):
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._worker, daemon=True
            )
            self._thread.start()
        while True:
            item = self._queue.get()
            if isinstance(item, _WorkerError):
                raise RuntimeError(
                    "training data prefetch worker failed"
                ) from item.exc
            yield item

    def close(self):
        """Stop the prefetch thread cleanly (it otherwise dies as a
        daemon at interpreter exit, possibly mid-dispatch). Idempotent;
        safe to call whether or not iteration started."""
        self._stopping = True
        if self._thread is None:
            return
        # Unblock a put-blocked worker, then let it observe _stopping.
        while self._thread.is_alive():
            try:
                self._queue.get_nowait()
            except queue_mod.Empty:
                pass
            self._thread.join(timeout=0.2)
        self._thread = None


class _WorkerError:
    """Sentinel carrying an exception across the prefetch queue."""

    def __init__(self, exc: BaseException):
        self.exc = exc
