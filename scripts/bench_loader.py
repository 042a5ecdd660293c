"""Is image-mode training input-bound on this host? Measure it.

`scripts/bench_train.py` times the device step with pre-staged batches
(35.5-63.5 ms/step depending on freeze config). Image-mode training
must ALSO decode batch_size*T = 160 jpegs per step on the host
(`data/loader.py:_finalize` decodes after the shuffle buffer) and run
the on-device tube augmentation. This script measures the loader side
against those step times, with the prefetch overlap accounted:

1. direct ms/batch of `TrainDataPipeline._assemble_batch()` (worker-
   thread cost), decomposed into jpeg-decode vs augment+assemble;
2. consumer-visible wait ms/batch through the prefetch queue while the
   consumer simulates a device step of {0, 35.5, 51.8, 63.5} ms (host
   idle during the step, as with a real device-bound step) — the
   number that decides input-bound vs overlapped;
3. the phi-mode loader on the same host for contrast (ledger: 6.1
   ms/batch on a quiet box).

Images are smooth synthetic tubes (low-frequency fields, resized) so
jpeg size/decode cost is realistic — noise jpegs would be
pathologically large. Reference counterpart: 4-thread shuffle_batch
decode queues (/root/reference/src/data_loader_sequence.py:145-152).

Usage:
    python scripts/bench_loader.py [--src 256] [--batches 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RNG = np.random.RandomState(7)


def smooth_frame(src: int) -> np.ndarray:
    """Natural-image-ish frame: low-freq field upsampled + mild noise."""
    base = RNG.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    import cv2

    img = cv2.resize(base, (src, src), interpolation=cv2.INTER_CUBIC)
    noise = RNG.randint(-8, 8, img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def write_data(root: str, src: int, n_tubes: int, n_frames: int,
               with_phi: bool):
    import cv2

    from human_dynamics_tpu.data import (
        TFRecordWriter,
        convert_to_example_temporal,
    )
    from human_dynamics_tpu.data.tfrecord import encode_example

    jpeg_sizes = []
    for ds, with_3d in (("insta_variety", False), ("h36m", True)):
        d = os.path.join(root, ds, "train")
        os.makedirs(d, exist_ok=True)
        with TFRecordWriter(os.path.join(d, "shard_0.tfrecord")) as w:
            for _ in range(n_tubes):
                labels = np.zeros((n_frames, 3, 25), np.float32)
                labels[:, 0] = RNG.uniform(src * .3, src * .7,
                                           (n_frames, 25))
                labels[:, 1] = RNG.uniform(src * .3, src * .7,
                                           (n_frames, 25))
                labels[:, 2] = 1.0
                datas = []
                for _ in range(n_frames):
                    buf = cv2.imencode(".jpg", smooth_frame(src))[1]
                    jpeg_sizes.append(len(buf))
                    datas.append(buf.tobytes())
                w.write(convert_to_example_temporal(
                    image_datas=datas,
                    image_paths=[f"f{i}.png" for i in range(n_frames)],
                    image_shapes=np.full((n_frames, 2), src),
                    labels=labels,
                    centers=np.full((n_frames, 2), src // 2),
                    gt3ds=(RNG.randn(n_frames, 14, 3).astype(np.float32)
                           if with_3d else None),
                    scale_factors=np.ones((n_frames, 2), np.float32),
                    start_pts=np.zeros((n_frames, 2), np.int64),
                    cams=(np.ones((n_frames, 3), np.float32)
                          if with_3d else None),
                    poses=(RNG.randn(n_frames, 72).astype(np.float32) * .2
                           if with_3d else None),
                    shape=(RNG.randn(10).astype(np.float32) * .3
                           if with_3d else None),
                    phis=(RNG.randn(n_frames, 2048).astype(np.float32)
                          if with_phi else None),
                ))
    mocap = os.path.join(root, "mocap_neutrMosh")
    os.makedirs(mocap, exist_ok=True)
    with TFRecordWriter(os.path.join(mocap,
                                     "neutrSMPL_CMU_0.tfrecord")) as w:
        for _ in range(400):
            w.write(encode_example({
                "pose": RNG.randn(72).astype(np.float32) * .2,
                "shape": RNG.randn(10).astype(np.float32) * .3,
            }))
    return float(np.mean(jpeg_sizes)) if jpeg_sizes else 0.0


def make_pipeline(data_dir: str, precomputed_phi: bool, img_size: int):
    from human_dynamics_tpu.data.loader import TrainDataPipeline
    from human_dynamics_tpu.utils.config import Config

    config = Config(
        batch_size=8, T=20, num_kps=25, img_size=img_size,
        precomputed_phi=precomputed_phi, feature_dim=2048,
        data_dir=data_dir, datasets=("insta_variety", "h36m"),
        mocap_datasets=("CMU",), do_hallucinate=True,
    )
    return TrainDataPipeline(config)


def block(batch):
    import jax

    jax.block_until_ready(batch.phis)


def bench_direct(pipeline, n: int):
    """Worker-side ms/batch + decode share (instrumented _finalize)."""
    import human_dynamics_tpu.data.loader as loader_mod

    decode_ms = [0.0]
    orig = loader_mod.ExampleStream._finalize

    def timed_finalize(self, out):
        t0 = time.perf_counter()
        r = orig(self, out)
        decode_ms[0] += (time.perf_counter() - t0) * 1e3
        return r

    loader_mod.ExampleStream._finalize = timed_finalize
    try:
        block(pipeline._assemble_batch())  # warm compiles/buffers
        decode_ms[0] = 0.0
        t0 = time.perf_counter()
        for _ in range(n):
            block(pipeline._assemble_batch())
        total_ms = (time.perf_counter() - t0) * 1e3
    finally:
        loader_mod.ExampleStream._finalize = orig
    return total_ms / n, decode_ms[0] / n


def bench_overlapped(pipeline, n: int, step_ms: float):
    """Consumer-visible wait per batch with the prefetch thread while
    the consumer 'runs a step' of step_ms (host idle, like a
    dispatched device step)."""
    it = iter(pipeline)
    block(next(it))  # warm-up + thread start
    waits = []
    for _ in range(n):
        time.sleep(step_ms / 1e3)
        t0 = time.perf_counter()
        block(next(it))
        waits.append((time.perf_counter() - t0) * 1e3)
    getattr(pipeline, "close", lambda: None)()
    return float(np.median(waits))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", type=int, default=256,
                    help="stored crop size in the records (reference "
                         "tubes store ~300px crops; 256 is "
                         "conservative)")
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--raw", action="store_true",
                    help="also bench pre-decoded raw_u8 records "
                         "(datasets/reencode_records.py)")
    ap.add_argument("--out", default="/tmp/bench_loader_data")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}")
    os.makedirs(args.out, exist_ok=True)
    marker = os.path.join(args.out, f"done_{args.src}")
    if not os.path.exists(marker):
        mean_jpeg = write_data(args.out, args.src, n_tubes=8,
                               n_frames=40, with_phi=True)
        with open(marker, "w") as f:
            f.write(str(mean_jpeg))
    mean_jpeg = float(open(marker).read())
    print(f"mean jpeg size: {mean_jpeg/1024:.1f} KiB @ {args.src}px")

    results = {"src": args.src, "img_size": args.img_size,
               "mean_jpeg_kib": round(mean_jpeg / 1024, 1)}

    roots = {"": args.out}
    if args.raw:
        # Pre-decoded uint8 records (datasets/reencode_records.py):
        # same tubes, zero decode in _finalize — measures what the
        # storage-for-host-CPU trade buys on this box.
        from human_dynamics_tpu.datasets.reencode_records import (
            reencode_dir,
        )

        raw_root = args.out + "_raw"
        for ds in ("insta_variety", "h36m"):
            reencode_dir(os.path.join(args.out, ds, "train"),
                         os.path.join(raw_root, ds, "train"))
        mocap_link = os.path.join(raw_root, "mocap_neutrMosh")
        if not os.path.exists(mocap_link):
            os.symlink(os.path.join(args.out, "mocap_neutrMosh"),
                       mocap_link)
        roots["raw_"] = raw_root

    for prefix, root in roots.items():
        pipeline = make_pipeline(root, False, args.img_size)
        direct_ms, decode_ms = bench_direct(pipeline, args.batches)
        results[f"{prefix}image_direct_ms_per_batch"] = round(direct_ms, 1)
        results[f"{prefix}image_decode_ms_per_batch"] = round(decode_ms, 1)
        print(f"{prefix or 'jpg_'}image direct: {direct_ms:.1f} ms/batch "
              f"({decode_ms:.1f} ms in 160 frame reads)")

        for step_ms in (0.0, 35.5, 51.8, 63.5):
            pipeline = make_pipeline(root, False, args.img_size)
            wait = bench_overlapped(pipeline, args.batches, step_ms)
            results[f"{prefix}image_wait_ms_at_step_{step_ms:g}"] = round(
                wait, 1)
            print(f"{prefix or 'jpg_'}image overlapped @ step "
                  f"{step_ms:5.1f} ms: median wait {wait:.1f} ms/batch "
                  f"-> e2e ~{step_ms + wait:.1f} ms/step")

    pipeline = make_pipeline(args.out, True, args.img_size)
    phi_ms, _ = bench_direct(pipeline, args.batches)
    results["phi_direct_ms_per_batch"] = round(phi_ms, 1)
    pipeline = make_pipeline(args.out, True, args.img_size)
    phi_wait = bench_overlapped(pipeline, args.batches, 8.4)
    results["phi_wait_ms_at_step_8.4"] = round(phi_wait, 1)
    print(f"phi direct: {phi_ms:.1f} ms/batch; overlapped @ 8.4 ms "
          f"step: wait {phi_wait:.1f} ms")

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
