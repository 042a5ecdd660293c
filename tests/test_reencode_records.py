"""Pre-decoded (raw_u8) records: datasets/reencode_records.py + the
loader's zero-decode raw-frame path (data/loader.py _finalize).

The raw frames are written from the SAME jpeg decode the loader would
perform, so a re-encoded shard must stream bit-identical examples."""

import os

import numpy as np

from human_dynamics_tpu.data.loader import ExampleStream
from human_dynamics_tpu.data.schema import parse_temporal_example
from human_dynamics_tpu.data.tfrecord import read_tfrecord
from human_dynamics_tpu.datasets.reencode_records import (
    reencode_dir,
    reencode_example,
)
from tests.test_image_mode_training import write_image_shard


def _stream(files, seed=3):
    return ExampleStream(files, t=8, seed=seed, decode_images=True)


def test_reencoded_records_load_identically(tmp_path):
    src, dst = tmp_path / "jpeg", tmp_path / "raw"
    os.makedirs(src)
    write_image_shard(
        str(src / "shard_000.tfrecord"), n_tubes=2, n_frames=24, crop=64
    )
    assert reencode_dir(str(src), str(dst)) == 2

    # The marker + raw sizes are in the records themselves.
    raw_serialized = next(read_tfrecord(str(dst / "shard_000.tfrecord")))
    ex = parse_temporal_example(raw_serialized)
    assert ex.image_format == b"raw_u8"
    assert all(len(d) == 64 * 64 * 3 for d in ex.image_datas)

    it_a = iter(_stream([str(src / "shard_000.tfrecord")]))
    it_b = iter(_stream([str(dst / "shard_000.tfrecord")]))
    for _ in range(4):
        a, b = next(it_a), next(it_b)
        assert set(a) == set(b)
        assert a["images"].dtype == b["images"].dtype == np.uint8
        for k in sorted(a):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )

    # Idempotent: an already-raw example passes through untouched, so
    # re-running the converter over its own output is a no-op.
    assert reencode_example(raw_serialized) is raw_serialized
    # Idempotent at the dir level too (existing outputs are skipped).
    assert reencode_dir(str(src), str(dst)) == 0


def test_reencode_passthrough_without_images(tmp_path):
    """phi-only records (no image/encoded) are byte-preserved."""
    from human_dynamics_tpu.data import (
        TFRecordWriter,
        convert_to_example_temporal,
    )

    n = 12
    rng = np.random.RandomState(5)
    labels = np.zeros((n, 3, 25), np.float32)
    labels[:, :2] = rng.uniform(20, 40, (n, 2, 25))
    labels[:, 2] = 1.0
    serialized = convert_to_example_temporal(
        image_datas=None,
        image_paths=[f"f{i}.png" for i in range(n)],
        image_shapes=np.full((n, 2), 224),
        labels=labels,
        centers=np.full((n, 2), 112),
        gt3ds=None,
        scale_factors=np.ones((n, 2), np.float32),
        start_pts=np.zeros((n, 2), np.int64),
        cams=None,
        phis=rng.randn(n, 32).astype(np.float32),
    )
    assert reencode_example(serialized) is serialized
