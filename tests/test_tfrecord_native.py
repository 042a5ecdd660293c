"""Native C++ record parser vs the pure-Python codec."""

import numpy as np
import pytest

from human_dynamics_tpu.data import TFRecordWriter, encode_example
from human_dynamics_tpu.data.tfrecord import read_tfrecord
from human_dynamics_tpu.data.tfrecord_native import (
    NativeExample,
    load_library,
    read_tfrecord_native,
)

RNG = np.random.RandomState(51)


def test_native_library_builds():
    assert load_library() is not None


def test_native_framing_matches_python(tmp_path):
    path = str(tmp_path / "r.tfrecord")
    records = [RNG.bytes(n) for n in (1, 500, 20_000)]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(read_tfrecord_native(path))
    want = list(read_tfrecord(path, check_crc=True))
    assert got == want == records


def test_native_example_extraction():
    floats = RNG.randn(2048).astype(np.float32)
    ints = np.array([3, -7, 2**40, 0], np.int64)
    serialized = encode_example({
        "image/phis": floats,
        "meta/N": ints,
        "names": [b"a", b"bb"],
    })
    ex = NativeExample(serialized)
    np.testing.assert_array_equal(ex.floats("image/phis"), floats)
    np.testing.assert_array_equal(
        ex.ints("meta/N") & np.uint64(2**64 - 1).astype(np.int64),
        ints.view(np.int64),
    )
    assert ex.count("image/phis") == 2048
    assert ex.count("names") == 2
    assert ex.floats("missing") is None
    assert ex.ints("image/phis") is None  # wrong kind


def test_native_parses_tf_serialization():
    tf = pytest.importorskip("tensorflow")
    floats = RNG.randn(100).astype(np.float32)
    ex_tf = tf.train.Example(features=tf.train.Features(feature={
        "phi": tf.train.Feature(
            float_list=tf.train.FloatList(value=floats.tolist())
        ),
        "n": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[42])
        ),
    }))
    ex = NativeExample(ex_tf.SerializeToString())
    np.testing.assert_allclose(ex.floats("phi"), floats, rtol=1e-7)
    np.testing.assert_array_equal(ex.ints("n"), [42])


def test_truncated_example_never_overreads():
    """Every possible truncation of a serialized Example either fails
    cleanly (None) or returns a correct prefix — the native parser
    bounds-checks all declared lengths against the actual buffer."""
    from human_dynamics_tpu.data.tfrecord import encode_example
    from human_dynamics_tpu.data.tfrecord_native import NativeExample

    ser = encode_example({
        "image/phis": np.arange(40, dtype=np.float32),
        "meta/N": np.array([4], np.int64),
    })
    full = NativeExample(ser)
    assert full.count("image/phis") == 40
    for cut in range(1, len(ser)):
        t = NativeExample(ser[:cut])
        f = t.floats("image/phis")
        if f is not None:
            assert np.allclose(f, np.arange(len(f))), cut
        r = t.floats_range("image/phis", 10, 20)
        if r is not None:
            assert np.allclose(r, np.arange(10, 10 + len(r))), cut
        ints = t.ints("meta/N")
        if ints is not None and len(ints):
            assert ints[0] == 4, cut
