"""TFRecord/Example codec tests, cross-validated against TensorFlow's own
serialization (TF is available in this image as a test oracle only — the
runtime data path never imports it). SURVEY.md §4 implication (2)."""

import numpy as np
import pytest

from human_dynamics_tpu.data import (
    TFRecordWriter,
    read_tfrecord,
    encode_example,
    decode_example,
    convert_to_example_temporal,
    parse_temporal_example,
)

RNG = np.random.RandomState(5)

tf = pytest.importorskip("tensorflow")


def make_features():
    return {
        "floats": RNG.randn(17).astype(np.float32),
        "ints": np.array([1, -5, 2**40, 0, -(2**40)], np.int64),
        "bytes": [b"hello", b"\x00\xffbinary", "unicodeé".encode()],
        "scalar_int": np.array([42], np.int64),
        "empty_float": np.zeros(0, np.float32),
    }


def test_example_roundtrip_self():
    feats = make_features()
    data = encode_example(feats)
    back = decode_example(data)
    assert set(back) == set(feats)
    np.testing.assert_allclose(back["floats"], feats["floats"], rtol=1e-7)
    np.testing.assert_array_equal(back["ints"], feats["ints"])
    assert back["bytes"] == feats["bytes"]
    np.testing.assert_array_equal(back["scalar_int"], [42])


def test_example_tf_parses_ours():
    """TF must parse our serialization identically."""
    feats = make_features()
    data = encode_example(feats)
    ex = tf.train.Example()
    ex.ParseFromString(data)
    f = ex.features.feature
    np.testing.assert_allclose(
        np.array(f["floats"].float_list.value), feats["floats"], rtol=1e-7
    )
    np.testing.assert_array_equal(
        np.array(f["ints"].int64_list.value), feats["ints"]
    )
    assert list(f["bytes"].bytes_list.value) == feats["bytes"]


def test_example_we_parse_tf():
    """Our decoder must parse TF's serialization identically."""
    feats = make_features()
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "floats": tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=feats["floats"].tolist()
                    )
                ),
                "ints": tf.train.Feature(
                    int64_list=tf.train.Int64List(
                        value=feats["ints"].tolist()
                    )
                ),
                "bytes": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=feats["bytes"])
                ),
            }
        )
    )
    back = decode_example(ex.SerializeToString())
    np.testing.assert_allclose(back["floats"], feats["floats"], rtol=1e-7)
    np.testing.assert_array_equal(back["ints"], feats["ints"])
    assert back["bytes"] == feats["bytes"]


def test_tfrecord_file_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    records = [RNG.bytes(n) for n in (1, 100, 10_000)]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(read_tfrecord(path, check_crc=True))
    assert got == records


def test_tfrecord_tf_reads_ours(tmp_path):
    path = str(tmp_path / "ours.tfrecord")
    records = [b"alpha", RNG.bytes(5000)]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(path)]
    assert got == records


def test_tfrecord_we_read_tf(tmp_path):
    path = str(tmp_path / "theirs.tfrecord")
    records = [b"beta", RNG.bytes(3000)]
    with tf.io.TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(read_tfrecord(path, check_crc=True))
    assert got == records


# ---------------------------------------------------------------------------
# Temporal schema round trip
# ---------------------------------------------------------------------------

def make_temporal_args(n=6, k=25, with_3d=True):
    labels = RNG.rand(n, 3, k).astype(np.float32)
    labels[:, 2] = (labels[:, 2] > 0.3).astype(np.float32)
    args = dict(
        image_datas=[RNG.bytes(50) for _ in range(n)],
        image_paths=[f"frame{i:04d}.png" for i in range(n)],
        image_shapes=np.full((n, 2), 224, np.int64),
        labels=labels,
        centers=RNG.randint(0, 224, (n, 2)),
        gt3ds=RNG.randn(n, 14, 3).astype(np.float32) if with_3d else None,
        scale_factors=RNG.rand(n, 2).astype(np.float32),
        start_pts=RNG.randint(0, 50, (n, 2)),
        cams=RNG.rand(n, 3).astype(np.float32) if with_3d else None,
        poses=RNG.randn(n, 72).astype(np.float32) if with_3d else None,
        shape=RNG.randn(10).astype(np.float32) if with_3d else None,
        phis=RNG.randn(n, 2048).astype(np.float32),
        time_pts=np.array([0, n], np.int64),
    )
    return args


@pytest.mark.parametrize("with_3d", [True, False])
def test_temporal_schema_roundtrip(with_3d):
    args = make_temporal_args(with_3d=with_3d)
    serialized = convert_to_example_temporal(**args)
    ex = parse_temporal_example(serialized)

    assert ex.n == 6
    # kps reassembled to (N, 25, 3) from the 14+5+6 split.
    want_kps = np.transpose(args["labels"], (0, 2, 1))
    np.testing.assert_allclose(ex.kps, want_kps, rtol=1e-6)
    if with_3d:
        assert ex.has_3d == 1 and ex.has_3d_joints == 1
        np.testing.assert_allclose(
            ex.poses, args["poses"].reshape(6, 24, 3), rtol=1e-6
        )
        np.testing.assert_allclose(ex.shape, args["shape"], rtol=1e-6)
        np.testing.assert_allclose(ex.gt3ds, args["gt3ds"], rtol=1e-6)
    else:
        assert ex.has_3d == 0 and ex.has_3d_joints == 0
        np.testing.assert_array_equal(ex.poses, -np.ones((6, 24, 3)))
    np.testing.assert_allclose(ex.phis, args["phis"], rtol=1e-6)
    assert ex.image_datas == args["image_datas"]
    np.testing.assert_array_equal(ex.time_pts, [0, 6])


def test_temporal_schema_tf_crosscheck():
    """The serialized bytes must decode identically through TF's proto."""
    args = make_temporal_args()
    serialized = convert_to_example_temporal(**args)
    ex = tf.train.Example()
    ex.ParseFromString(serialized)
    f = ex.features.feature
    assert f["meta/N"].int64_list.value[0] == 6
    # xys holds only the 14 common kps (face/toe split off, common.py:238-241)
    np.testing.assert_allclose(
        np.array(f["image/xys"].float_list.value),
        args["labels"][:, 0:2, :14].ravel(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.array(f["mosh/shape"].float_list.value), args["shape"], rtol=1e-6
    )
    assert len(f["image/encoded"].bytes_list.value) == 6


def test_temporal_19kp_layout():
    args = make_temporal_args(k=19)
    serialized = convert_to_example_temporal(**args)
    ex = parse_temporal_example(serialized)
    assert ex.kps.shape == (6, 19, 3)
    np.testing.assert_allclose(
        ex.kps, np.transpose(args["labels"], (0, 2, 1)), rtol=1e-6
    )
