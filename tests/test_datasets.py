"""Dataset factory tests: crops, tube cleaning, converters, phi
extraction, record visualization."""

import json
import os

import numpy as np
import pytest

from human_dynamics_tpu.data.schema import read_test_example, \
    parse_temporal_example
from human_dynamics_tpu.data.tfrecord import read_tfrecord
from human_dynamics_tpu.datasets.common import (
    clean_tube,
    crop_person,
    decode_jpeg,
    encode_jpeg,
)

RNG = np.random.RandomState(31)


def test_jpeg_roundtrip():
    # Smooth gradient (JPEG-friendly; noise would round-trip poorly).
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([x * 4, y * 4, (x + y) * 2], axis=2).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=100))
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 3


def test_crop_person_geometry():
    img = RNG.randint(0, 255, (400, 600, 3)).astype(np.uint8)
    kps = np.zeros((25, 3))
    kps[:, 0] = np.linspace(280, 320, 25)
    kps[:, 1] = np.linspace(150, 250, 25)
    kps[:, 2] = 1.0
    # bbox: center (300, 200), person height ~107 -> scale 150/107.
    bbox = np.array([300.0, 200.0, 1.4])
    ret = crop_person(img, kps, bbox, crop_size=300)
    assert ret["image"].shape == (300, 300, 3)
    # The person center lands at the crop center.
    np.testing.assert_allclose(ret["center"], [150, 150], atol=1.5)
    # Kps transformed into crop coords consistently: center kp near 150.
    label = ret["label"]           # (3, 25)
    assert abs(label[0, 12] - 150) < 32
    assert np.all(label[2] == 1.0)
    # 224 test crop.
    ret224 = crop_person(img, kps, bbox, crop_size=224)
    assert ret224["image"].shape == (224, 224, 3)


def test_clean_tube_segments():
    good = np.ones((25, 3))
    bad = np.zeros((25, 3))
    face_only = np.zeros((25, 3))
    face_only[14:19, 2] = 1.0      # only face visible
    kps = (
        [None] * 5 + [good] * 60 + [bad] * 3 + [good] * 45
        + [face_only] * 10 + [good] * 10
    )
    segs = clean_tube(kps, min_length=40)
    assert segs == [(5, 65), (68, 113)]
    # Long run chunked at max_length.
    segs2 = clean_tube([good] * 1100, min_length=40, max_length=500)
    assert segs2 == [(0, 500), (500, 1000), (1000, 1100)]


def test_penn_mapping():
    from human_dynamics_tpu.datasets.penn_action import get_upenn2coco

    upenn2coco, names = get_upenn2coco()
    assert len(upenn2coco) == 25
    # Head in Penn (idx 0) maps to universal 'Head' slot (idx 13).
    assert upenn2coco[13] == 0
    # R Shoulder Penn idx 1 -> universal idx 8.
    assert upenn2coco[8] == 1
    # Reference's published table (data_utils flip test transitively
    # checks the universal order; here check a couple more).
    assert names[14] == "Nose" and upenn2coco[14] == 14


def test_3dpw_rectify_and_mapping():
    from human_dynamics_tpu.datasets.tdpw import (
        get_3dpw2coco,
        rectify_joints,
    )

    order, names = get_3dpw2coco()
    assert len(order) == 25
    # Nose is idx 0 in the 18-kp COCO order -> universal slot 14.
    assert order[14] == 0

    joints = RNG.randn(25, 3)
    r = np.eye(3)
    np.testing.assert_allclose(rectify_joints(joints, r), joints)
    # Rotation preserves centroid.
    import jax.numpy as jnp
    from human_dynamics_tpu.core.rotations import rodrigues

    r = np.asarray(rodrigues(jnp.asarray([[0.3, 0.2, 0.1]],
                                         dtype=jnp.float32)))[0]
    rect = rectify_joints(joints, r)
    np.testing.assert_allclose(
        rect.mean(axis=0), joints.mean(axis=0), atol=1e-6
    )


def test_fit_neutral_shape_recovers_beta():
    from human_dynamics_tpu.core import smpl_forward, synthetic_smpl_model
    from human_dynamics_tpu.datasets.tdpw import fit_neutral_shape
    import jax.numpy as jnp

    smpl = synthetic_smpl_model(num_verts=64)
    true_beta = (RNG.randn(10) * 0.5).astype(np.float32)
    target = np.asarray(smpl_forward(
        smpl, jnp.asarray(true_beta)[None], jnp.zeros((1, 72))
    ).verts[0])

    beta, loss = fit_neutral_shape(
        smpl, target, max_iters=3000, lr=0.05
    )
    assert loss < 1e-4
    np.testing.assert_allclose(beta, true_beta, atol=0.05)


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("frames")
    paths = []
    for i in range(60):
        img = RNG.randint(0, 255, (240, 320, 3)).astype(np.uint8)
        p = str(d / f"image_{i:05d}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _track_kps(n, k=25):
    kps = np.zeros((n, k, 3))
    kps[:, :, 0] = 160 + np.linspace(-25, 25, k)
    kps[:, :, 1] = 120 + np.linspace(-60, 60, k)
    kps[:, :, 2] = 1.0
    return kps


def test_save_test_tfrecord_roundtrip(frame_dir, tmp_path):
    from human_dynamics_tpu.datasets.test_records import (
        save_seq_to_test_tfrecord,
    )

    n = len(frame_dir)
    kps = _track_kps(n)
    gt3ds = RNG.randn(n, 14, 3)
    poses = RNG.randn(n, 72) * 0.2
    shape = RNG.randn(10) * 0.3
    out = str(tmp_path / "seq.tfrecord")
    save_seq_to_test_tfrecord(
        out, frame_dir, [kps], [gt3ds], [poses], [shape],
        vis_thresh=0.1,
    )
    records = list(read_tfrecord(out, check_crc=True))
    assert len(records) == 1
    data = read_test_example(records[0])
    assert data["N"] == n
    assert data["images"][0].shape == (224, 224, 3)
    assert data["kps"].shape == (n, 25, 3)
    np.testing.assert_allclose(data["shape"], shape, atol=1e-5)
    np.testing.assert_allclose(
        data["poses"].reshape(n, 72), poses, atol=1e-5
    )
    # Crop-undo metadata present.
    assert data["start_pts"].shape == (n, 2)
    assert len(data["scales"]) == n


def test_tube_converter_phis(frame_dir, tmp_path):
    """Train-record conversion with on-device augmentation + phi
    extraction, using a small resnet on 64px crops is too slow — use
    the real extractor on the real crop size but few frames."""
    import jax

    from human_dynamics_tpu.datasets.phi_extractor import (
        FeatureExtractor,
    )
    from human_dynamics_tpu.datasets.tube_writer import TubeConverter
    from human_dynamics_tpu.models.resnet import ResNetV2_50
    import jax.numpy as jnp

    resnet = ResNetV2_50()
    variables = resnet.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    fe = FeatureExtractor(
        {"params": {"resnet_v2_50": variables["params"]},
         "batch_stats": {"resnet_v2_50": variables["batch_stats"]}},
        batch_size=8,
    )

    n = 45  # > min tube len 40
    kps = _track_kps(n)
    conv = TubeConverter(
        str(tmp_path / "train"), feature_extractor=fe,
        tubes_per_shard=2,
    )
    paths = conv.write_tubes(
        "penn_train",
        [dict(image_paths=frame_dir[:n], gt2ds=kps)],
    )
    assert len(paths) == 1 and os.path.exists(paths[0])
    ex = parse_temporal_example(next(iter(read_tfrecord(paths[0]))))
    assert ex.phis is not None
    assert ex.phis.shape == (n, 2048)
    assert np.all(np.isfinite(ex.phis))
    # Labels normalized to [-1, 1].
    assert np.abs(ex.kps[..., :2]).max() <= 1.0 + 1e-5
    # Idempotency: second call skips.
    paths2 = conv.write_tubes(
        "penn_train", [dict(image_paths=frame_dir[:n], gt2ds=kps)]
    )
    assert paths2 == paths


def test_insta_detect_and_track_layout(tmp_path):
    """shot_split per-frame jsons -> tubes: joint-name keying, the 0.1
    logit visibility threshold, Head forced invisible, imloc frame
    resolution, and the 2000-code split file."""
    import json as jsonlib

    from human_dynamics_tpu.datasets.insta_variety import (
        UNIVERSAL_25_NAMES,
        gather_tubes_detect_and_track,
        split_video_codes,
    )

    root = tmp_path / "dt"
    n = 45
    seq_dir = root / "vidA" / "shot_split" / "000"
    seq_dir.mkdir(parents=True)
    for i in range(n):
        data = {"imloc": f"frame_{i:05d}.jpg"}
        for j, name in enumerate(UNIVERSAL_25_NAMES):
            data[name] = {
                "x": 100.0 + j, "y": 50.0 + j,
                # joint 3 always below threshold -> invisible
                "logits": 0.05 if j == 3 else 0.9,
            }
        with open(seq_dir / f"{i:05d}.json", "w") as f:
            jsonlib.dump(data, f)

    tubes = list(gather_tubes_detect_and_track(
        str(root), "/frames", num_copies=2
    ))
    assert len(tubes) == 2  # one shot x num_copies
    kps = tubes[0]["gt2ds"]
    assert kps.shape == (n, 25, 3)
    head = UNIVERSAL_25_NAMES.index("Head")
    assert np.all(kps[:, head] == 0.0)        # forced invisible
    assert np.all(kps[:, 3, 2] == 0.0)        # logit < 0.1
    assert np.all(kps[:, 0, 2] == 1.0)
    np.testing.assert_allclose(kps[:, 0, 0], 100.0)
    assert tubes[0]["image_paths"][0] == "/frames/vidA/frame_00000.jpg"

    lst = tmp_path / "codes.txt"
    lst.write_text("".join(f"v{i}\n" for i in range(2500)))
    train = split_video_codes(str(lst), "train")
    test = split_video_codes(str(lst), "test")
    assert len(train) == 2000 and len(test) == 500
    assert train[0] == "v0" and test[0] == "v2000"
    with pytest.raises(ValueError):
        split_video_codes(str(lst), "val")


def test_mocap_records_roundtrip(tmp_path):
    from human_dynamics_tpu.data.loader import MocapStream
    from human_dynamics_tpu.datasets.mocap import (
        write_mocap_records,
    )

    mosh = tmp_path / "mosh" / "CMU"
    mosh.mkdir(parents=True)
    np.savez(str(mosh / "seq1.npz"),
             poses=RNG.randn(30, 72).astype(np.float32),
             betas=RNG.randn(10).astype(np.float32))
    # Test-subject exclusion.
    np.savez(str(mosh / "S9_seq.npz"),
             poses=RNG.randn(30, 72).astype(np.float32),
             betas=RNG.randn(10).astype(np.float32))

    out = str(tmp_path / "records")
    paths = write_mocap_records(str(tmp_path / "mosh"), out, "CMU")
    assert len(paths) == 1
    # Loadable by the training mocap stream.
    stream = iter(MocapStream(paths))
    pose, shape = next(stream)
    assert pose.shape == (72,) and shape.shape == (10,)
    # Only the non-S9 sequence got in.
    count = sum(1 for _ in read_tfrecord(paths[0]))
    assert count == 30


def test_visualize_records(frame_dir, tmp_path):
    from human_dynamics_tpu.datasets.test_records import (
        save_seq_to_test_tfrecord,
    )
    from human_dynamics_tpu.datasets.visualize_records import (
        visualize_record,
    )

    out = str(tmp_path / "seq.tfrecord")
    save_seq_to_test_tfrecord(
        out, frame_dir, [_track_kps(len(frame_dir))], vis_thresh=0.1
    )
    written = visualize_record(out, str(tmp_path / "viz"))
    assert len(written) >= 4
    assert all(os.path.exists(p) for p in written)
