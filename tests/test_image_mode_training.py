"""End-to-end image-mode training (precomputed_phi=False): records with
encoded jpegs -> loader decode + on-device tube augmentation -> ResNet
in the train step."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.data import (
    TFRecordWriter,
    convert_to_example_temporal,
)
from human_dynamics_tpu.data.loader import TrainDataPipeline
from human_dynamics_tpu.utils.config import Config

RNG = np.random.RandomState(61)


def write_image_shard(path, n_tubes=2, n_frames=24, crop=96,
                      with_3d=True):
    import cv2

    with TFRecordWriter(path) as w:
        for _ in range(n_tubes):
            labels = np.zeros((n_frames, 3, 25), np.float32)
            labels[:, 0] = RNG.uniform(crop * 0.3, crop * 0.7,
                                       (n_frames, 25))
            labels[:, 1] = RNG.uniform(crop * 0.3, crop * 0.7,
                                       (n_frames, 25))
            labels[:, 2] = 1.0
            image_datas = [
                cv2.imencode(
                    ".jpg",
                    RNG.randint(0, 255, (crop, crop, 3)).astype(np.uint8),
                )[1].tobytes()
                for _ in range(n_frames)
            ]
            w.write(convert_to_example_temporal(
                image_datas=image_datas,
                image_paths=[f"f{i}.png" for i in range(n_frames)],
                image_shapes=np.full((n_frames, 2), crop),
                labels=labels,
                centers=np.full((n_frames, 2), crop // 2),
                gt3ds=(RNG.randn(n_frames, 14, 3).astype(np.float32)
                       if with_3d else None),
                scale_factors=np.ones((n_frames, 2), np.float32),
                start_pts=np.zeros((n_frames, 2), np.int64),
                cams=(np.ones((n_frames, 3), np.float32)
                      if with_3d else None),
                poses=(RNG.randn(n_frames, 72).astype(np.float32) * 0.2
                       if with_3d else None),
                shape=(RNG.randn(10).astype(np.float32) * 0.3
                       if with_3d else None),
            ))


@pytest.fixture(scope="module")
def image_data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgdata")
    for ds, with_3d in (("insta_variety", False), ("h36m", True)):
        d = root / ds / "train"
        d.mkdir(parents=True)
        write_image_shard(str(d / "shard_0.tfrecord"), with_3d=with_3d)
    mocap = root / "mocap_neutrMosh"
    mocap.mkdir()
    from human_dynamics_tpu.data.tfrecord import encode_example

    with TFRecordWriter(str(mocap / "neutrSMPL_CMU_0.tfrecord")) as w:
        for _ in range(400):
            w.write(encode_example({
                "pose": RNG.randn(72).astype(np.float32) * 0.2,
                "shape": RNG.randn(10).astype(np.float32) * 0.3,
            }))
    return str(root)


def image_config(data_dir, **kw):
    defaults = dict(
        batch_size=2, T=8, num_kps=25, img_size=64,
        precomputed_phi=False, feature_dim=2048,
        data_dir=data_dir, datasets=("insta_variety", "h36m"),
        mocap_datasets=("CMU",),
        do_hallucinate=False, predict_delta=False,
    )
    defaults.update(kw)
    return Config(**defaults)


def test_image_mode_batch(image_data_dir):
    config = image_config(image_data_dir)
    pipeline = TrainDataPipeline(config)
    batch = pipeline._assemble_batch()
    assert batch.phis.shape == (2, 8, 64, 64, 3)   # images, not phis
    assert float(batch.phis.min()) >= -1.0 - 1e-5
    assert float(batch.phis.max()) <= 1.0 + 1e-5
    assert batch.kps.shape == (2, 8, 25, 3)
    # Normalized kp coords (jittered points may land slightly outside
    # the crop -> beyond +-1, same as the reference's un-clamped
    # normalization, tube_augmentation.py:174-182).
    assert float(jnp.abs(batch.kps[..., :2]).max()) <= 3.0
    assert batch.poses_gt.shape == (2, 8, 24, 3)


def test_image_mode_train_step(image_data_dir):
    from human_dynamics_tpu.train.trainer import Trainer

    config = image_config(image_data_dir)
    pipeline = TrainDataPipeline(config)
    batch = pipeline._assemble_batch()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)
    trainer = Trainer(config, smpl)
    metrics = trainer.step(batch)
    assert np.isfinite(float(metrics["e_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))


def test_bn_moving_stats_update_in_train_step(image_data_dir):
    """The train step must advance the resnet's BN moving averages —
    the reference executes slim's UPDATE_OPS together with e_loss
    (trainer_sequence_fc.py:747-750, resnet_arg_scope decay 0.997).
    Frozen init stats diverge from the drifting train activations and
    the inference-mode forward explodes (caught by the image-mode
    synthetic gauntlet). freeze_bn_stats opts out."""
    import jax

    from human_dynamics_tpu.train.trainer import Trainer

    def stats_of(trainer):
        return jax.tree_util.tree_map(
            np.asarray, trainer.state.params_e["batch_stats"]
        )

    def flat(t):
        from human_dynamics_tpu.utils.checkpoint import flatten_tree
        return flatten_tree(t)

    config = image_config(image_data_dir)
    pipeline = TrainDataPipeline(config)
    batch = pipeline._assemble_batch()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)

    trainer = Trainer(config, smpl)
    before = flat(stats_of(trainer))
    trainer.step(batch)
    after = flat(stats_of(trainer))
    assert set(before) == set(after)
    moved = [k for k in before if not np.allclose(before[k], after[k])]
    # Every BN layer sees nonzero-mean activations somewhere.
    assert len(moved) > len(before) * 0.5, (len(moved), len(before))
    # Decay 0.997: one step moves the stats by (1-m) * batch stat.
    k = next(k for k in moved if k.endswith("moving_mean"))
    assert np.abs(after[k] - before[k]).max() < 1.0  # small, not a swap
    for k in after:
        assert after[k].dtype == np.float32, k

    # Two steps compound.
    trainer.step(batch)
    after2 = flat(stats_of(trainer))
    assert any(not np.allclose(after[k], after2[k]) for k in moved)

    # freeze_bn_stats: inference-mode BN in the step, stats fixed.
    frozen_tr = Trainer(
        image_config(image_data_dir, freeze_bn_stats=True), smpl
    )
    fb = flat(stats_of(frozen_tr))
    frozen_tr.step(batch)
    fa = flat(stats_of(frozen_tr))
    for k in fb:
        np.testing.assert_array_equal(fb[k], fa[k], err_msg=k)


def test_image_mode_train_step_dp_sharded(image_data_dir):
    """The FULL image-mode step (resnet included) pjit-sharded over an
    8-device data mesh, loss-parity vs the unsharded step — the
    image-mode analogue of test_train.test_train_step_dp_sharded
    (low-res crops keep it CPU-tractable)."""
    from human_dynamics_tpu.parallel import (
        make_mesh,
        replicate,
        shard_batch,
    )
    from human_dynamics_tpu.train.trainer import Trainer

    config = image_config(image_data_dir, batch_size=8, img_size=32)
    pipeline = TrainDataPipeline(config)
    batch = pipeline._assemble_batch()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)

    trainer = Trainer(config, smpl)
    mesh = make_mesh(8)
    trainer.state = replicate(trainer.state, mesh)
    metrics = trainer.step(shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["e_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))

    trainer2 = Trainer(config, smpl)
    metrics2 = trainer2.step(batch)
    np.testing.assert_allclose(
        float(metrics["e_loss"]), float(metrics2["e_loss"]), rtol=5e-4
    )
    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(metrics2["d_loss"]), rtol=5e-4
    )


def test_freeze_phi_keeps_resnet_fixed(image_data_dir):
    """freeze_phi: resnet params must not move in the train step
    (get_unfrozen_E_vars, trainer_sequence_fc.py:681-685)."""
    import jax

    from human_dynamics_tpu.train.trainer import Trainer

    config = image_config(image_data_dir, freeze_phi=True)
    pipeline = TrainDataPipeline(config)
    batch = pipeline._assemble_batch()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)
    trainer = Trainer(config, smpl)
    before = jax.tree_util.tree_map(
        np.asarray, trainer.state.params_e["params"]["resnet_v2_50"]
    )
    ief_before = np.asarray(
        trainer.state.params_e["params"]["single_view_ief"]["fc1"]["kernel"]
    )
    trainer.step(batch)
    after = trainer.state.params_e["params"]["resnet_v2_50"]
    from human_dynamics_tpu.utils.checkpoint import flatten_tree

    flat_before = flatten_tree(before)
    flat_after = flatten_tree(
        jax.tree_util.tree_map(np.asarray, after)
    )
    assert set(flat_before) == set(flat_after)
    for k in flat_before:
        np.testing.assert_array_equal(flat_before[k], flat_after[k],
                                      err_msg=k)
    # IEF still trains.
    ief_after = np.asarray(
        trainer.state.params_e["params"]["single_view_ief"]["fc1"]["kernel"]
    )
    assert not np.allclose(ief_before, ief_after)
    # Frozen params are excluded from the optimizer entirely: no Adam
    # moments for the resnet subtree (masked-var-list semantics).
    opt_leaves = jax.tree_util.tree_leaves_with_path(
        trainer.state.opt_state_e
    )
    assert opt_leaves, "optimizer state unexpectedly empty"
    for path, _ in opt_leaves:
        assert "resnet_v2_50" not in jax.tree_util.keystr(path)


def test_freeze_resnet_stages_partial(image_data_dir):
    """freeze_resnet_stages=2: root conv + block1 stay fixed (and carry
    no Adam moments); block2+ and the IEF head still train."""
    import jax

    from human_dynamics_tpu.train.trainer import Trainer

    config = image_config(
        image_data_dir, freeze_phi=False, freeze_resnet_stages=2,
        use_3d_label=True,
    )
    pipeline = TrainDataPipeline(config)
    batch = pipeline._assemble_batch()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)
    trainer = Trainer(config, smpl)
    rn_before = jax.tree_util.tree_map(
        np.asarray, trainer.state.params_e["params"]["resnet_v2_50"]
    )
    trainer.step(batch)
    rn_after = jax.tree_util.tree_map(
        np.asarray,
        trainer.state.params_e["params"]["resnet_v2_50"],
    )
    from human_dynamics_tpu.utils.checkpoint import flatten_tree

    flat_before = flatten_tree(rn_before)
    flat_after = flatten_tree(rn_after)
    assert set(flat_before) == set(flat_after)
    frozen = [k for k in flat_before
              if k.startswith(("conv1", "block1/"))]
    thawed = [k for k in flat_before
              if k.startswith(("block2/", "block3/", "block4/"))]
    assert frozen and thawed
    for k in frozen:
        np.testing.assert_array_equal(flat_before[k], flat_after[k],
                                      err_msg=k)
    assert any(
        not np.allclose(flat_before[k], flat_after[k]) for k in thawed
    )
    # Adam moments exist for the trainable blocks but not the frozen
    # prefix.
    paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(
            trainer.state.opt_state_e
        )
    ]
    assert any("['block2/" in p for p in paths)
    # The root conv key is directly under resnet_v2_50 (each bottleneck
    # unit has its own inner 'conv1' — match the full path).
    assert not any(
        "['resnet_v2_50']['conv1']" in p or "['block1/" in p
        for p in paths
    )


def test_image_stream_defers_decode_and_bounds_bytes(image_data_dir):
    """Image-mode shuffle-buffer parity: tubes ride the buffer as
    compressed jpegs, capacity is ~300 (not 16), the byte budget keeps
    RSS bounded, and popped items decode correctly."""
    import os as _os

    from human_dynamics_tpu.data.loader import (
        ExampleStream, _item_nbytes, get_all_files, shuffle_buffered,
    )

    files = get_all_files(image_data_dir, ("insta_variety",))
    stream = ExampleStream(
        files, t=8, seed=0, decode_images=True,
        shuffle_buffer=300, shuffle_bytes=1 << 30,
    )
    # Raw items are compressed (jpeg bytes, no decoded images).
    raw = next(stream._raw_stream())
    assert "_jpegs" in raw and "images" not in raw
    assert all(isinstance(b, bytes) for b in raw["_jpegs"])
    # A compressed tube is far smaller than its decoded form.
    decoded_size = 8 * 96 * 96 * 3 * 4
    assert _item_nbytes(raw) < decoded_size / 3
    # Iterating decodes: images appear, _jpegs gone.
    item = next(iter(stream))
    assert "images" in item and "_jpegs" not in item
    assert item["images"].shape == (8, 96, 96, 3)

    # Byte budget: with a cap of ~2.5 items, the buffer never holds
    # more than that many (it evicts before inserting).
    sizes = []

    class Probe(dict):
        pass

    def gen():
        for i in range(50):
            d = Probe(idx=np.full(1000, i, np.int64))  # 8 KB each
            yield d

    rng = np.random.RandomState(0)
    out = list(shuffle_buffered(gen(), rng, capacity=300,
                                max_bytes=20000))
    assert len(out) == 50
    assert sorted(int(d["idx"][0]) for d in out) == list(range(50))
    # With only ~2 items buffered, output order stays near input order
    # (mean displacement ~ buffer size; a random-evict buffer lets a
    # single item lag geometrically, so bound the mean, not the max).
    disp = [abs(int(d["idx"][0]) - i) for i, d in enumerate(out)]
    assert np.mean(disp) < 4, disp
    assert max(disp) < 25, disp


def test_image_stream_shuffles_across_tubes(tmp_path):
    """With the 300-capacity buffer, image-mode outputs are
    decorrelated across the shard's tube order (round 2 buffered only
    16 decoded tubes; the reference's shuffle_batch holds ~300)."""
    import cv2

    from human_dynamics_tpu.data.loader import ExampleStream

    # 12 tubes whose labels are constant per tube (= tube id), 8 frames
    # each so the T=8 window has no sampling variance.
    n_tubes, n_frames, crop = 12, 8, 32
    path = str(tmp_path / "ident.tfrecord")
    jpeg = cv2.imencode(
        ".jpg", np.zeros((crop, crop, 3), np.uint8)
    )[1].tobytes()
    with TFRecordWriter(path) as w:
        for ti in range(n_tubes):
            labels = np.full((n_frames, 3, 25), float(ti), np.float32)
            w.write(convert_to_example_temporal(
                image_datas=[jpeg] * n_frames,
                image_paths=[f"f{i}.png" for i in range(n_frames)],
                image_shapes=np.full((n_frames, 2), crop),
                labels=labels,
                centers=np.full((n_frames, 2), crop // 2),
                gt3ds=None,
                scale_factors=np.ones((n_frames, 2), np.float32),
                start_pts=np.zeros((n_frames, 2), np.int64),
                cams=None, poses=None, shape=None,
            ))

    stream = ExampleStream(
        [path], t=8, seed=3, decode_images=True,
        shuffle_buffer=300, shuffle_bytes=1 << 30,
    )
    it = iter(stream)
    ids = [int(next(it)["labels_raw"].flat[0]) for _ in range(36)]
    # All tubes appear, and NOT in repeated file order (the round-2
    # 16-buffer emitted near-file-order for small shards).
    assert set(ids) == set(range(n_tubes))
    in_order = sum(
        b == (a + 1) % n_tubes for a, b in zip(ids, ids[1:])
    )
    assert in_order < len(ids) * 0.5, ids
