"""Checkpoint tests: native save/load round trip and the TF-slim
converter round trip (SURVEY.md §7 stage 3 — the parity-critical name
map), using tf.compat.v1 to write a real slim-named checkpoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.models.hmmr import HmmrModel
from human_dynamics_tpu.utils.checkpoint import (
    convert_tf_checkpoint,
    export_to_slim_names,
    flatten_tree,
    latest_checkpoint,
    load_checkpoint,
    load_variables,
    save_checkpoint,
    slim_to_flax_name_map,
    unflatten_tree,
)


def small_variables(include_resnet=False):
    # feature_dim must match the resnet's 2048-D output when images flow.
    feature_dim = 2048 if include_resnet else 64
    model = HmmrModel(
        include_resnet=include_resnet, feature_dim=feature_dim
    )
    phi = jnp.zeros(
        (1, 20, 64) if not include_resnet else (1, 2, 64, 64, 3)
    )
    return model, model.init(jax.random.PRNGKey(0), phi)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros((2, 2))}},
            "e": np.arange(4)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a::b", "a::c::d", "e"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])


def test_flatten_handles_slash_in_module_names():
    """Resnet module names contain '/' (slim-style); the flat separator
    must not split them (regression: demo CLI weights reload)."""
    tree = {"params": {"block1/unit_1/bottleneck_v2": {"kernel": np.ones(2)}}}
    back = unflatten_tree(flatten_tree(tree))
    assert "block1/unit_1/bottleneck_v2" in back["params"]
    np.testing.assert_array_equal(
        back["params"]["block1/unit_1/bottleneck_v2"]["kernel"], np.ones(2)
    )


def test_npz_roundtrip_with_resnet(tmp_path):
    model, variables = small_variables(include_resnet=True)
    path = str(tmp_path / "resnet.npz")
    save_checkpoint(path, variables)
    back = load_checkpoint(path)
    assert "block1/unit_1/bottleneck_v2" in back["params"]["resnet_v2_50"]


def test_npz_checkpoint_roundtrip(tmp_path):
    _, variables = small_variables()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, variables)
    back = load_checkpoint(path)
    flat_a = flatten_tree(jax.tree_util.tree_map(np.asarray, variables))
    flat_b = flatten_tree(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_orbax_checkpoint_roundtrip(tmp_path):
    _, variables = small_variables()
    ckpt = save_checkpoint(str(tmp_path / "run"), variables, step=7)
    assert latest_checkpoint(str(tmp_path / "run")) == ckpt
    back = load_checkpoint(ckpt)
    flat_a = flatten_tree(jax.tree_util.tree_map(np.asarray, variables))
    flat_b = flatten_tree(jax.tree_util.tree_map(np.asarray, back))
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
    # load_variables on the directory resolves the latest ckpt.
    back2 = load_variables(str(tmp_path / "run"))
    assert set(flatten_tree(jax.tree_util.tree_map(np.asarray, back2))) \
        == set(flat_a)


def test_checkpoint_top_keys_all_formats(tmp_path):
    """Structural slim-checkpoint detection (trainer.maybe_restore):
    npz and orbax report top-level keys WITHOUT a full restore; pickle
    returns None (no cheap listing — caller falls back to
    try-full-then-slim)."""
    import pickle

    from human_dynamics_tpu.utils.checkpoint import checkpoint_top_keys

    tree = {
        "params_e": {"w": np.ones((2, 2), np.float32)},
        "params_d": {"w": np.zeros((3,), np.float32)},
        "step": np.int32(5),
    }
    npz = str(tmp_path / "ck.npz")
    save_checkpoint(npz, tree)
    assert checkpoint_top_keys(npz) == ["params_d", "params_e", "step"]

    orbax_ckpt = save_checkpoint(str(tmp_path / "run"), tree, step=5)
    if not orbax_ckpt.endswith(".pkl"):  # orbax available
        assert checkpoint_top_keys(orbax_ckpt) == [
            "params_d", "params_e", "step"
        ]

    pkl = str(tmp_path / "ck.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(tree, f)
    assert checkpoint_top_keys(pkl) is None

    # A directory without orbax metadata yields None, not a crash.
    empty = tmp_path / "empty"
    empty.mkdir()
    assert checkpoint_top_keys(str(empty)) is None


def test_name_map_covers_hmmr_params():
    """Every HmmrModel param (precomputed-phi mode) must appear in the
    slim name map — no orphan weights after conversion."""
    model, variables = small_variables(include_resnet=False)
    name_map = slim_to_flax_name_map(include_resnet=False)
    mapped_paths = {
        (coll,) + path for coll, path in name_map.values()
    }
    flat = flatten_tree(variables["params"])
    for key in flat:
        path = ("params",) + tuple(key.split("::"))
        assert path in mapped_paths, f"unmapped param {key}"


tf = pytest.importorskip("tensorflow")


def test_tf_converter_roundtrip(tmp_path):
    """flax -> slim-named TF ckpt -> flax must be the identity."""
    model, variables = small_variables(include_resnet=False)
    slim_vars = export_to_slim_names(variables, include_resnet=False)
    assert "single_view_ief/3D_module/fc1/weights" in slim_vars
    assert "AZ_FC_block2_conv1block_0/weights" in slim_vars
    assert slim_vars["AZ_FC_block2_conv1block_0/weights"].ndim == 4

    # Write a genuine TF checkpoint with those names (graph-mode saver,
    # exactly how the reference's checkpoints were produced).
    ckpt_prefix = str(tmp_path / "model.ckpt")
    g = tf.Graph()
    with g.as_default():
        tf_vars = {}
        for name, value in slim_vars.items():
            scope, _, vname = name.rpartition("/")
            with tf.compat.v1.variable_scope(scope):
                tf_vars[name] = tf.compat.v1.get_variable(
                    vname if vname else name,
                    initializer=tf.constant(value),
                )
        saver = tf.compat.v1.train.Saver(
            {name: v for name, v in tf_vars.items()}
        )
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    converted = convert_tf_checkpoint(
        ckpt_prefix, include_resnet=False, strict=True
    )
    flat_orig = flatten_tree(
        jax.tree_util.tree_map(np.asarray, variables["params"])
    )
    flat_conv = flatten_tree(converted["params"])
    assert set(flat_conv) == set(flat_orig)
    for k in flat_orig:
        np.testing.assert_allclose(
            flat_conv[k], flat_orig[k], atol=1e-6, err_msg=k
        )


def test_tf_converter_strips_hmr_scope(tmp_path):
    """Plain-HMR checkpoints store the IEF under 3D_module/* without the
    single_view_ief prefix (trainer_sequence_fc.py:374-389); the
    converter must find them."""
    model, variables = small_variables(include_resnet=False)
    slim_vars = export_to_slim_names(variables, include_resnet=False)
    # Re-key IEF vars without the scope prefix.
    rekeyed = {}
    for name, value in slim_vars.items():
        if name.startswith("single_view_ief/"):
            rekeyed[name[len("single_view_ief/"):]] = value
        else:
            rekeyed[name] = value

    ckpt_prefix = str(tmp_path / "hmr.ckpt")
    g = tf.Graph()
    with g.as_default():
        tf_vars = {}
        for name, value in rekeyed.items():
            scope, _, vname = name.rpartition("/")
            with tf.compat.v1.variable_scope(scope):
                tf_vars[name] = tf.compat.v1.get_variable(
                    vname if vname else name,
                    initializer=tf.constant(value),
                )
        saver = tf.compat.v1.train.Saver(dict(tf_vars))
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    converted = convert_tf_checkpoint(
        ckpt_prefix, include_resnet=False, strict=True
    )
    np.testing.assert_allclose(
        converted["params"]["single_view_ief"]["fc1"]["kernel"],
        np.asarray(variables["params"]["single_view_ief"]["fc1"]["kernel"]),
        atol=1e-6,
    )


def test_disc_converter(tmp_path):
    """D_pose/* conversion incl. stacking the 23 per-joint heads."""
    rng = np.random.RandomState(0)
    slim_vars = {
        "D_pose/D_conv1/weights": rng.randn(1, 1, 9, 32).astype(np.float32),
        "D_pose/D_conv1/biases": rng.randn(32).astype(np.float32),
        "D_pose/D_conv2/weights": rng.randn(1, 1, 32, 32).astype(np.float32),
        "D_pose/D_conv2/biases": rng.randn(32).astype(np.float32),
        "D_pose/D_alljoints_fc1/weights": rng.randn(736, 1024).astype(
            np.float32),
        "D_pose/D_alljoints_fc1/biases": rng.randn(1024).astype(np.float32),
        "D_pose/D_alljoints_fc2/weights": rng.randn(1024, 1024).astype(
            np.float32),
        "D_pose/D_alljoints_fc2/biases": rng.randn(1024).astype(np.float32),
        "D_pose/D_alljoints_out/weights": rng.randn(1024, 1).astype(
            np.float32),
        "D_pose/D_alljoints_out/biases": rng.randn(1).astype(np.float32),
        "mean_param": rng.randn(1, 85).astype(np.float32),
        "single_view_ief/3D_module/fc1/weights":
            rng.randn(2133, 1024).astype(np.float32),
    }
    for j in range(23):
        slim_vars[f"D_pose/pose_out_j{j}/weights"] = rng.randn(
            32, 1).astype(np.float32)
        slim_vars[f"D_pose/pose_out_j{j}/biases"] = rng.randn(1).astype(
            np.float32)

    ckpt_prefix = str(tmp_path / "d.ckpt")
    g = tf.Graph()
    with g.as_default():
        tf_vars = {}
        for name, value in slim_vars.items():
            scope, _, vname = name.rpartition("/")
            with tf.compat.v1.variable_scope(scope):
                tf_vars[name] = tf.compat.v1.get_variable(
                    vname if vname else name,
                    initializer=tf.constant(value),
                )
        saver = tf.compat.v1.train.Saver(dict(tf_vars))
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    hmmr_vars, disc_vars = convert_tf_checkpoint(
        ckpt_prefix, include_resnet=False
    )
    assert disc_vars["params"]["per_joint_w"].shape == (23, 32)
    np.testing.assert_allclose(
        disc_vars["params"]["per_joint_w"][3],
        slim_vars["D_pose/pose_out_j3/weights"].reshape(-1),
    )
    np.testing.assert_allclose(
        disc_vars["params"]["D_conv1"]["kernel"],
        slim_vars["D_pose/D_conv1/weights"].reshape(9, 32),
    )
    np.testing.assert_allclose(
        hmmr_vars["params"]["mean_param"], slim_vars["mean_param"]
    )
