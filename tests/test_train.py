"""Training-step tests: loss semantics, GAN optimizer split, DP sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.train import losses as L
from human_dynamics_tpu.train.trainer import (
    Batch,
    Trainer,
    compute_losses,
    create_train_state,
    fake_pool_size,
)
from human_dynamics_tpu.utils.config import Config
from human_dynamics_tpu.parallel import (
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    shard_batch_2d,
)

RNG = np.random.RandomState(3)


def tiny_config(**kw) -> Config:
    defaults = dict(
        batch_size=2, T=20, feature_dim=64, num_kps=19,
    )
    defaults.update(kw)
    return Config(**defaults)


def make_batch(config: Config, smpl, rng=RNG) -> Batch:
    b, t = config.batch_size, config.T
    poses_gt = (rng.randn(b, t, 24, 3) * 0.2).astype(np.float32)
    shapes_gt = (rng.randn(b, 10) * 0.3).astype(np.float32)
    kps = rng.randn(b, t, config.num_kps, 3).astype(np.float32)
    kps[..., 2] = (rng.rand(b, t, config.num_kps) > 0.2).astype(np.float32)
    joints_gt = rng.randn(b, t, 14, 3).astype(np.float32)
    pool = fake_pool_size(config)
    from human_dynamics_tpu.core.rotations import rodrigues

    real_aa = (rng.randn(pool, 24, 3) * 0.2).astype(np.float32)
    poses_real = np.asarray(rodrigues(jnp.asarray(real_aa)))
    return Batch(
        phis=jnp.asarray(
            rng.randn(b, t, config.feature_dim).astype(np.float32)
        ),
        kps=jnp.asarray(kps),
        poses_gt=jnp.asarray(poses_gt),
        shapes_gt=jnp.asarray(shapes_gt),
        joints_gt=jnp.asarray(joints_gt),
        has_3d_joints=jnp.asarray([1.0] * (config.batch_size // 2) +
                                  [0.0] * (config.batch_size -
                                           config.batch_size // 2)),
        has_3d_smpl=jnp.ones((config.batch_size,)),
        poses_real=jnp.asarray(poses_real),
    )


# ---------------------------------------------------------------------------
# Loss library semantics (TF weighted-reduction parity)
# ---------------------------------------------------------------------------

def test_keypoint_l1_tf_reduction():
    """sum(w*l)/count(nonzero broadcast w) — TF SUM_BY_NONZERO_WEIGHTS."""
    gt = np.zeros((1, 4, 3), np.float32)
    gt[0, :, 2] = [1, 1, 0, 0]          # 2 visible
    pred = np.ones((1, 4, 2), np.float32)
    got = float(L.keypoint_l1_loss(jnp.asarray(gt), jnp.asarray(pred)))
    # numerator: 2 visible pts * 2 coords * |1-0| = 4; denominator: 2*2=4.
    assert got == pytest.approx(1.0)


def test_masked_mse_tf_reduction():
    gt = np.zeros((4, 6), np.float32)
    pred = np.full((4, 6), 2.0, np.float32)
    mask = np.array([1, 1, 0, 0], np.float32)
    got = float(L.masked_mse(jnp.asarray(gt), jnp.asarray(pred),
                             jnp.asarray(mask)))
    # 0.5 * sum(2 rows * 6 * 4) / (2 rows * 6 elements) = 0.5*48/12 = 2.
    assert got == pytest.approx(2.0)


def test_masked_mse_all_masked():
    gt = jnp.zeros((3, 2))
    pred = jnp.ones((3, 2))
    got = float(L.masked_mse(gt, pred, jnp.zeros((3,))))
    assert got == 0.0  # no NaN with zero mask


def test_align_by_pelvis():
    joints = RNG.randn(5, 14, 3).astype(np.float32)
    out = np.asarray(L.align_by_pelvis(jnp.asarray(joints)))
    pelvis = (joints[:, 3] + joints[:, 2]) / 2
    np.testing.assert_allclose(out, joints - pelvis[:, None], atol=1e-6)
    np.testing.assert_allclose(
        (out[:, 3] + out[:, 2]) / 2, 0.0, atol=1e-6
    )


def test_lsgan_losses():
    fake = jnp.asarray(RNG.randn(6, 24).astype(np.float32))
    real = jnp.asarray(RNG.randn(6, 24).astype(np.float32))
    e = float(L.lsgan_encoder_loss(fake))
    df = float(L.lsgan_disc_fake_loss(fake))
    dr = float(L.lsgan_disc_real_loss(real))
    np.testing.assert_allclose(
        e, np.mean(np.sum((np.asarray(fake) - 1) ** 2, axis=1)), rtol=1e-5
    )
    np.testing.assert_allclose(
        df, np.mean(np.sum(np.asarray(fake) ** 2, axis=1)), rtol=1e-5
    )
    np.testing.assert_allclose(
        dr, np.mean(np.sum((np.asarray(real) - 1) ** 2, axis=1)), rtol=1e-5
    )


def test_beta_smoothness():
    shapes = RNG.randn(2, 5, 10).astype(np.float32)
    got = float(L.beta_smoothness_loss(jnp.asarray(shapes)))
    want = 0.5 * np.mean((shapes[:, :-1] - shapes[:, 1:]) ** 2)
    assert got == pytest.approx(want, rel=1e-5)


# ---------------------------------------------------------------------------
# Full objective + train step
# ---------------------------------------------------------------------------

def test_fake_pool_size():
    c = tiny_config()  # present + 2 deltas + hal
    assert fake_pool_size(c) == c.batch_size * c.T * 4
    c2 = tiny_config(do_hallucinate=False)
    assert fake_pool_size(c2) == c2.batch_size * c2.T * 3
    c3 = tiny_config(do_hallucinate=False, predict_delta=False)
    assert fake_pool_size(c3) == c3.batch_size * c3.T


def test_compute_losses_keys_and_finiteness():
    config = tiny_config()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    state, hmmr, disc = create_train_state(config, jax.random.PRNGKey(0))
    batch = make_batch(config, smpl)
    e_loss, d_loss, metrics = compute_losses(
        config, hmmr, disc, smpl, state.params_e, state.params_d, batch,
        train=False,
    )
    expect = {
        "e_kp", "e_joints", "e_smpl", "e_const", "e_pose", "e_shape",
        "e_kp_dt_future", "e_joints_dt_future", "e_smpl_dt_future",
        "e_kp_dt_past", "e_joints_dt_past", "e_smpl_dt_past",
        "e_kp_hal", "e_joints_hal", "e_smpl_hal", "e_hallucinate",
        "d_pose", "e_loss", "d_loss",
    }
    assert set(metrics) == expect
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(e_loss) > 0 and float(d_loss) > 0


def test_train_step_updates_and_learns():
    config = tiny_config()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)

    p_e0 = jax.tree_util.tree_leaves(trainer.state.params_e)[0].copy()
    metrics0 = trainer.step(batch)
    assert int(trainer.state.step) == 1
    # Params changed.
    p_e1 = jax.tree_util.tree_leaves(trainer.state.params_e)[0]
    assert not np.allclose(np.asarray(p_e0), np.asarray(p_e1))

    # Overfit a fixed batch: e_loss decreases within a few steps.
    losses = [float(metrics0["e_loss"])]
    for _ in range(8):
        losses.append(float(trainer.step(batch)["e_loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_gan_gradient_isolation():
    """d_loss must not move E params; e_pose must not move D params via
    the frozen-critic path (the var_list split,
    trainer_sequence_fc.py:752-768)."""
    config = tiny_config(
        e_lw_kp=0, e_lw_joints=0, e_lw_smpl=0, e_lw_const=0,
        e_lw_shape=0, e_lw_hallucinate=0, e_lw_pose=0,
    )  # only d_pose active
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    state, hmmr, disc = create_train_state(config, jax.random.PRNGKey(0))
    batch = make_batch(config, smpl)

    def total(pe, pd):
        e_loss, d_loss, _ = compute_losses(
            config, hmmr, disc, smpl,
            {**state.params_e, "params": pe},
            {**state.params_d, "params": pd},
            batch, train=False,
        )
        return e_loss + d_loss

    ge, gd = jax.grad(total, argnums=(0, 1))(
        state.params_e["params"], state.params_d["params"]
    )
    # With every e-weight zero, the total reduces to d_pose: encoder
    # grads must be exactly zero (fakes detached), disc grads nonzero.
    assert all(
        np.allclose(np.asarray(g), 0.0)
        for g in jax.tree_util.tree_leaves(ge)
    )
    assert any(
        not np.allclose(np.asarray(g), 0.0)
        for g in jax.tree_util.tree_leaves(gd)
    )


def test_train_step_dp_sharded():
    """The same step runs pjit-sharded over an 8-device data mesh
    (SURVEY.md §2.3 DP row)."""
    config = tiny_config(batch_size=8)
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)

    mesh = make_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    trainer.state = replicate(trainer.state, mesh)
    metrics = trainer.step(sharded_batch)
    assert np.isfinite(float(metrics["e_loss"]))
    # Sharded and unsharded steps agree.
    trainer2 = Trainer(config, smpl)
    metrics2 = trainer2.step(batch)
    np.testing.assert_allclose(
        float(metrics["e_loss"]), float(metrics2["e_loss"]), rtol=2e-4
    )


def test_train_step_2d_mesh_data_x_time():
    """The SAME train step over a (4 data x 2 time) mesh: batch sharded
    over 'data', the T axis of per-frame tensors over 'time'. GSPMD
    partitions the temporal convs (halo exchange) and globalizes the
    GroupNorm/loss reductions; losses must match the unsharded step
    (SURVEY.md §2.3 SP row composed with DP)."""
    config = tiny_config(batch_size=4)
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)

    mesh = make_mesh_2d(4, 2)
    sharded_batch = shard_batch_2d(batch, mesh)
    trainer.state = replicate(trainer.state, mesh)
    metrics = trainer.step(sharded_batch)

    trainer2 = Trainer(config, smpl)
    metrics2 = trainer2.step(batch)
    np.testing.assert_allclose(
        float(metrics["e_loss"]), float(metrics2["e_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(metrics2["d_loss"]), rtol=2e-4
    )
    # A second step keeps states in agreement (grads all-reduced over
    # both axes identically).
    m3 = trainer.step(sharded_batch)
    m4 = trainer2.step(batch)
    np.testing.assert_allclose(
        float(m3["e_loss"]), float(m4["e_loss"]), rtol=5e-4
    )


def test_histogram_summary_logs_betas_and_disc_outputs(tmp_path):
    """Beta + 23 per-joint + all-joint D-output histograms land in the
    logger (trainer_sequence_fc.py:724-742,770-789 parity)."""
    import csv

    from human_dynamics_tpu.utils.logging import MetricLogger

    config = tiny_config()
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    logger = MetricLogger(str(tmp_path), use_tensorboard=False)
    trainer = Trainer(config, smpl, logger=logger)
    batch = make_batch(config, smpl)
    trainer.histogram_summary(batch)
    logger.close()

    with open(tmp_path / "histograms.csv") as f:
        rows = list(csv.DictReader(f))
    tags = {r["tag"] for r in rows}
    assert "betas" in tags and "betas_hal" in tags
    assert "poses_out/all" in tags
    assert "poses_out/Left_Finger" in tags
    assert len([t for t in tags if t.startswith("poses_out/")]) == 24
    assert all(np.isfinite(float(r["mean"])) for r in rows)


def test_bf16_training_step_close_to_fp32():
    """Mixed-precision training (use_bfloat16): one step must produce
    finite, fp32-comparable losses and fp32 params/optimizer state."""
    config32 = tiny_config()
    config16 = tiny_config(use_bfloat16=True)
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config32.num_kps)
    t32 = Trainer(config32, smpl)
    t16 = Trainer(config16, smpl)
    batch = make_batch(config32, smpl)

    m32 = t32.step(batch)
    m16 = t16.step(batch)
    assert np.isfinite(float(m16["e_loss"]))
    np.testing.assert_allclose(
        float(m16["e_loss"]), float(m32["e_loss"]), rtol=0.05
    )
    np.testing.assert_allclose(
        float(m16["d_loss"]), float(m32["d_loss"]), rtol=0.05
    )
    # Params and grads-accumulating state stay fp32.
    leaves = jax.tree_util.tree_leaves(t16.state.params_e)
    assert all(x.dtype == jnp.float32 for x in leaves
               if hasattr(x, "dtype") and jnp.issubdtype(
                   x.dtype, jnp.floating))
    # A few more steps keep training stable and actually update params.
    before = jax.tree_util.tree_leaves(t16.state.params_e)[0].copy()
    for _ in range(3):
        m16 = t16.step(batch)
    assert np.isfinite(float(m16["e_loss"]))
    after = jax.tree_util.tree_leaves(t16.state.params_e)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_train_step_tp_param_sharding_hook():
    """SAME train step over a (4 data x 2 model) mesh with parameters
    tensor-parallel via shard_params_tp: wide kernels column-sharded
    over 'model', batch over 'data'; GSPMD inserts the activation
    collectives and the losses must match the unsharded step
    (SURVEY.md §2.3 TP row — a capability hook, not a perf claim at
    this model scale)."""
    from human_dynamics_tpu.parallel import make_mesh_tp, shard_params_tp

    config = tiny_config(batch_size=4)
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)

    mesh = make_mesh_tp(4, 2)
    trainer.state = shard_params_tp(trainer.state, mesh)
    # The hook must actually shard something: at least one IEF/temporal
    # kernel carries the model axis.
    leaves = jax.tree_util.tree_leaves(trainer.state.params_e)
    specs = [
        l.sharding.spec for l in leaves if hasattr(l, "sharding")
    ]
    assert any("model" in str(s) for s in specs), specs
    sharded_batch = shard_batch(batch, mesh)
    metrics = trainer.step(sharded_batch)

    trainer2 = Trainer(config, smpl)
    metrics2 = trainer2.step(batch)
    np.testing.assert_allclose(
        float(metrics["e_loss"]), float(metrics2["e_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["d_loss"]), float(metrics2["d_loss"]), rtol=2e-4
    )
    # Updated params keep their TP shardings (donated in-place update),
    # so a second step runs without resharding.
    m3 = trainer.step(sharded_batch)
    m4 = trainer2.step(batch)
    np.testing.assert_allclose(
        float(m3["e_loss"]), float(m4["e_loss"]), rtol=5e-4
    )


def test_shard_batch_2d_rejects_indivisible_t():
    config = tiny_config(batch_size=4, T=21)
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    batch = make_batch(config, smpl)
    mesh = make_mesh_2d(4, 2)
    with pytest.raises(ValueError):
        shard_batch_2d(batch, mesh)


def test_save_params_only_checkpoint_roundtrip(tmp_path):
    """save_params_only: the checkpoint carries params_e/params_d/step
    but no Adam moments (~1/3 the readback bytes — the save cost that
    dominates on tunnel-attached chips, docs/train.md). Eval reads
    params_e as usual; auto-restore recovers the weights and step and
    resets the moments."""
    from human_dynamics_tpu.utils.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )

    config = tiny_config(
        model_dir=str(tmp_path / "m"), save_params_only=True
    )
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)
    trainer.step(batch)
    trainer.step(batch)
    path = trainer.save()
    assert path is not None

    raw = load_checkpoint(latest_checkpoint(config.model_dir))
    assert "params_e" in raw and "params_d" in raw
    assert "opt_state_e" not in raw and "opt_state_d" not in raw

    trainer2 = Trainer(config, smpl)  # auto-restores from model_dir
    assert int(trainer2.state.step) == 2
    a = jax.tree_util.tree_leaves(trainer.state.params_e)
    b = jax.tree_util.tree_leaves(trainer2.state.params_e)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # Moments are fresh, and training continues finitely.
    m = trainer2.step(batch)
    assert np.isfinite(float(m["e_loss"]))
