"""Coverage for secondary modes: HMR-only training, hal-vs-const eval,
temporal mocap stream, loss-proportion reports, autorestart."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.utils.config import Config

RNG = np.random.RandomState(41)


def test_hmr_only_train_step():
    """use_hmr_only: per-frame IEF without the temporal encoder
    (build_hmr_model, trainer_sequence_fc.py:490-549)."""
    from tests.test_train import make_batch, tiny_config
    from human_dynamics_tpu.train.trainer import Trainer

    config = tiny_config(
        use_hmr_only=True, do_hallucinate=False, predict_delta=False
    )
    smpl = synthetic_smpl_model(num_verts=32, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)
    m = trainer.step(batch)
    assert np.isfinite(float(m["e_loss"]))
    assert "e_kp_dt_future" not in m
    assert "e_hallucinate" not in m
    # The static path keeps the reference's loss naming
    # (compute_losses_static, trainer_sequence_fc.py:955-988) and has no
    # temporal beta-const loss.
    assert "e_kp_static" in m and "e_joints_static" in m
    assert "e_kp" not in m and "e_const" not in m


def test_hal_vs_const_eval():
    from human_dynamics_tpu.eval.harness import test_sequence_const

    n = 40
    gt = RNG.randn(n, 14, 3)
    joints = gt + RNG.randn(n, 14, 3) * 0.01
    # Delta heads: the future head predicts gt exactly (better than
    # const), the past head predicts noise (worse).
    joints_delta = np.stack([
        RNG.randn(n, 14, 3),                      # dt=-5: noise
        np.concatenate([gt[5:], gt[-5:]], 0),     # dt=+5: gt shifted
    ], axis=1)
    data = {"gt3ds": gt, "N": n}
    preds = {"joints": joints, "joints_delta": joints_delta}
    errors = test_sequence_const(data, preds, delta_ts=(-5, 5))
    assert np.mean(errors["joints_dt5"]) < np.mean(
        errors["joints_const_dt5"]
    )
    assert np.mean(errors["joints_dt-5"]) > np.mean(
        errors["joints_const_dt-5"]
    )


def test_mocap_temporal_stream(tmp_path):
    from human_dynamics_tpu.data.loader import MocapTemporalStream
    from human_dynamics_tpu.datasets.mocap import (
        write_mocap_temporal_records,
    )

    mosh = tmp_path / "mosh" / "CMU"
    mosh.mkdir(parents=True)
    np.savez(str(mosh / "seq1.npz"),
             poses=RNG.randn(400, 72).astype(np.float32),
             betas=RNG.randn(10).astype(np.float32))
    out = str(tmp_path / "mocap_neutrMosh_temporal_pose")
    paths = write_mocap_temporal_records(
        str(tmp_path / "mosh"), out, "CMU", window=50,
        target_fps=25, source_fps=100,
    )
    poses, deltas = next(iter(MocapTemporalStream(paths)))
    assert poses.shape == (50, 72)
    assert deltas.shape == (49, 72)
    np.testing.assert_allclose(deltas, poses[1:] - poses[:-1], atol=1e-6)


def test_loss_proportions_report(tmp_path):
    from human_dynamics_tpu.utils.logging import write_loss_proportions

    path = write_loss_proportions(
        str(tmp_path), 500,
        {"e_kp": 1.0, "e_shape": 0.5, "d_pose": 2.0, "e_loss": 90.0},
        {"e_kp": 60.0, "e_shape": 1.0, "d_pose": 1.0},
    )
    text = open(path).read()
    assert "step 500" in text
    assert "e_kp" in text and "99.17%" in text  # 60 / 60.5
    assert "d_pose" not in text  # only e-losses in the table


def test_metric_logger_csv(tmp_path):
    from human_dynamics_tpu.utils.logging import MetricLogger

    logger = MetricLogger(str(tmp_path), use_tensorboard=False)
    logger.log_scalars(1, {"e_loss": 1.5, "d_loss": 0.5})
    logger.log_scalars(2, {"e_loss": 1.2, "d_loss": 0.4})
    logger.close()
    lines = open(os.path.join(str(tmp_path), "metrics.csv")).read()
    assert "e_loss" in lines and "1.2" in lines


def test_autorestart():
    from human_dynamics_tpu.utils.autorestart import (
        restart_until_success,
    )

    # Succeeds immediately.
    assert restart_until_success(
        [sys.executable, "-c", "import sys; sys.exit(0)"]
    ) == 0
    # Fails max_tries times then gives up.
    ret = restart_until_success(
        [sys.executable, "-c", "import sys; sys.exit(3)"],
        max_tries=2, backoff=0.01,
    )
    assert ret == 3


def test_config_json_roundtrip(tmp_path):
    c = Config(batch_size=4, datasets=("h36m",), e_lr=3e-5)
    text = c.to_json()
    back = Config.from_json(text)
    assert back.batch_size == 4
    assert back.datasets == ("h36m",)
    assert back.e_lr == 3e-5
    # prepare_dirs + save + resume check.
    c.log_dir = str(tmp_path / "logs")
    c.prepare_dirs()
    c.save()
    c2 = Config(batch_size=4, datasets=("h36m",), e_lr=3e-5,
                load_path=c.model_dir, log_dir=c.log_dir)
    c2.prepare_dirs()          # no diff -> ok
    assert c2.model_dir == c.model_dir
    c3 = Config(batch_size=8, datasets=("h36m",),
                load_path=c.model_dir, log_dir=c.log_dir)
    with pytest.raises(ValueError):
        c3.prepare_dirs()


def test_predictor_bf16_encoder_close_to_fp32():
    """bf16 encoder path stays within documented tolerance."""
    from human_dynamics_tpu.infer.predictor import HmmrPredictor
    from human_dynamics_tpu.models.hmmr import HmmrModel

    model = HmmrModel(include_resnet=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)
    frames = RNG.uniform(-1, 1, (10, 64, 64, 3)).astype(np.float32)

    p32 = HmmrPredictor(model, variables, smpl, batch_size=1,
                        seq_length=20)
    pbf = HmmrPredictor(model, variables, smpl, batch_size=1,
                        seq_length=20, bf16_encoder=True)
    o32 = p32.predict_all_images(frames)
    obf = pbf.predict_all_images(frames)
    rel = np.abs(o32["omegas"] - obf["omegas"]).mean() / (
        np.abs(o32["omegas"]).mean() + 1e-9
    )
    assert rel < 0.05
    assert o32["omegas"].shape == obf["omegas"].shape


def test_lrotmin():
    from human_dynamics_tpu.core import lrotmin, rodrigues

    theta = RNG.randn(72).astype(np.float32) * 0.4
    out = np.asarray(lrotmin(jnp.asarray(theta)))
    assert out.shape == (207,)
    rots = np.asarray(rodrigues(jnp.asarray(theta[3:].reshape(23, 3))))
    want = (rots - np.eye(3)).reshape(207)
    np.testing.assert_allclose(out, want, atol=1e-6)
    # Zero pose -> zero feature.
    np.testing.assert_allclose(
        np.asarray(lrotmin(jnp.zeros(72))), 0.0, atol=1e-6
    )


def test_trainer_render_summary():
    from tests.test_train import make_batch, tiny_config
    from human_dynamics_tpu.train.trainer import Trainer

    config = tiny_config(log_img_count=4)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=config.num_kps)
    trainer = Trainer(config, smpl)
    batch = make_batch(config, smpl)
    strip = trainer.render_summary(batch)
    assert strip.shape == (224, 224 * 4, 3)
    assert strip.dtype == np.uint8
    assert strip.min() < 255  # something was drawn


def test_predictor_hal_mode():
    """pred_mode='hal': predictions flow from the hallucinator branch
    (tester.py:183-194); delta heads come from do_hallucinate_preds."""
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer.predictor import HmmrPredictor
    from human_dynamics_tpu.models.hmmr import HmmrModel

    model = HmmrModel(
        feature_dim=64, do_hallucinate=True, do_hallucinate_preds=True
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 64)))
    smpl = synthetic_smpl_model(num_verts=32, num_kps=25)
    phi = RNG.randn(30, 64).astype(np.float32)

    hal = HmmrPredictor(model, variables, smpl, batch_size=2,
                        seq_length=20, pred_mode="hal")
    pred = HmmrPredictor(model, variables, smpl, batch_size=2,
                         seq_length=20, pred_mode="pred")
    o_hal = hal.predict_all_images(phi)
    o_pred = pred.predict_all_images(phi)
    assert o_hal["omegas"].shape == (30, 85)
    assert o_hal["omegas_delta"].shape == (30, 2, 85)
    # Different branches -> different outputs (same shapes).
    assert not np.allclose(o_hal["omegas"], o_pred["omegas"])


def test_restore_model_config(tmp_path):
    """Eval-time restore of the training run's architecture from
    params.json (restore_config semantics, eval.py:93-111)."""
    import json

    from human_dynamics_tpu.eval.harness import restore_model_config

    ckpt_dir = tmp_path / "run1"
    ckpt_dir.mkdir()
    (ckpt_dir / "params.json").write_text(json.dumps({
        "batch_size": 16, "T": 30, "load_path": "/x",  # ignored keys
        "num_conv_layers": 2, "predict_delta": False,
        "delta_t_values": [-3, 3], "do_hallucinate": False,
    }))
    kwargs = restore_model_config(str(ckpt_dir / "ckpt.npz"))
    assert kwargs == {
        "num_conv_layers": 2, "predict_delta": False,
        "delta_t_values": (-3, 3), "do_hallucinate": False,
    }
    # batch/T/paths never leak into model kwargs.
    assert "batch_size" not in kwargs and "T" not in kwargs
    # No params.json anywhere -> no overrides.
    assert restore_model_config(str(tmp_path / "lost" / "c.npz")) == {}


def test_evaluator_cache_key_includes_model_tag(tmp_path):
    """Different checkpoints into the same out_dir must not share pred
    caches (reference path schema: prediction.py:22-102)."""
    from human_dynamics_tpu.eval.harness import Evaluator

    class FakePredictor:
        seq_length = 20
        smpl = None

    ev_a = Evaluator(FakePredictor(), str(tmp_path), model_tag="ckpt_a")
    ev_b = Evaluator(FakePredictor(), str(tmp_path), model_tag="ckpt_b")
    pa = ev_a._cache_path("preds", "3dpw", "rec0", 0)
    pb = ev_b._cache_path("preds", "3dpw", "rec0", 0)
    assert pa != pb
    assert "ckpt_a_T20" in pa and "ckpt_b_T20" in pb
