"""On-device eval metrics (eval/metrics_device.py) vs the numpy oracle
(eval/metrics.py + harness.compute_errors_batched): same per-tube
aggregates, with and without count-bucket padding, plus the
Evaluator(device_metrics=True) end-to-end path (no prediction fetch,
scalar-only caches, same results table)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.core.rotations import rodrigues
from human_dynamics_tpu.eval.harness import compute_errors_batched
from human_dynamics_tpu.eval.metrics_device import (
    make_compute_errors_device,
)

RNG = np.random.RandomState(29)


def make_tube(n=31, k=25):
    kps_gt = np.zeros((n, k, 3), np.float32)
    kps_gt[..., :2] = RNG.rand(n, k, 2) * 224
    kps_gt[..., 2] = (RNG.rand(n, k) > 0.2).astype(np.float32)
    # One frame below min_visible: the numpy path NaNs it, the device
    # path masks it — aggregates must still agree.
    kps_gt[4, :, 2] = 0.0
    kps_gt[4, :3, 2] = 1.0
    kps_pred = (RNG.rand(n, k, 2) * 2 - 1).astype(np.float32)
    joints_gt = RNG.randn(n, 14, 3).astype(np.float32) * 0.3
    joints_pred = (joints_gt + RNG.randn(n, 14, 3) * 0.05).astype(
        np.float32
    )
    poses_gt = (RNG.randn(n, 72) * 0.2).astype(np.float32)
    poses_pred = np.asarray(
        rodrigues(jnp.asarray(
            (poses_gt + RNG.randn(n, 72) * 0.05).reshape(n, 24, 3)
        ))
    )
    shape_gt = (RNG.randn(10) * 0.3).astype(np.float32)
    shapes_pred = (shape_gt + RNG.randn(n, 10) * 0.05).astype(np.float32)
    return dict(
        kps_gt=kps_gt, kps_pred=kps_pred, joints_gt=joints_gt,
        joints_pred=joints_pred, poses_gt=poses_gt,
        poses_pred=poses_pred, shape_gt=shape_gt,
        shapes_pred=shapes_pred,
    )


def numpy_scalars(tube, smpl):
    errors = compute_errors_batched(
        **{k: v.astype(np.float64) if k != "poses_pred" else v
           for k, v in tube.items()},
        img_size=224, has_3d=True, compute_mesh=True, smpl=smpl,
    )
    return {k: float(np.nanmean(v)) for k, v in errors.items()}


def test_device_metrics_match_numpy_oracle():
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    tube = make_tube()
    want = numpy_scalars(tube, smpl)

    fn = make_compute_errors_device(smpl)
    got = fn(
        kps_gt=jnp.asarray(tube["kps_gt"]),
        kps_pred=jnp.asarray(tube["kps_pred"]),
        joints_gt=jnp.asarray(tube["joints_gt"]),
        joints_pred=jnp.asarray(tube["joints_pred"]),
        poses_gt=jnp.asarray(tube["poses_gt"]),
        poses_pred=jnp.asarray(tube["poses_pred"]),
        shape_gt=jnp.asarray(tube["shape_gt"]),
        shapes_pred=jnp.asarray(tube["shapes_pred"]),
        img_size=224, has_3d=True, compute_mesh=True,
    )
    got = {k: float(v) for k, v in got.items()}
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-3, atol=2e-4, err_msg=k
        )


def test_device_metrics_bucket_padding_is_exact():
    """Padding the frame axis (with num_frames masking) must not move
    any aggregate: identity-rotation padded rows, zero-filled labels."""
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    tube = make_tube(n=31)
    fn = make_compute_errors_device(smpl)

    def call(padded_n):
        n = 31

        def pad(a, fill=0.0):
            if padded_n == n:
                return jnp.asarray(a)
            block = np.full(
                (padded_n - n,) + a.shape[1:], fill, a.dtype
            )
            return jnp.asarray(np.concatenate([a, block]))

        poses_pred = np.concatenate([
            tube["poses_pred"],
            np.broadcast_to(
                np.eye(3, dtype=np.float32),
                (padded_n - 31, 24, 3, 3),
            ),
        ]) if padded_n > 31 else tube["poses_pred"]
        return {k: float(v) for k, v in fn(
            kps_gt=pad(tube["kps_gt"]),
            kps_pred=pad(tube["kps_pred"]),
            joints_gt=pad(tube["joints_gt"]),
            joints_pred=pad(tube["joints_pred"]),
            poses_gt=pad(tube["poses_gt"]),
            poses_pred=jnp.asarray(poses_pred),
            shape_gt=jnp.asarray(tube["shape_gt"]),
            shapes_pred=pad(tube["shapes_pred"]),
            num_frames=jnp.asarray(31, jnp.int32),
            img_size=224, has_3d=True, compute_mesh=True,
        ).items()}

    exact = call(31)
    padded = call(48)
    for k in sorted(exact):
        np.testing.assert_allclose(
            padded[k], exact[k], rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_evaluator_device_metrics_end_to_end(tmp_path):
    """Evaluator(device_metrics=True) == the numpy evaluator on real
    test records, with no per-tube prediction pkls written (predictions
    never fetched)."""
    from tests.test_infer import FakeHmmrModel
    from tests.test_pipeline_e2e import write_test_record
    from human_dynamics_tpu.eval.harness import Evaluator
    from human_dynamics_tpu.infer.predictor import HmmrPredictor

    tf_dir = tmp_path / "records"
    (tf_dir / "3dpw" / "test").mkdir(parents=True)
    for i in range(2):
        write_test_record(
            str(tf_dir / "3dpw" / "test" / f"seq_{i}.tfrecord"),
            n_frames=25 + 6 * i,   # two lengths -> exercises bucketing
        )

    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    predictor = HmmrPredictor(
        FakeHmmrModel(), None, smpl, batch_size=2, seq_length=20
    )
    ev_np = Evaluator(predictor, str(tmp_path / "np_out"))
    want = ev_np.run(str(tf_dir), ["3dpw"], split="test")["3dpw"]

    ev_dev = Evaluator(
        predictor, str(tmp_path / "dev_out"), device_metrics=True
    )
    got = ev_dev.run(str(tf_dir), ["3dpw"], split="test")["3dpw"]

    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            got[k], want[k], rtol=5e-3, atol=5e-4, err_msg=k
        )
    # No prediction pkls in device mode; errors caches exist.
    assert not os.path.exists(
        os.path.join(str(tmp_path / "dev_out"), "preds")
    )
    errs_dir = os.path.join(
        str(tmp_path / "dev_out"), "errors", ev_dev.model_tag, "3dpw"
    )
    assert len(os.listdir(errs_dir)) == 2
    # Idempotent re-run off the scalar caches.
    again = ev_dev.run(str(tf_dir), ["3dpw"], split="test")["3dpw"]
    assert again["joints_pa"] == got["joints_pa"]
