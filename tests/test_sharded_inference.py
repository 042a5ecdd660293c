"""Fully-sharded whole-clip inference vs the unsharded full-clip forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.models.hmmr import HmmrModel
from human_dynamics_tpu.models.omega import compute_smpl, split_omega
from human_dynamics_tpu.parallel import make_mesh
from human_dynamics_tpu.parallel.halo import predict_clip_sharded

RNG = np.random.RandomState(23)


@pytest.fixture(scope="module")
def setup():
    model = HmmrModel(feature_dim=64, do_hallucinate=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 64)))
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    return model, variables, smpl


def unsharded_reference(model, variables, smpl, phi):
    out = model.apply(variables, phi[None], train=False)
    present = out.omega_pred[0]
    deltas = {dt: v[0] for dt, v in out.omegas_delta.items()}
    heads = [present] + [deltas[dt] for dt in sorted(deltas)]
    stacked = jnp.stack(heads)
    cams = split_omega(present)[0]
    cams_all = jnp.broadcast_to(cams[None], stacked.shape[:-1] + (3,))
    sm = compute_smpl(
        smpl, stacked, use_optcam=False, cams_override=cams_all
    )
    return {
        "omegas": present,
        "joints": sm.joints[0],
        "kps": sm.kps[0],
        "poses": sm.poses_rot[0],
        "verts": sm.verts[0],
        "omegas_delta_-5": stacked[1],
        "joints_delta_-5": sm.joints[1],
        "omegas_delta_5": stacked[2],
        "joints_delta_5": sm.joints[2],
    }


@pytest.mark.parametrize("n", [64, 91])
def test_sharded_clip_matches_full_forward(setup, n):
    model, variables, smpl = setup
    phi = jnp.asarray(RNG.randn(n, 64).astype(np.float32))
    mesh = make_mesh(8, axis_name="time")

    got = predict_clip_sharded(model, variables, smpl, phi, mesh)
    want = unsharded_reference(model, variables, smpl, phi)

    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=3e-4,
            err_msg=k,
        )
    assert got["omegas"].shape == (n, 85)
    assert got["verts"].shape == (n, 48, 3)


def test_sharded_clip_long(setup):
    """A 1000-frame clip runs as one program over the mesh."""
    model, variables, smpl = setup
    n = 1000
    phi = jnp.asarray(RNG.randn(n, 64).astype(np.float32))
    mesh = make_mesh(8, axis_name="time")
    got = predict_clip_sharded(
        model, variables, smpl, phi, mesh, want_verts=False
    )
    assert got["joints"].shape == (n, 25, 3)
    assert "verts" not in got
    assert bool(jnp.isfinite(got["omegas"]).all())


def test_clips_sharded_2d_matches_per_clip(setup):
    """Batch-of-clips inference on a (4 data x 2 time) mesh == the
    unsharded per-clip forward (the §2.3 DP x SP composition)."""
    from human_dynamics_tpu.parallel import make_mesh_2d
    from human_dynamics_tpu.parallel.halo import predict_clips_sharded_2d

    model, variables, smpl = setup
    b, n = 5, 30     # both axes exercise padding (5->8 clips, 30->30)
    phis = jnp.asarray(RNG.randn(b, n, 64).astype(np.float32))
    mesh = make_mesh_2d(4, 2)

    got = predict_clips_sharded_2d(model, variables, smpl, phis, mesh)
    assert got["omegas"].shape == (b, n, 85)
    assert got["verts"].shape == (b, n, 48, 3)
    for i in range(b):
        want = unsharded_reference(model, variables, smpl, phis[i])
        for k in sorted(want):
            np.testing.assert_allclose(
                np.asarray(got[k][i]), np.asarray(want[k]), atol=3e-4,
                err_msg=f"clip {i} key {k}",
            )


def test_windowed_predictor_sharded_matches_single():
    """DP-sharded windowed inference == single-device windowed inference
    (window groups over the mesh, replicated features)."""
    from tests.test_infer import FakeHmmrModel
    from human_dynamics_tpu.infer.predictor import HmmrPredictor

    smpl = synthetic_smpl_model(num_verts=48, num_kps=19)
    model = FakeHmmrModel()
    pred = HmmrPredictor(model, None, smpl, batch_size=2, seq_length=20)
    phi = RNG.randn(77, 160).astype(np.float32) * 0.5

    single = pred.predict_all_images(phi)
    mesh = make_mesh(8, axis_name="data")
    sharded = pred.predict_all_images_sharded(phi, mesh)

    assert set(single) == set(sharded)
    for k in sorted(single):
        np.testing.assert_allclose(
            sharded[k], single[k], atol=2e-5, err_msg=k
        )
