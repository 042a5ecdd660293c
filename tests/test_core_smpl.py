"""Golden-value tests for the SMPL numeric core vs an independent numpy
oracle (SURVEY.md §4 implication (1))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import (
    rodrigues,
    rot_to_axis_angle,
    rotation_deltas,
    skew_symmetric,
    smpl_forward,
    synthetic_smpl_model,
    orth_proj_idrot,
    procrustes2d_vis,
    orth_proj_optcam,
)
from human_dynamics_tpu.core.smpl import global_rigid_transformation

from tests.reference_numpy import (
    np_rodrigues,
    np_global_rigid_transformation,
    np_smpl_forward,
    np_orth_proj_idrot,
    np_procrustes2d_vis,
    model_to_np,
)

RNG = np.random.RandomState(42)


def test_skew_symmetric():
    v = RNG.randn(17, 3).astype(np.float32)
    got = np.asarray(skew_symmetric(jnp.asarray(v)))
    for i in range(17):
        x, y, z = v[i]
        want = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], np.float32)
        np.testing.assert_allclose(got[i], want, rtol=1e-6)
    # cross-product property: skew(a) @ b == a x b
    a, b = RNG.randn(3).astype(np.float32), RNG.randn(3).astype(np.float32)
    got = np.asarray(skew_symmetric(jnp.asarray(a[None])))[0] @ b
    np.testing.assert_allclose(got, np.cross(a, b), rtol=1e-5)


def test_rodrigues_matches_reference():
    theta = RNG.randn(64, 3).astype(np.float32) * 2.0
    got = np.asarray(rodrigues(jnp.asarray(theta)))
    want = np_rodrigues(theta)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_rodrigues_zero_angle_guard():
    theta = np.zeros((4, 3), np.float32)
    got = np.asarray(rodrigues(jnp.asarray(theta)))
    want = np_rodrigues(theta)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.all(np.isfinite(got))


def test_rodrigues_valid_rotations():
    theta = RNG.randn(32, 3).astype(np.float32)
    r = np.asarray(rodrigues(jnp.asarray(theta)))
    ident = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(ident, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_rot_to_axis_angle_roundtrip():
    # Angles away from 0 and pi so the representation is unique.
    axis = RNG.randn(40, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = RNG.uniform(0.1, np.pi - 0.1, (40, 1))
    theta = (axis * angle).astype(np.float32)
    r = rodrigues(jnp.asarray(theta))
    back = np.asarray(rot_to_axis_angle(r))
    np.testing.assert_allclose(back, theta, atol=1e-4)


def test_rot_to_axis_angle_identity():
    r = jnp.tile(jnp.eye(3), (3, 1, 1))
    aa = np.asarray(rot_to_axis_angle(r))
    np.testing.assert_allclose(aa, 0.0, atol=1e-6)
    assert np.all(np.isfinite(aa))


def test_rotation_deltas():
    r1 = np.asarray(rodrigues(jnp.asarray(RNG.randn(5, 3).astype(np.float32))))
    r2 = np.asarray(rodrigues(jnp.asarray(RNG.randn(5, 3).astype(np.float32))))
    got = np.asarray(rotation_deltas(jnp.asarray(r1), jnp.asarray(r2)))
    want = np.einsum("nij,nkj->nik", r1, r2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # delta @ r2 == r1
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", got, r2), r1, atol=1e-5
    )


def test_fk_matches_reference_sequential():
    model = synthetic_smpl_model(num_verts=64)
    n = 7
    theta = (RNG.randn(n, 24, 3) * 0.4).astype(np.float32)
    joints = RNG.randn(n, 24, 3).astype(np.float32)
    rots = np.asarray(rodrigues(jnp.asarray(theta)))

    j_posed, world_rot, rel_t = global_rigid_transformation(
        jnp.asarray(rots), jnp.asarray(joints), model.parents
    )
    want_j, want_a = np_global_rigid_transformation(
        rots, joints, model.parents
    )
    np.testing.assert_allclose(np.asarray(j_posed), want_j, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(world_rot), want_a[:, :, :3, :3], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(rel_t), want_a[:, :, :3, 3], atol=1e-5)


def test_fk_rotate_base():
    model = synthetic_smpl_model(num_verts=16)
    theta = (RNG.randn(2, 24, 3) * 0.3).astype(np.float32)
    joints = RNG.randn(2, 24, 3).astype(np.float32)
    rots = np.asarray(rodrigues(jnp.asarray(theta)))
    j_posed, _, _ = global_rigid_transformation(
        jnp.asarray(rots), jnp.asarray(joints), model.parents, rotate_base=True
    )
    want_j, _ = np_global_rigid_transformation(
        rots, joints, model.parents, rotate_base=True
    )
    np.testing.assert_allclose(np.asarray(j_posed), want_j, atol=1e-5)


@pytest.mark.parametrize("n", [1, 13])
def test_smpl_forward_matches_reference(n):
    model = synthetic_smpl_model(num_verts=128)
    beta = (RNG.randn(n, 10) * 0.5).astype(np.float32)
    theta = (RNG.randn(n, 72) * 0.3).astype(np.float32)

    out = smpl_forward(model, jnp.asarray(beta), jnp.asarray(theta))
    want = np_smpl_forward(model_to_np(model), beta, theta)

    np.testing.assert_allclose(np.asarray(out.rots), want["rots"], atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.j_posed), want["j_posed"], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.verts), want["verts"], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.joints), want["joints"], atol=1e-4
    )


def test_smpl_forward_jit_and_grad():
    model = synthetic_smpl_model(num_verts=32)

    @jax.jit
    def loss_fn(beta, theta):
        out = smpl_forward(model, beta, theta)
        return jnp.sum(out.verts**2) + jnp.sum(out.joints**2)

    beta = jnp.asarray(RNG.randn(3, 10).astype(np.float32) * 0.1)
    theta = jnp.asarray(RNG.randn(3, 72).astype(np.float32) * 0.1)
    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(beta, theta)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)
    # gradient at theta=0 must be finite (the 1e-8 guard).
    _, g0 = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.zeros((3, 10)), jnp.zeros((3, 72))
    )
    assert all(np.all(np.isfinite(np.asarray(g))) for g in g0)


def test_smpl_lsp_joint_type():
    model = synthetic_smpl_model(num_verts=32, num_kps=19)
    lsp = model.with_joint_type("lsp")
    assert lsp.num_kps == 14
    beta = jnp.zeros((2, 10))
    theta = jnp.zeros((2, 72))
    out_full = smpl_forward(model, beta, theta)
    out_lsp = smpl_forward(lsp, beta, theta)
    np.testing.assert_allclose(
        np.asarray(out_lsp.joints), np.asarray(out_full.joints)[:, :14],
        atol=1e-6,
    )


def test_orth_proj_idrot():
    x = RNG.randn(6, 19, 3).astype(np.float32)
    cam = np.abs(RNG.randn(6, 3)).astype(np.float32)
    got = np.asarray(orth_proj_idrot(jnp.asarray(x), jnp.asarray(cam)))
    want = np_orth_proj_idrot(x, cam)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_procrustes2d_recovers_camera():
    # Generate gt = s*(x + t) for known (s, t); solver must recover it.
    x = RNG.randn(8, 25, 2).astype(np.float32)
    s = RNG.uniform(0.8, 3.0, (8, 1, 1)).astype(np.float32)
    t = RNG.randn(8, 1, 2).astype(np.float32)
    gt_xy = s * (x + t)
    vis = np.ones((8, 25, 1), np.float32)
    gt = np.concatenate([gt_xy, vis], axis=2)
    cam = np.asarray(procrustes2d_vis(jnp.asarray(x), jnp.asarray(gt)))
    np.testing.assert_allclose(cam[:, 0], s[:, 0, 0], rtol=1e-4)
    np.testing.assert_allclose(cam[:, 1:], t[:, 0], atol=1e-3)


def test_procrustes2d_matches_reference_with_vis():
    x = RNG.randn(10, 25, 2).astype(np.float32)
    gt = RNG.randn(10, 25, 3).astype(np.float32)
    gt[:, :, 2] = (RNG.rand(10, 25) > 0.3).astype(np.float32)
    gt[0, :, 2] = 1.0
    got = np.asarray(procrustes2d_vis(jnp.asarray(x), jnp.asarray(gt)))
    want = np_procrustes2d_vis(x, gt)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_procrustes_scale_clamped():
    # A flipped prediction drives optimal scale to ~0; clamp at 0.7.
    x = RNG.randn(4, 25, 2).astype(np.float32)
    gt_xy = -0.01 * x
    gt = np.concatenate([gt_xy, np.ones((4, 25, 1), np.float32)], axis=2)
    cam = np.asarray(procrustes2d_vis(jnp.asarray(x), jnp.asarray(gt)))
    assert np.all(cam[:, 0] >= 0.7 - 1e-6)


def test_optcam_stops_gradient():
    x = jnp.asarray(RNG.randn(4, 25, 2).astype(np.float32))
    gt = jnp.asarray(
        np.concatenate(
            [RNG.randn(4, 25, 2), np.ones((4, 25, 1))], axis=2
        ).astype(np.float32)
    )

    def f(x):
        proj, cam = orth_proj_optcam(x, gt)
        return jnp.sum(cam**2)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)


# ---------------------------------------------------------------------------
# chumpy-pickle converter (convert_smpl_pkl). The original SMPL pkl is a
# licensed asset; these build a bit-identical *layout* (chumpy-wrapped
# arrays under module "chumpy.ch", scipy-sparse-like J_regressor,
# kintree_table) with synthetic values and round-trip it.
# ---------------------------------------------------------------------------


class _SparseLike:
    """Minimal scipy-sparse stand-in (has .toarray, pickles fine)."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)

    def toarray(self):
        return self._arr


def _make_chumpy_pkl(path, rng, sparse_jreg=False):
    import pickle
    import sys
    import types

    class Ch:
        def __init__(self, x):
            self.x = np.asarray(x)

    mod = types.ModuleType("chumpy.ch")
    mod.Ch = Ch
    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    pkg = types.ModuleType("chumpy")
    pkg.ch = mod
    pkg.Ch = Ch
    sys.modules.setdefault("chumpy", pkg)
    sys.modules["chumpy.ch"] = mod

    SparseLike = _SparseLike
    v = 20
    from human_dynamics_tpu.core.smpl import (
        NUM_JOINTS, NUM_POSE_BASIS, SMPL_PARENTS,
    )

    weights = rng.rand(v, NUM_JOINTS)
    weights /= weights.sum(axis=1, keepdims=True)  # real SMPL invariant
    raw = {
        "v_template": rng.randn(v, 3),
        "shapedirs": rng.randn(v, 3, 10) * 0.03,
        "posedirs": rng.randn(v, 3, NUM_POSE_BASIS) * 0.01,
        "J_regressor": rng.rand(NUM_JOINTS, v),
        "weights": weights,
        "cocoplus_regressor": rng.rand(19, v),
        "kintree_table": np.stack([
            np.asarray(
                [p if p >= 0 else 2**32 - 1 for p in SMPL_PARENTS],
                np.int64,
            ),
            np.arange(NUM_JOINTS),
        ]),
        "f": rng.randint(0, v, (2 * v, 3)).astype(np.int64),
    }
    dd = {
        "v_template": Ch(raw["v_template"]),
        "shapedirs": Ch(raw["shapedirs"]),
        "posedirs": Ch(raw["posedirs"]),
        "J_regressor": (
            SparseLike(raw["J_regressor"]) if sparse_jreg
            else raw["J_regressor"]
        ),
        "weights": Ch(raw["weights"]),
        "cocoplus_regressor": raw["cocoplus_regressor"],
        "kintree_table": raw["kintree_table"],
        "f": raw["f"],
    }
    with open(path, "wb") as f:
        pickle.dump(dd, f, protocol=2)
    return raw


@pytest.mark.parametrize("sparse_jreg", [False, True])
def test_convert_smpl_pkl_roundtrip(tmp_path, sparse_jreg):
    from human_dynamics_tpu.core.smpl import (
        convert_smpl_pkl, load_smpl_model, smpl_forward,
    )

    rng = np.random.RandomState(11)
    pkl = str(tmp_path / "neutral_smpl.pkl")
    raw = _make_chumpy_pkl(pkl, rng, sparse_jreg=sparse_jreg)
    npz = str(tmp_path / "smpl.npz")
    convert_smpl_pkl(pkl, npz)

    dd = np.load(npz)
    np.testing.assert_allclose(
        dd["v_template"], raw["v_template"].astype(np.float32)
    )
    np.testing.assert_allclose(
        dd["shapedirs"],
        raw["shapedirs"].reshape(-1, 10).T.astype(np.float32),
    )
    np.testing.assert_allclose(
        dd["j_regressor"], raw["J_regressor"].T.astype(np.float32)
    )
    np.testing.assert_allclose(
        dd["cocoplus_regressor"],
        raw["cocoplus_regressor"].T.astype(np.float32),
    )

    # Loads (both from npz and converting the pkl in-memory) and runs.
    model = load_smpl_model(npz)
    model2 = load_smpl_model(pkl)
    assert model.parents == model2.parents
    assert model.parents[0] == -1  # 2**32-1 root marker normalized
    pose = jnp.zeros((2, 24, 3))
    beta = jnp.zeros((2, 10))
    fwd = smpl_forward(model, beta, pose)
    assert fwd.verts.shape == (2, 20, 3)
    assert fwd.joints.shape == (2, 19, 3)
    np.testing.assert_allclose(
        np.asarray(fwd.verts[0]), raw["v_template"], atol=1e-5
    )
