"""Metric-library tests vs independent per-frame numpy oracles
(SURVEY.md §4 implication (1) for the metric functions)."""

import numpy as np
import pytest

from human_dynamics_tpu.eval import (
    compute_accel,
    compute_error_3d,
    compute_error_accel,
    compute_error_kp,
    compute_error_verts,
    compute_opt_cam_with_vis,
    compute_similarity_transform,
)
from human_dynamics_tpu.eval.metrics import (
    compute_similarity_transform_batch,
    mean_of_dict_values,
)

RNG = np.random.RandomState(11)


def _loop_procrustes(s1, s2):
    """Reference-style per-frame Procrustes oracle (eval_util.py:177-232)."""
    out = []
    for a, b in zip(s1, s2):
        a, b = a.T, b.T  # 3 x K
        mu1 = a.mean(axis=1, keepdims=True)
        mu2 = b.mean(axis=1, keepdims=True)
        x1 = a - mu1
        x2 = b - mu2
        var1 = np.sum(x1**2)
        k = x1.dot(x2.T)
        u, s, vh = np.linalg.svd(k)
        v = vh.T
        z = np.eye(u.shape[0])
        z[-1, -1] *= np.sign(np.linalg.det(u.dot(v.T)))
        r = v.dot(z.dot(u.T))
        scale = np.trace(r.dot(k)) / var1
        t = mu2 - scale * (r.dot(mu1))
        out.append((scale * r.dot(a) + t).T)
    return np.array(out)


def test_accel_constant_velocity_is_zero():
    t = np.arange(10)[:, None, None]
    joints = np.tile(t * 0.1, (1, 14, 3)).astype(np.float64)
    acc = compute_accel(joints)
    np.testing.assert_allclose(acc, 0.0, atol=1e-12)
    assert acc.shape == (8,)


def test_accel_known_value():
    # x(t) = t^2 -> second difference = 2 everywhere, per coordinate.
    t = np.arange(6, dtype=np.float64)[:, None, None] ** 2
    joints = np.tile(t, (1, 3, 3))
    acc = compute_accel(joints)
    np.testing.assert_allclose(acc, 2 * np.sqrt(3), atol=1e-12)


def test_error_accel_masking():
    gt = RNG.randn(10, 14, 3)
    pred = RNG.randn(10, 14, 3)
    full = compute_error_accel(gt, pred)
    assert full.shape == (8,)
    vis = np.ones(10, bool)
    vis[4] = False  # kills accel frames 2, 3, 4
    masked = compute_error_accel(gt, pred, vis)
    assert masked.shape == (5,)
    np.testing.assert_allclose(masked, full[[0, 1, 5, 6, 7]])


def test_procrustes_recovers_transform():
    pts = RNG.randn(20, 14, 3)
    from human_dynamics_tpu.core.rotations import rodrigues
    import jax.numpy as jnp

    rot = np.asarray(rodrigues(jnp.asarray(
        RNG.randn(20, 3).astype(np.float32))))
    scale = RNG.uniform(0.5, 2.0, (20, 1, 1))
    trans = RNG.randn(20, 1, 3)
    target = scale * np.einsum("nij,nkj->nki", rot, pts) + trans

    aligned = compute_similarity_transform_batch(pts, target)
    np.testing.assert_allclose(aligned, target, atol=1e-4)


def test_procrustes_batch_matches_loop_oracle():
    s1 = RNG.randn(12, 14, 3)
    s2 = RNG.randn(12, 14, 3)
    got = compute_similarity_transform_batch(s1, s2)
    want = _loop_procrustes(s1, s2)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_procrustes_single_api():
    s1 = RNG.randn(14, 3)
    s2 = RNG.randn(14, 3)
    got = compute_similarity_transform(s1, s2)
    want = _loop_procrustes(s1[None], s2[None])[0]
    np.testing.assert_allclose(got, want, atol=1e-10)
    # (3, K) layout round-trips too.
    got_t = compute_similarity_transform(s1.T, s2.T)
    np.testing.assert_allclose(got_t, want.T, atol=1e-10)


def test_error_3d_perfect_prediction():
    gt = RNG.randn(5, 14, 3)
    err, err_pa = compute_error_3d(gt, gt.copy())
    np.testing.assert_allclose(err, 0.0, atol=1e-10)
    np.testing.assert_allclose(err_pa, 0.0, atol=1e-8)


def test_error_3d_translation_invariance():
    gt = RNG.randn(5, 14, 3)
    pred = gt + np.array([10.0, -3.0, 2.0])  # global translation
    err, err_pa = compute_error_3d(gt, pred)
    np.testing.assert_allclose(err, 0.0, atol=1e-8)   # pelvis-aligned
    np.testing.assert_allclose(err_pa, 0.0, atol=1e-8)


def test_error_3d_scale_invariance_only_pa():
    gt = RNG.randn(5, 14, 3)
    pred = gt * 1.5
    err, err_pa = compute_error_3d(gt, pred)
    assert np.mean(err) > 1e-3
    np.testing.assert_allclose(err_pa, 0.0, atol=1e-8)


def test_error_3d_vis_filter():
    gt = RNG.randn(6, 14, 3)
    pred = RNG.randn(6, 14, 3)
    vis = np.array([1, 0, 1, 0, 1, 1], bool)
    err, err_pa = compute_error_3d(gt, pred, vis)
    assert len(err) == 4 and len(err_pa) == 4
    err_all, _ = compute_error_3d(gt, pred)
    np.testing.assert_allclose(err, np.asarray(err_all)[vis])


def test_error_kp_perfect_and_pck():
    kp = RNG.rand(4, 25, 2)
    gt = np.concatenate([kp, np.ones((4, 25, 1))], axis=2)
    e, e_pa, pck = compute_error_kp(gt, kp)
    np.testing.assert_allclose(e, 0.0, atol=1e-10)
    # The 1e-6 ridge term in the opt-cam solve leaves ~1e-6 residual.
    np.testing.assert_allclose(e_pa, 0.0, atol=1e-5)
    np.testing.assert_allclose(pck, 1.0)


def test_error_kp_nan_when_too_few_visible():
    gt = np.zeros((2, 25, 3))
    gt[0, :5, 2] = 1  # below min_visible=6
    gt[1, :10, 2] = 1
    pred = RNG.rand(2, 25, 2)
    e, e_pa, pck = compute_error_kp(gt, pred)
    assert np.isnan(e[0]) and np.isnan(e_pa[0]) and np.isnan(pck[0])
    assert not np.isnan(e[1])


def test_opt_cam_with_vis_recovers():
    got = RNG.randn(25, 2)
    s, t = 1.7, np.array([0.3, -0.2])
    want = s * (got + t)
    vis = np.ones(25, bool)
    new_got, cam = compute_opt_cam_with_vis(got, want, vis)
    np.testing.assert_allclose(cam[0], s, rtol=1e-6)
    np.testing.assert_allclose(cam[1:], t, atol=1e-6)
    np.testing.assert_allclose(new_got, want, atol=1e-6)


def test_error_verts():
    gt = RNG.randn(3, 100, 3)
    pred = gt + 0.1
    err = compute_error_verts(gt, pred)
    np.testing.assert_allclose(err, 0.1 * np.sqrt(3), rtol=1e-6)


def test_mean_of_dict_values():
    d = {"a": [[1.0, 2.0], [3.0]], "b": [[np.nan, 4.0]]}
    mean_of_dict_values(d)
    assert d["a"] == pytest.approx(round((1.5 + 3.0) / 2, 5))
    assert d["b"] == pytest.approx(4.0)
