"""Property tests for tube augmentation (SURVEY.md §7 hard part 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core.rotations import rodrigues
from human_dynamics_tpu.data.augment import (
    COCO25_FLIP_INDS,
    TubeAugmentParams,
    augment_tube,
    bounded_random_walk,
    flip_kps,
    reflect_joints3d,
    reflect_pose,
    rotate_global_pose,
    sample_tube_params,
)

RNG = np.random.RandomState(9)


def test_bounded_random_walk_stays_in_bounds():
    key = jax.random.PRNGKey(0)
    walk = bounded_random_walk(key, -20.0, 21.0, -3.0, 4.0, t=500, dim=2)
    w = np.asarray(walk)
    assert w.shape == (500, 2)
    assert w.min() >= -20.0 and w.max() <= 21.0
    # Step sizes bounded by the reflection: |delta| <= delta_max window.
    deltas = np.abs(np.diff(w, axis=0))
    assert deltas.max() <= 8.0  # 2x delta bound worst case at a reflection


def test_bounded_random_walk_degenerate_range():
    walk = bounded_random_walk(
        jax.random.PRNGKey(0), 5.0, 5.0, -1.0, 1.0, t=10
    )
    np.testing.assert_array_equal(np.asarray(walk), 5.0)


def test_bounded_random_walk_integer_walk():
    walk = bounded_random_walk(
        jax.random.PRNGKey(1), -20, 21, -3, 4, t=100, dim=2, integer=True
    )
    w = np.asarray(walk)
    np.testing.assert_array_equal(w, np.round(w))
    # The reflection fold can touch maxval at the boundary (same in the
    # reference formula, data_utils.py:835).
    assert w.min() >= -20 and w.max() <= 21


def test_flip_inds_are_involutions():
    assert np.array_equal(
        COCO25_FLIP_INDS[COCO25_FLIP_INDS], np.arange(25)
    )


def test_reflect_pose_involution_and_global_fixed():
    pose = RNG.randn(72).astype(np.float32)
    ref = np.asarray(reflect_pose(jnp.asarray(pose)))
    # Double reflection = identity.
    np.testing.assert_allclose(
        np.asarray(reflect_pose(jnp.asarray(ref))), pose, atol=1e-6
    )
    # Global rotation x kept, y/z negated (sign table [1,-1,-1]).
    np.testing.assert_allclose(
        ref[:3], pose[:3] * np.array([1, -1, -1]), atol=1e-6
    )


def test_reflect_pose_swap_table_derivation():
    """Re-derive the 72-D swap table from the SMPL L/R joint pairs the
    reference documents (data_utils.py:646-661) and compare."""
    from human_dynamics_tpu.data.augment import POSE_SWAP_INDS

    right = [11, 8, 5, 2, 14, 17, 19, 21, 23]
    left = [10, 7, 4, 1, 13, 16, 18, 20, 22]
    new_map = {}
    for r_id, l_id in zip(right, left):
        for axis in range(3):
            new_map[r_id * 3 + axis] = l_id * 3 + axis
            new_map[l_id * 3 + axis] = r_id * 3 + axis
    for a_id in range(24):
        if a_id not in right + left:
            for axis in range(3):
                new_map[a_id * 3 + axis] = a_id * 3 + axis
    want = np.array([new_map[k] for k in sorted(new_map)])
    np.testing.assert_array_equal(POSE_SWAP_INDS, want)


def test_reflect_joints3d():
    joints = RNG.randn(14, 3).astype(np.float32)
    ref = np.asarray(reflect_joints3d(jnp.asarray(joints)))
    assert ref.shape == (14, 3)
    # Mean-centered output.
    np.testing.assert_allclose(ref.mean(axis=0), 0.0, atol=1e-6)


def test_flip_kps_geometry():
    kps = np.zeros((25, 3), np.float32)
    kps[:, 0] = np.arange(25)
    kps[:, 1] = 7.0
    kps[:, 2] = 1.0
    out = np.asarray(flip_kps(jnp.asarray(kps), 224.0))
    # x mirrored then L/R swapped; y and vis unchanged.
    want_x = (224.0 - np.arange(25) - 1)[COCO25_FLIP_INDS]
    np.testing.assert_allclose(out[:, 0], want_x, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], 7.0)
    np.testing.assert_allclose(out[:, 2], 1.0)


def test_rotate_global_pose_identity():
    pose = RNG.randn(72).astype(np.float32) * 0.5
    out = np.asarray(
        rotate_global_pose(jnp.asarray(pose), jnp.asarray(0.0))
    )
    np.testing.assert_allclose(out[3:], pose[3:], atol=1e-6)
    r_orig = np.asarray(rodrigues(jnp.asarray(pose[:3])[None]))[0]
    r_new = np.asarray(rodrigues(jnp.asarray(out[:3])[None]))[0]
    np.testing.assert_allclose(r_new, r_orig, atol=1e-5)


def test_rotate_global_pose_composition():
    pose = RNG.randn(72).astype(np.float32) * 0.5
    theta = 0.7
    out = np.asarray(
        rotate_global_pose(jnp.asarray(pose), jnp.asarray(theta))
    )
    rz = np.array([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ])
    r_orig = np.asarray(rodrigues(jnp.asarray(pose[:3])[None]))[0]
    r_new = np.asarray(rodrigues(jnp.asarray(out[:3])[None]))[0]
    np.testing.assert_allclose(r_new, rz.T @ r_orig, atol=1e-4)


def _tube_inputs(t=4, h=300, w=300, k=25):
    images = RNG.rand(t, h, w, 3).astype(np.float32)
    labels = np.zeros((t, 3, k), np.float32)
    labels[:, 0] = RNG.uniform(100, 200, (t, k))
    labels[:, 1] = RNG.uniform(100, 200, (t, k))
    labels[:, 2] = 1.0
    centers = np.full((t, 2), 150, np.float32)
    poses = RNG.randn(t, 72).astype(np.float32) * 0.3
    gt3ds = RNG.randn(t, 14, 3).astype(np.float32)
    return images, labels, centers, poses, gt3ds


def test_augment_tube_identity_params():
    """Zero jitter, no flip: the crop is the centered 224 window and kps
    map to the right normalized positions."""
    images, labels, centers, poses, gt3ds = _tube_inputs()
    t = len(images)
    params = TubeAugmentParams(
        trans=jnp.zeros((t, 2)),
        scale=jnp.zeros((t,)),
        rotate=jnp.zeros((t,)),
        flip=jnp.asarray(False),
    )
    crops, out_labels, out_poses, out_gt3ds = augment_tube(
        jnp.asarray(images), jnp.asarray(labels), jnp.asarray(centers),
        jnp.asarray(poses), jnp.asarray(gt3ds), params,
    )
    assert crops.shape == (t, 224, 224, 3)
    # Center crop: pixel (112,112) of crop == source (150,150), in [-1,1].
    src = (images[:, 150, 150] - 0.5) * 2
    np.testing.assert_allclose(
        np.asarray(crops[:, 112, 112]), src, atol=0.02
    )
    # Kp mapping: source x=150 -> crop 112 -> normalized 0.
    want_x = 2.0 * ((labels[:, 0] - 150 + 112) / 224.0) - 1.0
    np.testing.assert_allclose(
        np.asarray(out_labels[:, 0]), want_x, atol=1e-5
    )
    # Labels untouched.
    np.testing.assert_allclose(np.asarray(out_poses), poses, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_gt3ds), gt3ds, atol=1e-6)


def test_augment_tube_flip_consistency():
    """With flip on, a kp at crop x maps to 224 - x - 1 with L/R swap."""
    images, labels, centers, poses, gt3ds = _tube_inputs()
    t = len(images)
    params = TubeAugmentParams(
        trans=jnp.zeros((t, 2)),
        scale=jnp.zeros((t,)),
        rotate=jnp.zeros((t,)),
        flip=jnp.asarray(True),
    )
    crops, out_labels, out_poses, out_gt3ds = augment_tube(
        jnp.asarray(images), jnp.asarray(labels), jnp.asarray(centers),
        jnp.asarray(poses), jnp.asarray(gt3ds), params,
    )
    crop_x = labels[:, 0] - 150 + 112
    flipped_x = (224 - crop_x - 1)[:, COCO25_FLIP_INDS]
    want = 2.0 * (flipped_x / 224.0) - 1.0
    np.testing.assert_allclose(np.asarray(out_labels[:, 0]), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_poses), np.asarray(reflect_pose(jnp.asarray(poses))),
        atol=1e-6,
    )
    # Image mirrored: crop[.., x] == unflipped crop[.., 223-x].
    params_nf = params._replace(flip=jnp.asarray(False))
    crops_nf, *_ = augment_tube(
        jnp.asarray(images), jnp.asarray(labels), jnp.asarray(centers),
        jnp.asarray(poses), jnp.asarray(gt3ds), params_nf,
    )
    np.testing.assert_allclose(
        np.asarray(crops), np.asarray(crops_nf)[:, :, ::-1], atol=1e-6
    )


def test_augment_tube_scale_moves_kps():
    images, labels, centers, poses, gt3ds = _tube_inputs()
    t = len(images)
    params = TubeAugmentParams(
        trans=jnp.zeros((t, 2)),
        scale=jnp.full((t,), 0.3),
        rotate=jnp.zeros((t,)),
        flip=jnp.asarray(False),
    )
    _, out_labels, _, _ = augment_tube(
        jnp.asarray(images), jnp.asarray(labels), jnp.asarray(centers),
        jnp.asarray(poses), jnp.asarray(gt3ds), params,
    )
    sf = 2.0 ** 0.3
    crop_x = labels[:, 0] * sf - (sf * 150 - 112)
    want = 2.0 * (crop_x / 224.0) - 1.0
    np.testing.assert_allclose(
        np.asarray(out_labels[:, 0]), want, atol=1e-4
    )


def test_augment_tube_jit_and_sampling():
    images, labels, centers, poses, gt3ds = _tube_inputs()
    t = len(images)
    key = jax.random.PRNGKey(4)

    @jax.jit
    def run(key):
        params = sample_tube_params(key, t)
        return augment_tube(
            jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(centers), jnp.asarray(poses),
            jnp.asarray(gt3ds), params,
        )

    crops, out_labels, out_poses, out_gt3ds = run(key)
    assert crops.shape == (t, 224, 224, 3)
    assert np.asarray(crops).min() >= -1.0 - 1e-5
    assert np.asarray(crops).max() <= 1.0 + 1e-5
    assert bool(jnp.isfinite(out_labels).all())
    # Different keys -> different augmentations.
    crops2 = run(jax.random.PRNGKey(5))[0]
    assert not np.allclose(np.asarray(crops), np.asarray(crops2))
