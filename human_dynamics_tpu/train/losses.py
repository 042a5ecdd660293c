"""Training loss library.

Behavioral parity targets: /root/reference/src/ops.py:14-181. TF's
``tf.losses.absolute_difference`` / ``mean_squared_error`` with weights
use SUM_BY_NONZERO_WEIGHTS reduction: sum(w*l) / count(w != 0). That
denominator (number of *nonzero-weight elements*, after broadcasting) is
replicated exactly here — it changes effective loss scales vs a plain
mean whenever visibility masks are sparse.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from human_dynamics_tpu.core.projection import orth_proj_optcam


def _sum_by_nonzero_weights(losses: jax.Array, weights: jax.Array):
    """TF weighted-loss reduction: sum(w*l) / max(1, #broadcast nonzero w)."""
    weighted = losses * weights
    # Number of nonzero weight *elements* after broadcasting against losses.
    nonzero = jnp.broadcast_to(weights != 0.0, losses.shape).sum()
    return jnp.sum(weighted) / jnp.maximum(nonzero, 1).astype(losses.dtype)


def keypoint_l1_loss(kp_gt: jax.Array, kp_pred: jax.Array) -> jax.Array:
    """Visibility-weighted L1 keypoint loss (ops.py:41-56).

    kp_gt (..., K, 3) with visibility channel; kp_pred (..., K, 2).
    """
    gt = kp_gt.reshape(-1, 3)
    pred = kp_pred.reshape(-1, 2)
    vis = gt[:, 2:3].astype(pred.dtype)
    return _sum_by_nonzero_weights(jnp.abs(gt[:, :2] - pred), vis)


def keypoint_l1_loss_optcam(
    kp_gt: jax.Array, kp_pred: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Solve per-frame optimal cam, then L1 (ops.py:14-38).

    kp_gt (B, T, K, 3); kp_pred (B, T, K, 2).
    Returns (loss, best_cam (B, T, 3)).
    """
    b, t = kp_gt.shape[:2]
    gt = kp_gt.reshape(b * t, -1, 3)
    pred = kp_pred.reshape(b * t, -1, 2)
    pred_sim, best_cam = orth_proj_optcam(pred, gt)
    return keypoint_l1_loss(gt, pred_sim), best_cam.reshape(b, t, 3)


def masked_mse(
    params_gt: jax.Array, params_pred: jax.Array, has_gt: jax.Array
) -> jax.Array:
    """0.5 * weighted MSE with per-row mask (ops.py:87-110)."""
    w = has_gt.astype(params_pred.dtype).reshape(-1, 1)
    sq = (params_gt - params_pred) ** 2
    return 0.5 * _sum_by_nonzero_weights(sq, w)


def align_by_pelvis(joints: jax.Array) -> jax.Array:
    """Subtract hip midpoint; LSP order, hips at idx 3 (L) / 2 (R)
    (ops.py:167-181). joints (..., 14, 3)."""
    pelvis = (joints[..., 3, :] + joints[..., 2, :]) / 2.0
    return joints - pelvis[..., None, :]


def loss_3d(
    poses_gt: jax.Array,
    poses_pred: jax.Array,
    shapes_gt: jax.Array,
    shapes_pred: jax.Array,
    joints_gt: jax.Array,
    joints_pred: jax.Array,
    has_gt3d_smpl: jax.Array,
    has_gt3d_joints: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """3D supervision: pose-rotmat MSE + shape MSE + pelvis-aligned joint
    MSE, each masked by availability (ops.py:59-84).

    poses_*: (N, ...) flattened per-frame rotmats; shapes_*: (N, ...);
    joints_*: (B, T, 14, 3); has_gt3d_*: (N,) flags (already repeated to
    frame granularity by the caller, trainer_sequence_fc.py:806-807).
    """
    n = has_gt3d_smpl.shape[0]
    poses_gt = poses_gt.reshape(n, -1)
    poses_pred = poses_pred.reshape(n, -1)
    shapes_gt = shapes_gt.reshape(n, -1)
    shapes_pred = shapes_pred.reshape(n, -1)

    jg = align_by_pelvis(joints_gt.reshape(-1, joints_gt.shape[-2], 3))
    jp = align_by_pelvis(joints_pred.reshape(-1, joints_pred.shape[-2], 3))

    loss_pose = masked_mse(poses_gt, poses_pred, has_gt3d_smpl)
    loss_shape = masked_mse(shapes_gt, shapes_pred, has_gt3d_smpl)
    # Joints use a (N, 1) mask broadcast over the (N, 42) joint residuals
    # (ops.py:78-82 expands dims).
    loss_joints = masked_mse(
        jg.reshape(n, -1), jp.reshape(n, -1), has_gt3d_joints
    )
    return loss_pose, loss_shape, loss_joints


def beta_smoothness_loss(shapes: jax.Array) -> jax.Array:
    """0.5 * MSE between consecutive betas (e_const; ops.py:113-124 via
    trainer_sequence_fc.py:827-830). shapes (B, T, 10)."""
    prev = shapes[:, :-1]
    curr = shapes[:, 1:]
    return 0.5 * jnp.mean((prev - curr) ** 2)


def shape_prior_loss(shapes: jax.Array) -> jax.Array:
    """L2 prior on betas (ops.py:160-164)."""
    return jnp.mean(shapes**2)


# LSGAN losses (ops.py:127-136); disc outputs (N, 24) logits.

def lsgan_encoder_loss(out_fake: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum((out_fake - 1.0) ** 2, axis=1))


def lsgan_disc_fake_loss(out_fake: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum(out_fake**2, axis=1))


def lsgan_disc_real_loss(out_real: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum((out_real - 1.0) ** 2, axis=1))


def hallucinator_mse(movie_strip: jax.Array, hal_strip: jax.Array):
    """||hal - movie_strip||^2 mean (trainer_sequence_fc.py:843-846).
    Gradient flows into both (matches the reference when phi is
    precomputed; cut movie_strip's grad upstream if ever unfrozen)."""
    return jnp.mean((movie_strip - hal_strip) ** 2)
