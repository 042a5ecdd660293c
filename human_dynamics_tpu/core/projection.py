"""Weak-perspective camera projection and optimal-camera solve.

TPU-first port target: /root/reference/src/tf_smpl/projection.py. The 2x2
linear solve in ``procrustes2d_vis`` is done with a closed-form inverse
(adjugate / determinant) instead of a general matrix inverse so the whole
solve stays element-wise on the VPU and fuses with neighbors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def orth_proj_idrot(x: jax.Array, camera: jax.Array) -> jax.Array:
    """Weak-perspective projection s * (x_xy + t) with identity rotation.

    Args:
        x: (..., K, 3) 3D points (or (..., K, 2); only xy used).
        camera: (..., 3) [scale, tx, ty].

    Returns:
        (..., K, 2) projected points.

    Reference: batch_orth_proj_idrot
    (/root/reference/src/tf_smpl/projection.py:16-29).
    """
    cam = camera[..., None, :]                    # (..., 1, 3)
    x_trans = x[..., :2] + cam[..., 1:]           # (..., K, 2)
    return cam[..., :1] * x_trans


def procrustes2d_vis(x: jax.Array, x_target: jax.Array) -> jax.Array:
    """Closed-form optimal scale+translation mapping x onto visible x_target.

    Solves min_{s,t} sum_k v_k || s * (x_k + t) - x_target_k ||^2 per batch
    element, with the scale clamped to [0.7, 10] (flip-collapse guard, see
    /root/reference/src/tf_smpl/projection.py:92-98).

    Args:
        x: (..., K, 2) or (..., K, 3) predicted 2D points (z dropped).
        x_target: (..., K, 3) target points; last channel is visibility.

    Returns:
        best_cam: (..., 3) [scale, tx, ty]. No gradient is propagated
        (mirrors the stop_gradient at projection.py:43).

    Reference: procrustes2d_vis
    (/root/reference/src/tf_smpl/projection.py:48-104).
    """
    vis = (x_target[..., 2] > 0).astype(x.dtype)          # (..., K)
    vis_vec = vis[..., None]                              # (..., K, 1)
    xt = x_target[..., :2]
    xp = x[..., :2]

    x_vis = vis_vec * xp
    xt_vis = vis_vec * xt
    num_vis = jnp.sum(vis, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)

    mu1 = jnp.sum(x_vis, axis=-2, keepdims=True) / num_vis     # (..., 1, 2)
    mu2 = jnp.sum(xt_vis, axis=-2, keepdims=True) / num_vis
    xmu = vis_vec * (xp - mu1)                                 # (..., K, 2)
    y = vis_vec * (xt - mu2)

    # A = xmu^T xmu + eps*I (2x2), B = xmu^T y (2x2);
    # scale = trace(A^-1 B) / 2 via the closed-form 2x2 inverse.
    a11 = jnp.sum(xmu[..., 0] * xmu[..., 0], axis=-1) + 1e-6
    a12 = jnp.sum(xmu[..., 0] * xmu[..., 1], axis=-1)
    a22 = jnp.sum(xmu[..., 1] * xmu[..., 1], axis=-1) + 1e-6
    b11 = jnp.sum(xmu[..., 0] * y[..., 0], axis=-1)
    b12 = jnp.sum(xmu[..., 0] * y[..., 1], axis=-1)
    b21 = jnp.sum(xmu[..., 1] * y[..., 0], axis=-1)
    b22 = jnp.sum(xmu[..., 1] * y[..., 1], axis=-1)
    det = a11 * a22 - a12 * a12
    # trace(A^-1 B) = (a22*b11 - a12*b21 + a11*b22 - a12*b12) / det
    trace_ainv_b = (a22 * b11 - a12 * b21 - a12 * b12 + a11 * b22) / det
    scale = trace_ainv_b / 2.0                                 # (...,)
    scale = jnp.clip(scale, 0.7, 10.0)

    mu1s = jnp.squeeze(mu1, axis=-2)                           # (..., 2)
    mu2s = jnp.squeeze(mu2, axis=-2)
    trans = mu2s / scale[..., None] - mu1s

    best_cam = jnp.concatenate([scale[..., None], trans], axis=-1)
    return jax.lax.stop_gradient(best_cam)


def orth_proj_optcam(
    x: jax.Array, x_gt: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Project x with the per-example optimal (stop-gradient) camera.

    Args:
        x: (..., K, 2) predicted 2D points.
        x_gt: (..., K, 3) target points with visibility.

    Returns:
        (proj_x (..., K, 2), best_cam (..., 3)).

    Reference: batch_orth_proj_optcam
    (/root/reference/src/tf_smpl/projection.py:32-45).
    """
    best_cam = procrustes2d_vis(x, x_gt)
    return orth_proj_idrot(x, best_cam), best_cam
