"""Batched rotation kernels (axis-angle <-> rotation matrix, pose deltas).

TPU-first re-design of the reference's rotation utilities
(/root/reference/src/tf_smpl/batch_lbs.py:15-131 and
/root/reference/src/util/tf_ops.py:11-29). Everything here is shape-static,
vectorized over arbitrary leading batch dims, and fuses into surrounding
XLA graphs (no scatters, no python loops over the batch).

Numerical contract notes (required for checkpoint-level parity):
- ``rodrigues`` reproduces the reference's epsilon guard *exactly*: the
  reference computes ``angle = ||theta + 1e-8||`` — i.e. 1e-8 is added to
  every *component* before the norm, not to the norm itself
  (batch_lbs.py:48). We keep that quirk so outputs match bit-for-bit in
  float32.
- ``rot_to_axis_angle`` mirrors batch_lbs.py:63-105 including the
  theta < 1e-5 small-angle branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew_symmetric(vec: jax.Array) -> jax.Array:
    """Skew-symmetric (cross-product) matrices for a batch of 3-vectors.

    Args:
        vec: (..., 3).

    Returns:
        (..., 3, 3) with [[0, -z, y], [z, 0, -x], [-y, x, 0]].

    Reference: batch_skew (/root/reference/src/tf_smpl/batch_lbs.py:15-39),
    re-done without scatter_nd: a stack + reshape lowers to pure register
    shuffles on the VPU instead of a serialized scatter.
    """
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return rows.reshape(vec.shape[:-1] + (3, 3))


def rodrigues(theta: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix (Rodrigues' formula), batched.

    Args:
        theta: (..., 3) axis-angle vectors.

    Returns:
        (..., 3, 3) rotation matrices.

    Reference: batch_rodrigues (/root/reference/src/tf_smpl/batch_lbs.py:42-60).
    Keeps the reference's exact guard ``angle = ||theta + 1e-8||``.
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)  # (..., 1)
    r = theta / angle                                              # (..., 3)
    cos = jnp.cos(angle)[..., None]                                # (..., 1, 1)
    sin = jnp.sin(angle)[..., None]
    outer = r[..., :, None] * r[..., None, :]                      # (..., 3, 3)
    eye = jnp.eye(3, dtype=theta.dtype)
    return cos * eye + (1.0 - cos) * outer + sin * skew_symmetric(r)


def rot_to_axis_angle(rot: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle, batched.

    Args:
        rot: (..., 3, 3).

    Returns:
        (..., 3) axis-angle vectors.

    Reference: batch_rot2aa (/root/reference/src/tf_smpl/batch_lbs.py:63-105).
    """
    cos = 0.5 * (jnp.trace(rot, axis1=-2, axis2=-1) - 1.0)
    cos = jnp.clip(cos, -1.0, 1.0)
    theta = jnp.arccos(cos)  # (...,)

    m21 = rot[..., 2, 1] - rot[..., 1, 2]
    m02 = rot[..., 0, 2] - rot[..., 2, 0]
    m10 = rot[..., 1, 0] - rot[..., 0, 1]
    denom = jnp.sqrt(m21 * m21 + m02 * m02 + m10 * m10)
    small = jnp.abs(theta) < 1e-5
    # Where small, the reference returns the *unnormalized* components
    # (which are ~0 anyway); replicate that.
    safe_denom = jnp.where(small, 1.0, denom)
    axis = jnp.stack(
        [
            jnp.where(small, m21, m21 / safe_denom),
            jnp.where(small, m02, m02 / safe_denom),
            jnp.where(small, m10, m10 / safe_denom),
        ],
        axis=-1,
    )
    return theta[..., None] * axis


def lrotmin(theta: jax.Array) -> jax.Array:
    """72-D pose -> 207-D pose-blendshape feature (R[1:] - I, flattened).

    Args:
        theta: (..., 72) axis-angle incl. the global rotation (dropped).

    Returns:
        (..., 207).

    Reference: batch_lrotmin (/root/reference/src/tf_smpl/batch_lbs.py:
    108-130; the reference notes it inlines this in SMPL.__call__ to
    reuse R — smpl_forward here does the same, this standalone exists
    for parity of the public surface).
    """
    lead = theta.shape[:-1]
    rots = rodrigues(theta[..., 3:].reshape(lead + (23, 3)))
    return (rots - jnp.eye(3, dtype=theta.dtype)).reshape(lead + (207,))


def rotation_deltas(rot_prev: jax.Array, rot_curr: jax.Array) -> jax.Array:
    """Frame-to-frame rotation change R_prev @ R_curr^T.

    Args:
        rot_prev: (..., 3, 3) rotations at t.
        rot_curr: (..., 3, 3) rotations at t+1.

    Returns:
        (..., 3, 3) delta rotations.

    Reference: compute_deltas_batched
    (/root/reference/src/util/tf_ops.py:11-29, duplicated at
    /root/reference/src/ops.py:139-157).
    """
    return jnp.einsum("...ij,...kj->...ik", rot_prev, rot_curr)
