"""Omega (cam/pose/shape) containers as typed pytrees.

TPU-first replacement for the reference's stateful OmegasPred/OmegasGt
accumulators (/root/reference/src/omega.py). The reference's
``tf.concat``-append pattern (omega.py:237-261) is a TF-1 graph idiom; in
JAX every prediction head simply returns arrays, and the SMPL pass for
*all* heads is one batched call (the reference calls compute_smpl once per
head; here heads are stacked on a leading axis first — the main fusion
lever identified in SURVEY.md §7 hard part 3).

Dimensional contract: Omega raw = 85 = [cam 3 | pose 24*3 | shape 10]
(omega.py:231-234).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from human_dynamics_tpu.core.projection import orth_proj_idrot
from human_dynamics_tpu.core.rotations import rodrigues
from human_dynamics_tpu.core.smpl import SmplModel, smpl_forward

CAM_DIM = 3
POSE_DIM = 72
SHAPE_DIM = 10
OMEGA_DIM = CAM_DIM + POSE_DIM + SHAPE_DIM  # 85


def split_omega(raw: jax.Array):
    """raw (..., 85) -> (cams (...,3), poses_aa (...,72), shapes (...,10))."""
    return (
        raw[..., :CAM_DIM],
        raw[..., CAM_DIM:CAM_DIM + POSE_DIM],
        raw[..., CAM_DIM + POSE_DIM:],
    )


def pack_omega(cams: jax.Array, poses_aa: jax.Array, shapes: jax.Array):
    """Inverse of split_omega (poses accepted as (...,72) or (...,24,3))."""
    poses_flat = poses_aa.reshape(poses_aa.shape[: cams.ndim - 1] + (POSE_DIM,))
    return jnp.concatenate([cams, poses_flat, shapes], axis=-1)


class OmegaSmpl(NamedTuple):
    """SMPL-evaluated quantities for a batch of omegas.

    All fields share leading dims with the input raw (..., 85):
        joints: (..., K, 3) regressed 3D keypoints.
        kps: (..., K, 2) projected 2D keypoints.
        poses_rot: (..., 24, 3, 3).
        verts: (..., V, 3) or None if skipped.
    """

    joints: jax.Array
    kps: jax.Array
    poses_rot: jax.Array
    verts: Optional[jax.Array]


# Cache of fused-kernel constants per SmplModel instance.
_FUSED_CONSTANTS = {}


def _fused_constants_for(model: SmplModel):
    key = id(model)
    if key not in _FUSED_CONSTANTS:
        from human_dynamics_tpu.ops.smpl_pallas import (
            prepare_fused_constants,
        )

        # Must be concrete even when first requested inside a jit trace
        # (omnistaging would otherwise cache tracers that leak into later
        # traces).
        with jax.ensure_compile_time_eval():
            _FUSED_CONSTANTS[key] = prepare_fused_constants(model)
    return _FUSED_CONSTANTS[key]


def compute_smpl(
    model: SmplModel,
    raw: jax.Array,
    use_optcam: bool = False,
    cams_override: Optional[jax.Array] = None,
    want_verts: bool = True,
    fused: bool = False,
) -> OmegaSmpl:
    """Evaluate SMPL + projection for omegas with any leading batch shape.

    Mirrors OmegasPred.compute_smpl (/root/reference/src/omega.py:263-304):
    with ``use_optcam`` the 2D kps are simply joints[..., :2] (the implied
    camera is [1, 0, 0]); otherwise the packed camera (or
    ``cams_override``) is applied via weak-perspective projection.

    ``fused=True`` routes the (N, V)-sized math through the Pallas
    blend+skin kernel (ops/smpl_pallas.py): ~1.35x faster and ~50x faster
    to compile on TPU, at float32-matmul (~2e-4) tolerance vs the
    XLA-composed path — keep False where bit-parity with the converted
    reference checkpoint matters.
    """
    lead = raw.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    cams, poses, shapes = split_omega(raw.reshape(n, OMEGA_DIM))

    if fused:
        from human_dynamics_tpu.ops.smpl_pallas import smpl_forward_fused

        out = smpl_forward_fused(
            model, shapes, poses,
            constants=_fused_constants_for(model),
            want_verts=want_verts,
        )
    else:
        out = smpl_forward(model, shapes, poses)
    k = out.joints.shape[1]

    if use_optcam and cams_override is None:
        kps = out.joints[:, :, :2]
    else:
        cam_use = (
            cams_override.reshape(n, CAM_DIM)
            if cams_override is not None
            else cams
        )
        kps = orth_proj_idrot(out.joints, cam_use)

    verts = out.verts.reshape(lead + out.verts.shape[1:]) if want_verts else None
    return OmegaSmpl(
        joints=out.joints.reshape(lead + (k, 3)),
        kps=kps.reshape(lead + (k, 2)),
        poses_rot=out.rots.reshape(lead + (24, 3, 3)),
        verts=verts,
    )


class OmegaGt(NamedTuple):
    """Ground-truth omega bundle (OmegasGt, omega.py:161-195).

    poses_aa: (B, T, 24, 3); poses_rot: (B, T, 24, 3, 3);
    shapes: (B, 10) (per-sequence, broadcast over T);
    joints: (B, T, 14, 3) gt 3D joints; kps: (B, T, K, 3) with visibility.
    """

    poses_aa: jax.Array
    poses_rot: jax.Array
    shapes: jax.Array
    joints: jax.Array
    kps: jax.Array

    @classmethod
    def create(cls, poses_aa, shapes, joints, kps):
        b, t = poses_aa.shape[:2]
        rots = rodrigues(poses_aa.reshape(b, t, 24, 3))
        return cls(
            poses_aa=poses_aa.reshape(b, t, 24, 3),
            poses_rot=rots,
            shapes=shapes,
            joints=joints,
            kps=kps,
        )

    def shapes_tiled(self, t: int) -> jax.Array:
        """(B, 10) -> (B, T, 10), OmegasGt.get_shapes (omega.py:186-191)."""
        return jnp.broadcast_to(
            self.shapes[:, None, :], (self.shapes.shape[0], t, SHAPE_DIM)
        )
