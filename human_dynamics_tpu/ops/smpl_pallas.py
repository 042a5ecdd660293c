"""Fused SMPL blendshape + LBS skinning Pallas kernel.

Why: the XLA-composed SMPL forward (core/smpl.py) materializes three
(N, V, *) intermediates in HBM — v_shaped, v_posed, and the per-vertex
blended (R|t) 12-vector — making the layer bandwidth-bound. This kernel
computes, per (vertex-tile, frame-tile) grid cell, entirely in VMEM:

    posed_c = coeffs @ dirs_c + vt_c          (c in x, y, z)
    blend_k = rt_k^T @ lbs_weights^T          (k in 0..11)
    vert_x  = b0*px + b1*py + b2*pz + b9      (and likewise y, z)

writing only the final vertex planes to HBM. Layout is *planar*
(channel-major): every tensor the kernel touches is a 2-D tile with
frames or blend-channels on sublanes and vertices on lanes — no
in-kernel reshapes or transposes (Mosaic rejects most of them) and
every matmul maps to the MXU with aligned tiles. The (224, V) direction
matrices stream once per vertex tile and are reused across all frame
tiles (V-outer grid), so HBM traffic approaches the compulsory minimum.

The kinematic chain (24 joints) stays in XLA; rest joints are regressed
directly from beta via precontracted (10, 24*3) tables, so no (N, V, 3)
v_shaped is ever built.

Reference for the math being fused: SMPL.__call__
(/root/reference/src/tf_smpl/batch_smpl.py:89-162). Golden-tested
against core.smpl.smpl_forward (tests/test_ops_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from human_dynamics_tpu.core.rotations import rodrigues
from human_dynamics_tpu.core.smpl import (
    NUM_JOINTS,
    NUM_POSE_BASIS,
    SmplForward,
    SmplModel,
    global_rigid_transformation,
)

COEF_DIM = 10 + NUM_POSE_BASIS  # 217, padded to 224 for sublane alignment
COEF_PAD = 224
RT_CH = 12                      # 9 rotation + 3 translation channels
JP = 32                         # joints padded 24 -> 32 sublanes


@dataclasses.dataclass(frozen=True)
class FusedSmplConstants:
    """Precontracted planar constants for the fused kernel."""

    dirs: jax.Array         # (3, COEF_PAD, Vp): planar [shape; pose] dirs
    v_template: jax.Array   # (3, 1, Vp)
    weights_t: jax.Array    # (JP, Vp): lbs weights transposed, joint-major
    shape_j_dirs: jax.Array  # (10, 24*3)
    j_template: jax.Array   # (24, 3)
    joint_regressor: jax.Array  # (Vp, K)
    num_verts: int          # true V (Vp >= V)


def prepare_fused_constants(
    model: SmplModel, block_v: int = 512
) -> FusedSmplConstants:
    """One-time contraction/padding of SmplModel constants."""
    v = model.num_verts
    vp = int(np.ceil(v / block_v)) * block_v

    dirs = jnp.concatenate(
        [model.shapedirs, model.posedirs], axis=0
    ).reshape(COEF_DIM, v, 3)
    dirs = jnp.pad(dirs, ((0, COEF_PAD - COEF_DIM), (0, vp - v), (0, 0)))
    dirs = jnp.transpose(dirs, (2, 0, 1))              # (3, 224, Vp)
    v_template = jnp.pad(model.v_template, ((0, vp - v), (0, 0)))
    v_template = jnp.transpose(v_template, (1, 0))[:, None, :]  # (3,1,Vp)
    weights_t = jnp.pad(
        model.lbs_weights, ((0, vp - v), (0, 0))
    ).T                                                 # (24, Vp)
    weights_t = jnp.pad(weights_t, ((0, JP - NUM_JOINTS), (0, 0)))
    joint_reg = jnp.pad(model.joint_regressor, ((0, vp - v), (0, 0)))

    sd = model.shapedirs.reshape(10, v, 3)
    shape_j_dirs = jnp.einsum(
        "kvc,vj->kjc", sd, model.j_regressor
    ).reshape(10, NUM_JOINTS * 3)
    j_template = jnp.einsum(
        "vc,vj->jc", model.v_template, model.j_regressor
    )

    return FusedSmplConstants(
        dirs=dirs,
        v_template=v_template,
        weights_t=weights_t,
        shape_j_dirs=shape_j_dirs,
        j_template=j_template,
        joint_regressor=joint_reg,
        num_verts=v,
    )


def _blend_skin_kernel(
    coeffs_ref,      # (BN, COEF_PAD)
    rt_ref,          # (RT_CH * JP, BN): rows [k*JP + joint]
    dirs_ref,        # (3, COEF_PAD, BV)
    vt_ref,          # (3, 1, BV)
    w_ref,           # (JP, BV)
    outx_ref,        # (BN, BV)
    outy_ref,
    outz_ref,
):
    coeffs = coeffs_ref[:]

    def posed(c):
        return jnp.dot(
            coeffs, dirs_ref[c], preferred_element_type=jnp.float32
        ) + vt_ref[c]

    px, py, pz = posed(0), posed(1), posed(2)      # (BN, BV) each

    w = w_ref[:]

    def blend(k):
        # rt_k: (JP, BN); contract joints (sublanes) against weights.
        rt_k = rt_ref[k * JP:(k + 1) * JP, :]
        return jax.lax.dot_general(
            rt_k, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (BN, BV)

    b = [blend(k) for k in range(RT_CH)]
    outx_ref[:] = b[0] * px + b[1] * py + b[2] * pz + b[9]
    outy_ref[:] = b[3] * px + b[4] * py + b[5] * pz + b[10]
    outz_ref[:] = b[6] * px + b[7] * py + b[8] * pz + b[11]


@functools.partial(
    jax.jit, static_argnames=("block_v", "block_n", "interpret")
)
def _blend_skin(
    coeffs: jax.Array,       # (Np, COEF_PAD)
    rt_t: jax.Array,         # (RT_CH * JP, Np)
    dirs: jax.Array,         # (3, COEF_PAD, Vp)
    vt: jax.Array,           # (3, 1, Vp)
    weights_t: jax.Array,    # (JP, Vp)
    block_v: int = 512,
    block_n: int = 128,
    interpret: bool = False,
):
    n = coeffs.shape[0]
    vp = dirs.shape[2]
    grid = (vp // block_v, n // block_n)  # V outer: dirs reused over N.

    plane = jax.ShapeDtypeStruct((n, vp), jnp.float32)
    return pl.pallas_call(
        _blend_skin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_n, COEF_PAD), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RT_CH * JP, block_n), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, COEF_PAD, block_v), lambda i, j: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, block_v), lambda i, j: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (JP, block_v), lambda i, j: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_n, block_v), lambda i, j: (j, i),
                memory_space=pltpu.VMEM,
            )
        ] * 3,
        out_shape=[plane, plane, plane],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * vp * 3 * (COEF_PAD + JP + 4),
            bytes_accessed=4 * (3 * COEF_PAD * vp + 3 * n * vp),
            transcendentals=0,
        ),
    )(coeffs, rt_t, dirs, vt, weights_t)


def smpl_forward_fused(
    model: SmplModel,
    beta: jax.Array,
    theta: jax.Array,
    constants: Optional[FusedSmplConstants] = None,
    block_v: int = 512,
    block_n: int = 128,
    interpret: bool = False,
    want_verts: bool = True,
) -> SmplForward:
    """Drop-in replacement for core.smpl.smpl_forward using the fused
    kernel for the (N, V)-sized work.

    Differentiable: the forward runs the Pallas kernel; the backward
    (custom VJP below) differentiates the mathematically identical
    XLA-composed smpl_forward — correct gradients without writing a
    hand-rolled backward kernel (pallas_guide.md custom-VJP pattern).
    """
    if constants is None:
        with jax.ensure_compile_time_eval():
            constants = prepare_fused_constants(model, block_v)

    @jax.custom_vjp
    def run(beta, theta):
        return _fused_primal(
            model, constants, beta, theta, block_v, block_n,
            interpret, want_verts,
        )

    def fwd(beta, theta):
        return run(beta, theta), (beta, theta)

    def bwd(residuals, g):
        from human_dynamics_tpu.core.smpl import smpl_forward

        beta_r, theta_r = residuals
        out, vjp = jax.vjp(
            lambda b, t: smpl_forward(model, b, t), beta_r, theta_r
        )

        def cot(gx, ref):
            return gx if gx is not None else jnp.zeros_like(ref)

        cotangent = SmplForward(
            cot(g.verts, out.verts),
            cot(g.joints, out.joints),
            cot(g.rots, out.rots),
            cot(g.j_posed, out.j_posed),
        )
        return vjp(cotangent)

    run.defvjp(fwd, bwd)
    return run(beta, theta)


def _fused_primal(
    model: SmplModel,
    constants: FusedSmplConstants,
    beta: jax.Array,
    theta: jax.Array,
    block_v: int,
    block_n: int,
    interpret: bool,
    want_verts: bool,
) -> SmplForward:
    # Mosaic only compiles for TPU; interpret elsewhere (CPU tests).
    interpret = interpret or jax.default_backend() != "tpu"
    n = beta.shape[0]
    dtype = jnp.float32

    # Tiny XLA-side math: rest joints, Rodrigues, FK.
    joints_rest = (
        jnp.matmul(beta, constants.shape_j_dirs).reshape(n, NUM_JOINTS, 3)
        + constants.j_template
    )
    rots = rodrigues(theta.reshape(n, NUM_JOINTS, 3))
    pose_feature = (
        rots[:, 1:] - jnp.eye(3, dtype=dtype)
    ).reshape(n, NUM_POSE_BASIS)
    j_posed, world_rot, rel_t = global_rigid_transformation(
        rots, joints_rest, model.parents
    )

    coeffs = jnp.concatenate([beta, pose_feature], axis=1)
    coeffs = jnp.pad(coeffs, ((0, 0), (0, COEF_PAD - COEF_DIM)))

    # Channel-major rt: rows [k*JP + joint] for k in 0..11.
    rt = jnp.concatenate(
        [world_rot.reshape(n, NUM_JOINTS, 9), rel_t], axis=-1
    )                                               # (N, 24, 12)
    rt_t = jnp.transpose(rt, (2, 1, 0))             # (12, 24, N)
    rt_t = jnp.pad(rt_t, ((0, 0), (0, JP - NUM_JOINTS), (0, 0)))
    rt_t = rt_t.reshape(RT_CH * JP, n)

    np_pad = int(np.ceil(n / block_n)) * block_n
    coeffs = jnp.pad(coeffs, ((0, np_pad - n), (0, 0)))
    rt_t = jnp.pad(rt_t, ((0, 0), (0, np_pad - n)))

    vx, vy, vz = _blend_skin(
        coeffs, rt_t, constants.dirs, constants.v_template,
        constants.weights_t,
        block_v=block_v, block_n=block_n, interpret=interpret,
    )

    # Keypoint regression straight off the planes: (Np, Vp) @ (Vp, K).
    joints = jnp.stack(
        [
            jnp.matmul(vx[:n], constants.joint_regressor),
            jnp.matmul(vy[:n], constants.joint_regressor),
            jnp.matmul(vz[:n], constants.joint_regressor),
        ],
        axis=2,
    )                                               # (N, K, 3)

    verts = None
    if want_verts:
        verts = jnp.stack(
            [vx[:n, :constants.num_verts],
             vy[:n, :constants.num_verts],
             vz[:n, :constants.num_verts]],
            axis=2,
        )
    return SmplForward(verts, joints, rots, j_posed)
