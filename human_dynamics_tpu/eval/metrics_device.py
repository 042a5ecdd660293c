"""On-device (jitted) evaluation metrics: per-tube error dict as scalars.

The numpy library (`eval/metrics.py`) is the behavioral oracle —
vectorized parity with /root/reference/src/evaluation/eval_util.py. This
module computes the SAME per-tube aggregates fully on device so the
evaluator fetches a handful of scalars per tube instead of the
verts/joints arrays (a 500-frame tube's verts are ~41 MB; through a
tunnel-grade link at ~0.6 MB/s that is minutes per tube, on local PCIe
it is still the difference between eval running at device speed or at
transfer speed).

Aggregation contract: the harness aggregates mean-of-means
(`metrics.mean_of_dict_values`: nanmean over a tube's per-frame values,
then nanmean over tubes). Each function here therefore returns the
TUBE-level nanmean directly — masked means where the numpy path writes
NaN rows — so `Evaluator(device_metrics=True)` plugs into the same
aggregation unchanged (parity asserted in
tests/test_eval_device_metrics.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from human_dynamics_tpu.core.rotations import rot_to_axis_angle
from human_dynamics_tpu.core.smpl import smpl_forward


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """mean of values[mask]; NaN when the mask is empty (matches nanmean
    of an all-NaN list). where-form so NaNs in MASKED entries (e.g. the
    ridge solve of an all-invisible padded frame) cannot contaminate."""
    m = mask.astype(values.dtype)
    return jnp.sum(jnp.where(mask, values, 0.0)) / jnp.sum(m)


def accel_magnitude(joints: jax.Array, frame_mask: jax.Array) -> jax.Array:
    """Tube mean of ||second finite difference|| (eval_util.py:14-27 +
    the harness's per-tube nanmean). joints (N, K, 3) -> scalar; an
    accel frame is valid when all three touched frames are real (not
    bucket padding)."""
    accel = jnp.diff(joints, n=2, axis=0)
    keep = frame_mask[:-2] & frame_mask[1:-1] & frame_mask[2:]
    return _masked_mean(
        jnp.mean(jnp.linalg.norm(accel, axis=2), axis=1), keep
    )


def accel_error(
    joints_gt: jax.Array, joints_pred: jax.Array, vis: jax.Array
) -> jax.Array:
    """Tube mean of ||accel_gt - accel_pred|| over accel frames whose
    three touched frames are all visible (eval_util.py:63-94)."""
    err = jnp.linalg.norm(
        jnp.diff(joints_pred, n=2, axis=0) - jnp.diff(joints_gt, n=2, axis=0),
        axis=2,
    )
    keep = vis[:-2] & vis[1:-1] & vis[2:]
    return _masked_mean(jnp.mean(err, axis=1), keep)


def align_by_pelvis(joints: jax.Array) -> jax.Array:
    """(..., 14, 3); LSP hips at idx 3 (L) / 2 (R) (eval_util.py:158-174)."""
    pelvis = (joints[..., 3, :] + joints[..., 2, :]) / 2.0
    return joints - pelvis[..., None, :]


def similarity_align(s1: jax.Array, s2: jax.Array) -> jax.Array:
    """Batched orthogonal Procrustes: align s1 (N, K, 3) onto s2.

    Same math as metrics.compute_similarity_transform_batch (one batched
    SVD of the 3x3 cross-covariance; eval_util.py:177-232), in jax.
    """
    x1 = jnp.swapaxes(s1, -1, -2)            # (N, 3, K)
    x2 = jnp.swapaxes(s2, -1, -2)
    d = x1.shape[-2]

    mu1 = x1.mean(axis=-1, keepdims=True)
    mu2 = x2.mean(axis=-1, keepdims=True)
    x1c = x1 - mu1
    x2c = x2 - mu2

    var1 = jnp.sum(x1c**2, axis=(-2, -1))                     # (N,)
    k = jnp.einsum("nik,njk->nij", x1c, x2c)                  # (N, 3, 3)

    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum("nij,nkj->nik", u, v))
    z = jnp.tile(jnp.eye(d), (s1.shape[0], 1, 1))
    z = z.at[:, -1, -1].set(jnp.sign(det))
    r = jnp.einsum("nij,njk,nlk->nil", v, z, u)               # V Z U^T

    scale = jnp.einsum("nij,nji->n", r, k) / var1
    t = mu2 - scale[:, None, None] * jnp.einsum("nij,njk->nik", r, mu1)
    s1_hat = scale[:, None, None] * jnp.einsum("nij,njk->nik", r, x1) + t
    return jnp.swapaxes(s1_hat, -1, -2)


def error_3d(
    gt3ds: jax.Array, preds: jax.Array, vis: jax.Array
) -> tuple:
    """Tube-mean MPJPE and PA-MPJPE over visible frames
    (eval_util.py:30-60). gt3ds/preds (N, 14, 3); vis (N,) bool."""
    gt_a = align_by_pelvis(gt3ds)
    pred_a = align_by_pelvis(preds)
    per_frame = jnp.mean(
        jnp.sqrt(jnp.sum((gt_a - pred_a) ** 2, axis=2)), axis=1
    )
    # The Procrustes alignment of invisible frames is computed (static
    # shapes) but masked out of the mean.
    pred_sym = similarity_align(pred_a, gt_a)
    per_frame_pa = jnp.mean(
        jnp.sqrt(jnp.sum((gt_a - pred_sym) ** 2, axis=2)), axis=1
    )
    return _masked_mean(per_frame, vis), _masked_mean(per_frame_pa, vis)


def opt_cams(got: jax.Array, want: jax.Array, vis: jax.Array) -> jax.Array:
    """Ridge-regularized optimal [scale, tx, ty] per frame mapping got
    onto want over visible points, then the transformed points — the
    device twin of metrics.compute_opt_cams_batch (eval_util.py:235-260)
    with the 2x2 solve in closed form (stays on the VPU)."""
    w = vis.astype(got.dtype)[..., None]                      # (N, K, 1)
    n_vis = jnp.maximum(jnp.sum(w, axis=1), 1.0)              # (N, 1)
    mu1 = jnp.sum(got * w, axis=1) / n_vis                    # (N, 2)
    mu2 = jnp.sum(want * w, axis=1) / n_vis
    x = (got - mu1[:, None]) * w
    y = (want - mu2[:, None]) * w

    a11 = jnp.sum(x[..., 0] * x[..., 0], axis=1) + 1e-6
    a12 = jnp.sum(x[..., 0] * x[..., 1], axis=1)
    a22 = jnp.sum(x[..., 1] * x[..., 1], axis=1) + 1e-6
    b11 = jnp.sum(x[..., 0] * y[..., 0], axis=1)
    b12 = jnp.sum(x[..., 0] * y[..., 1], axis=1)
    b21 = jnp.sum(x[..., 1] * y[..., 0], axis=1)
    b22 = jnp.sum(x[..., 1] * y[..., 1], axis=1)
    det = a11 * a22 - a12 * a12
    scale = (a22 * b11 - a12 * b21 - a12 * b12 + a11 * b22) / det / 2.0

    safe = jnp.where(jnp.abs(scale) > 1e-12, scale, jnp.nan)
    trans = mu2 / safe[:, None] - mu1
    return safe[:, None, None] * (got + trans[:, None])


def kp_errors(
    kps_gt: jax.Array,
    kps_pred_px: jax.Array,
    alpha: float,
    min_visible: int,
    frame_mask: Optional[jax.Array] = None,
) -> tuple:
    """Tube-mean kp px error, PA kp error, PCK@alpha; frames with fewer
    than min_visible visible kps are masked (the numpy path marks them
    NaN and nanmeans; eval_util.py:97-137)."""
    vis = kps_gt[..., 2] != 0                                 # (N, K)
    gt_xy = kps_gt[..., :2]
    n_vis = jnp.sum(vis, axis=1)
    valid = n_vis >= max(min_visible, 1)
    if frame_mask is not None:
        valid = valid & frame_mask

    w = vis.astype(kps_pred_px.dtype)
    denom = jnp.maximum(n_vis, 1)
    diffs = jnp.linalg.norm(gt_xy - kps_pred_px, axis=2)
    err = jnp.sum(diffs * w, axis=1) / denom

    pred_pa = opt_cams(kps_pred_px, gt_xy, vis)
    diffs_pa = jnp.linalg.norm(gt_xy - pred_pa, axis=2)
    err_pa = jnp.sum(diffs_pa * w, axis=1) / denom
    pck = jnp.sum((diffs_pa < alpha) * w, axis=1) / denom

    return (
        _masked_mean(err, valid),
        _masked_mean(err_pa, valid),
        _masked_mean(pck, valid),
    )


def verts_error(verts_gt: jax.Array, verts_pred: jax.Array,
                vis: jax.Array) -> jax.Array:
    """Tube-mean per-vertex error over visible frames
    (eval_util.py:140-153)."""
    per_frame = jnp.mean(
        jnp.sqrt(jnp.sum((verts_gt - verts_pred) ** 2, axis=2)), axis=1
    )
    return _masked_mean(per_frame, vis)


def make_compute_errors_device(smpl):
    """Factory: one jitted program for the whole per-tube error dict
    (eval.py:114-193 keys, tube-level scalars). ``smpl`` (an unhashable
    constants dataclass) is closed over; static flags select the
    computed subset. All heavy inputs stay on device; the caller fetches
    <=9 scalars."""

    @partial(
        jax.jit,
        static_argnames=(
            "img_size", "has_3d", "min_visible", "compute_mesh"
        ),
    )
    def compute(
        kps_gt: jax.Array,                       # (N, K, 3) px + vis
        kps_pred: jax.Array,                     # (N, K, 2) normalized
        joints_gt: Optional[jax.Array] = None,   # (N, 14, 3)
        joints_pred: Optional[jax.Array] = None,  # (N, 14, 3)
        poses_gt: Optional[jax.Array] = None,    # (N, 72) axis-angle
        poses_pred: Optional[jax.Array] = None,  # (N, 24, 3, 3)
        shape_gt: Optional[jax.Array] = None,    # (10,)
        shapes_pred: Optional[jax.Array] = None,  # (N, 10)
        num_frames: Optional[jax.Array] = None,  # dynamic scalar <= N
        img_size: int = 224,
        has_3d: bool = False,
        min_visible: int = 6,
        compute_mesh: bool = False,
    ) -> Dict[str, jax.Array]:
        """``num_frames`` supports count-bucketed padding: the caller
        pads all (N, ...) inputs to a bucket length (so tube lengths
        share compiled programs) and passes the real frame count; padded
        rows are masked out of every aggregate. Padded poses_pred must
        be identity rotations (rot_to_axis_angle of a zero matrix is
        NaN)."""
        n_total = kps_gt.shape[0]
        frame_mask = (
            jnp.ones((n_total,), bool) if num_frames is None
            else jnp.arange(n_total) < num_frames
        )
        kps_gt_f = kps_gt.astype(jnp.float32)
        err_kp, err_kp_pa, err_pck = kp_errors(
            kps_gt_f,
            (kps_pred.astype(jnp.float32) + 1.0) * 0.5 * img_size,
            alpha=0.05 * img_size,
            min_visible=min_visible,
            frame_mask=frame_mask,
        )
        out = {
            "accel": accel_magnitude(joints_pred, frame_mask),
            "kp": err_kp,
            "kp_pa": err_kp_pa,
            "kp_pck": err_pck,
        }
        if not has_3d:
            return out

        vis = (
            jnp.sum(kps_gt_f[:, :14, 2], axis=1) > min_visible
        ) & frame_mask                                            # (N,)
        joints_gt_f = joints_gt.astype(jnp.float32)
        out["accel_error"] = accel_error(joints_gt_f, joints_pred, vis)
        e_j, e_j_pa = error_3d(joints_gt_f, joints_pred, vis)
        out["joints"] = e_j
        out["joints_pa"] = e_j_pa

        if compute_mesh:
            n = poses_gt.shape[0]
            shapes_gt_t = jnp.tile(shape_gt.reshape(1, 10), (n, 1))
            poses_pred_aa = rot_to_axis_angle(poses_pred).reshape(n, 72)
            zeros = jnp.zeros_like(poses_gt)
            gt_tpose = smpl_forward(smpl, shapes_gt_t, zeros).verts
            pred_tpose = smpl_forward(smpl, shapes_pred, zeros).verts
            out["mesh_tpose"] = verts_error(gt_tpose, pred_tpose, vis)
            gt_posed = smpl_forward(smpl, shapes_gt_t, poses_gt).verts
            pred_posed = smpl_forward(
                smpl, shapes_pred, poses_pred_aa
            ).verts
            out["mesh_posed"] = verts_error(gt_posed, pred_posed, vis)
        return out

    return compute
