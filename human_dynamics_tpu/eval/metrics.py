"""Evaluation metric library (MPJPE, PA-MPJPE, PCK, accel error, ...).

Behavioral parity target: /root/reference/src/evaluation/eval_util.py
(already numpy there; SURVEY.md §7 stage 5 calls for a near-direct
behavior match). Implemented vectorized over frames — the reference loops
per frame with per-frame SVDs; here the Procrustes solve is one batched
``np.linalg.svd`` over the whole sequence, which matters because eval
touches every frame of every test tube.

All functions take/return numpy; eval is host-side (predictions arrive
from the device in one transfer).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def compute_accel(joints: np.ndarray) -> np.ndarray:
    """Mean magnitude of the 2nd finite difference (eval_util.py:14-27).

    joints (N, K, 3) -> (N-2,).
    """
    velocities = joints[1:] - joints[:-1]
    acceleration = velocities[1:] - velocities[:-1]
    return np.mean(np.linalg.norm(acceleration, axis=2), axis=1)


def compute_error_accel(
    joints_gt: np.ndarray,
    joints_pred: np.ndarray,
    vis: Optional[np.ndarray] = None,
) -> np.ndarray:
    """|| (x-1 - 2x + x+1)_gt - (.)_pred || with 3-wide vis masking
    (eval_util.py:63-94). Returns (M,) for the M valid accel frames."""
    accel_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    accel_pred = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    normed = np.linalg.norm(accel_pred - accel_gt, axis=2)

    if vis is None:
        new_vis = np.ones(len(normed), dtype=bool)
    else:
        invis = np.logical_not(vis)
        invis1 = np.roll(invis, -1)
        invis2 = np.roll(invis, -2)
        new_invis = np.logical_or(invis, np.logical_or(invis1, invis2))[:-2]
        new_vis = np.logical_not(new_invis)

    return np.mean(normed[new_vis], axis=1)


def align_by_pelvis(
    joints: np.ndarray, get_pelvis: bool = False
):
    """Pelvis (midpoint of LSP hips, idx 3/2) to origin
    (eval_util.py:158-174). Batched: joints (..., 14, 3)."""
    pelvis = (joints[..., 3, :] + joints[..., 2, :]) / 2.0
    aligned = joints - pelvis[..., None, :]
    if get_pelvis:
        return aligned, pelvis
    return aligned


def compute_similarity_transform_batch(
    s1: np.ndarray, s2: np.ndarray
) -> np.ndarray:
    """Batched orthogonal-Procrustes alignment of s1 onto s2.

    s1, s2: (N, K, 3) point sets. Returns aligned s1_hat (N, K, 3).
    Vectorized form of eval_util.py:177-232 (one batched SVD instead of a
    python loop of per-frame SVDs).
    """
    # Work in (N, D, K) like the reference (D = 2 or 3).
    x1 = np.transpose(s1, (0, 2, 1)).astype(np.float64)
    x2 = np.transpose(s2, (0, 2, 1)).astype(np.float64)
    d = x1.shape[1]

    mu1 = x1.mean(axis=2, keepdims=True)
    mu2 = x2.mean(axis=2, keepdims=True)
    x1c = x1 - mu1
    x2c = x2 - mu2

    var1 = np.sum(x1c**2, axis=(1, 2))                      # (N,)
    k = np.einsum("nik,njk->nij", x1c, x2c)                 # (N, D, D)

    u, _, vh = np.linalg.svd(k)
    v = np.transpose(vh, (0, 2, 1))
    det = np.linalg.det(np.einsum("nij,nkj->nik", u, v))    # det(U V^T)
    z = np.tile(np.eye(d), (len(s1), 1, 1))
    z[:, -1, -1] = np.sign(det)
    r = np.einsum("nij,njk,nlk->nil", v, z, u)              # V Z U^T

    scale = np.einsum("nij,nji->n", r, k) / var1            # trace(RK)/var1
    t = mu2 - scale[:, None, None] * np.einsum("nij,njk->nik", r, mu1)
    s1_hat = scale[:, None, None] * np.einsum(
        "nij,njk->nik", r, x1
    ) + t
    return np.transpose(s1_hat, (0, 2, 1))


def compute_similarity_transform(
    s1: np.ndarray, s2: np.ndarray
) -> np.ndarray:
    """Single point-set Procrustes, matching the reference's (K, D) or
    (D, K) call signature (eval_util.py:177-232)."""
    if s1.shape[0] in (2, 3):
        # (D, K) layout.
        return compute_similarity_transform_batch(
            s1.T[None], s2.T[None]
        )[0].T
    return compute_similarity_transform_batch(s1[None], s2[None])[0]


def compute_error_3d(
    gt3ds: np.ndarray, preds: np.ndarray, vis: Optional[np.ndarray] = None
) -> Tuple[list, list]:
    """Per-frame MPJPE and PA-MPJPE on 14 joints (eval_util.py:30-60).

    Returns (errors, errors_pa) lists over visible frames.
    """
    assert len(gt3ds) == len(preds)
    gt3ds = np.asarray(gt3ds, np.float64).reshape(len(gt3ds), -1, 3)
    preds = np.asarray(preds, np.float64)

    keep = (
        np.ones(len(gt3ds), bool) if vis is None else np.asarray(vis, bool)
    )
    gt_a = align_by_pelvis(gt3ds[keep])
    pred_a = align_by_pelvis(preds[keep])

    joint_error = np.sqrt(np.sum((gt_a - pred_a) ** 2, axis=2))
    errors = list(np.mean(joint_error, axis=1))

    pred_sym = compute_similarity_transform_batch(pred_a, gt_a)
    pa_error = np.sqrt(np.sum((gt_a - pred_sym) ** 2, axis=2))
    errors_pa = list(np.mean(pa_error, axis=1))
    return errors, errors_pa


def compute_opt_cam_with_vis(
    got: np.ndarray, want: np.ndarray, vis: np.ndarray
):
    """Optimal [scale, tx, ty] mapping got->want on visible points
    (eval_util.py:235-260). Returns (new_got, cam)."""
    vis = np.asarray(vis, bool)
    vis_float = np.expand_dims(vis, 1).astype(float)
    got_zeroed = got.copy()
    got_zeroed[np.logical_not(vis)] = 0.0
    want_zeroed = want.copy()
    want_zeroed[np.logical_not(vis)] = 0.0

    mu1 = np.sum(got_zeroed, axis=0) / np.sum(vis)
    mu2 = np.sum(want_zeroed, axis=0) / np.sum(vis)
    x = vis_float * (got_zeroed - mu1)
    y = vis_float * (want_zeroed - mu2)
    eps = 1e-6 * np.identity(2)
    a_inv = np.linalg.inv(x.T.dot(x) + eps)
    scale = np.trace(a_inv.dot(x.T.dot(y))) / 2.0
    trans = mu2 / scale - mu1
    new_got = scale * (got + trans)
    cam = np.hstack((scale, trans.ravel()))
    return new_got, cam


def compute_error_kp(
    kps_gt: np.ndarray,
    kps_pred: np.ndarray,
    alpha: float = 0.05,
    min_visible: int = 6,
) -> Tuple[list, list, list]:
    """Pixel keypoint error, PA keypoint error, PCK@alpha
    (eval_util.py:97-137). NaN marks frames with too few visible kps."""
    assert len(kps_gt) == len(kps_pred)
    errors_kp, errors_kp_pa, errors_kp_pck = [], [], []
    for kp_gt, kp_pred in zip(kps_gt, kps_pred):
        vis = kp_gt[:, 2].astype(bool)
        kp_gt_xy = kp_gt[:, :2]
        if np.all(vis == 0) or np.sum(vis == 1) < min_visible:
            errors_kp.append(np.nan)
            errors_kp_pa.append(np.nan)
            errors_kp_pck.append(np.nan)
            continue
        kp_diffs = np.linalg.norm(kp_gt_xy[vis] - kp_pred[vis], axis=1)
        kp_pred_pa, _ = compute_opt_cam_with_vis(
            got=kp_pred, want=kp_gt_xy, vis=vis
        )
        kp_diffs_pa = np.linalg.norm(
            kp_gt_xy[vis] - kp_pred_pa[vis], axis=1
        )
        errors_kp.append(np.mean(kp_diffs))
        errors_kp_pck.append(np.mean(kp_diffs_pa < alpha))
        errors_kp_pa.append(np.mean(kp_diffs_pa))
    return errors_kp, errors_kp_pa, errors_kp_pck


def compute_error_verts(
    verts_gt: np.ndarray, verts_pred: np.ndarray
) -> np.ndarray:
    """Mean per-vertex error per frame (eval_util.py:140-153)."""
    assert len(verts_gt) == len(verts_pred)
    error_per_vert = np.sqrt(np.sum((verts_gt - verts_pred) ** 2, axis=2))
    return np.mean(error_per_vert, axis=1)


# Dict accumulators (eval_util.py:265-313) -----------------------------------

def update_dict_entries(accumulator: dict, appender: dict) -> None:
    for k in appender:
        accumulator.setdefault(k, []).append(appender[k])


def extend_dict_entries(accumulator: dict, appender: dict) -> None:
    for k, v in appender.items():
        accumulator.setdefault(k, [])
        if hasattr(v, "__iter__"):
            accumulator[k].extend(v)
        else:
            accumulator[k].append(v)


def concat_dict_entries(dictionary: dict) -> None:
    for k, v in dictionary.items():
        dictionary[k] = np.concatenate(v)


def mean_of_dict_values(dictionary: dict) -> None:
    """Mean-of-means aggregation, rounded to 5 places
    (eval_util.py:291-299)."""
    for k, v in dictionary.items():
        all_values = [np.nanmean(values) for values in v]
        dictionary[k] = float(round(np.nanmean(all_values), 5))


def axis_angle_to_rot_mat(poses_aa: np.ndarray) -> np.ndarray:
    """(72,) -> (24, 3, 3) via cv2.Rodrigues (eval_util.py:318-329)."""
    import cv2

    return np.array(
        [cv2.Rodrigues(p)[0] for p in poses_aa.reshape(-1, 3)]
    )


def rot_mat_to_axis_angle(rot_matrices: np.ndarray) -> np.ndarray:
    """(24, 3, 3) -> (72,) via cv2.Rodrigues (eval_util.py:332-344)."""
    import cv2

    return np.array(
        [cv2.Rodrigues(r)[0] for r in rot_matrices]
    ).reshape(72)
