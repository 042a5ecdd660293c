"""Keypoint-track -> smooth bounding-box parameters.

Behavioral port target: /root/reference/src/util/smooth_bbox.py. Pure
host-side numpy/scipy preprocessing (runs once per track; not a TPU
concern). The [cx, cy, scale] convention: scale maps the person height to
150 px (kp_to_bbox_param, smooth_bbox.py:37-61).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy import signal


def kp_to_bbox_param(
    kp: Optional[np.ndarray], vis_thresh: float
) -> Optional[np.ndarray]:
    """Kx3 keypoints -> [cx, cy, scale] or None (smooth_bbox.py:37-61)."""
    if kp is None:
        return None
    vis = kp[:, 2] > vis_thresh
    if not np.any(vis):
        return None
    min_pt = np.min(kp[vis, :2], axis=0)
    max_pt = np.max(kp[vis, :2], axis=0)
    person_height = np.linalg.norm(max_pt - min_pt)
    if person_height < 0.5:
        return None
    center = (min_pt + max_pt) / 2.0
    scale = 150.0 / person_height
    return np.append(center, scale)


def get_all_bbox_params(
    kps: List[Optional[np.ndarray]], vis_thresh: float = 2
) -> Tuple[np.ndarray, int, int]:
    """Per-frame bbox params with linear interpolation over gaps.

    Returns (bbox_params (M,3), start_index (incl), end_index (excl)).
    Reference: smooth_bbox.py:64-105.
    """
    num_to_interpolate = 0
    start_index = -1
    bbox_params = np.empty(shape=(0, 3), dtype=np.float32)

    i = -1
    for i, kp in enumerate(kps):
        bbox_param = kp_to_bbox_param(kp, vis_thresh=vis_thresh)
        if bbox_param is None:
            num_to_interpolate += 1
            continue

        if start_index == -1:
            start_index = i
            num_to_interpolate = 0

        if num_to_interpolate > 0:
            previous = bbox_params[-1]
            interpolated = np.array(
                [
                    np.linspace(prev, curr, num_to_interpolate + 2)
                    for prev, curr in zip(previous, bbox_param)
                ]
            )
            bbox_params = np.vstack((bbox_params, interpolated.T[1:-1]))
            num_to_interpolate = 0
        bbox_params = np.vstack((bbox_params, bbox_param))

    return bbox_params, start_index, i - num_to_interpolate + 1


def smooth_bbox_params(
    bbox_params: np.ndarray, kernel_size: int = 11, sigma: float = 8
) -> np.ndarray:
    """Median then gaussian filter per parameter (smooth_bbox.py:108-123)."""
    smoothed = np.array(
        [signal.medfilt(param, kernel_size) for param in bbox_params.T]
    ).T
    return np.array(
        [gaussian_filter1d(traj, sigma) for traj in smoothed.T]
    ).T


def get_smooth_bbox_params(
    kps: List[Optional[np.ndarray]],
    vis_thresh: float = 2,
    kernel_size: int = 11,
    sigma: float = 3,
) -> Tuple[np.ndarray, int, int]:
    """Interpolated + median + gaussian smoothed [cx, cy, scale] per frame.

    Returns (smoothed (start+M, 3) with zero rows before `start`, start,
    end). Reference: smooth_bbox.py:10-34.
    """
    bbox_params, start, end = get_all_bbox_params(kps, vis_thresh)
    smoothed = smooth_bbox_params(bbox_params, kernel_size, sigma)
    smoothed = np.vstack((np.zeros((start, 3)), smoothed))
    return smoothed, start, end
