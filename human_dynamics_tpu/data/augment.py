"""Tube (video-consistent) augmentation, jitted.

Behavioral targets: TubePreprocessor
(/root/reference/src/util/tube_augmentation.py) and the primitives in
/root/reference/src/util/data_utils.py:512-835 — temporally-coherent
jitter via reflecting-boundary random walks, one flip per tube, 25-kp L/R
swap, SMPL pose mirroring, in-plane rotation with global-pose update.

TPU-first re-design: the reference's per-frame resize -> edge-pad ->
crop -> rotate chain has frame-dependent intermediate shapes (cannot
jit). Here the whole chain is ONE affine warp per frame: output pixel
(x, y) pulls from input coords via the inverse of
    crop224(center + trans, scale=2^s, rot=theta)
with bilinear sampling and edge clamping (= the reference's 'edge' pad).
All frames batch into a single gather — static shapes, runs on device
inside the input pipeline or fused into the train step.

Keypoint/pose/3D label transforms are exact ports (they are supervision-
critical; SURVEY.md §7 hard part 4). Pixel values differ from the
two-step resize-then-crop by normal resampling tolerance.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.core.rotations import rodrigues, rot_to_axis_angle

# COCO-25 L/R swap (data_utils.py:616-628).
COCO25_FLIP_INDS = np.array(
    [5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13, 14, 16, 15, 18, 17,
     20, 19, 22, 21, 24, 23]
)

# SMPL 72-D mirror permutation + sign flips (data_utils.py:663-680).
POSE_SWAP_INDS = np.array([
    0, 1, 2, 6, 7, 8, 3, 4, 5, 9, 10, 11, 15, 16, 17, 12, 13, 14, 18,
    19, 20, 24, 25, 26, 21, 22, 23, 27, 28, 29, 33, 34, 35, 30, 31, 32,
    36, 37, 38, 42, 43, 44, 39, 40, 41, 45, 46, 47, 51, 52, 53, 48, 49,
    50, 57, 58, 59, 54, 55, 56, 63, 64, 65, 60, 61, 62, 69, 70, 71, 66,
    67, 68
])
POSE_SIGN_FLIP = np.tile([1.0, -1.0, -1.0], 24).astype(np.float32)

# LSP-14 L/R swap (data_utils.py:691).
JOINTS3D_FLIP_INDS = np.array([5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13])


def bounded_random_walk(
    key: jax.Array,
    minval: float,
    maxval: float,
    delta_min: float,
    delta_max: float,
    t: int,
    dim: int = 1,
    integer: bool = False,
) -> jax.Array:
    """Reflecting-boundary random walk (data_utils.py:787-835).

    Returns (T, dim). The fold ``|((walk + start - min + size) mod 2*size)
    - size| + min`` reflects the cumulative walk into [min, max].
    """
    if maxval <= minval:
        return jnp.ones((t, dim)) * minval
    k1, k2 = jax.random.split(key)
    if integer:
        start = jax.random.randint(k1, (1, dim), minval, maxval)
        steps = jax.random.randint(k2, (t, dim), delta_min, delta_max)
        start = start.astype(jnp.float32)
        walk = jnp.cumsum(steps.astype(jnp.float32), axis=0)
    else:
        start = jax.random.uniform(
            k1, (1, dim), minval=minval, maxval=maxval
        )
        walk = jnp.cumsum(
            jax.random.uniform(
                k2, (t, dim), minval=delta_min, maxval=delta_max
            ),
            axis=0,
        )
    size = maxval - minval
    out = (
        jnp.abs((walk + start - minval + size) % (2 * size) - size) + minval
    )
    return jnp.round(out) if integer else out


def reflect_pose(pose: jax.Array) -> jax.Array:
    """Mirror a (.., 72) SMPL pose (data_utils.py:639-684)."""
    return pose[..., POSE_SWAP_INDS] * POSE_SIGN_FLIP


def reflect_joints3d(joints: jax.Array) -> jax.Array:
    """Mirror (.., 14, 3) 3D joints and re-center (data_utils.py:687-699)."""
    flipped = joints[..., JOINTS3D_FLIP_INDS, :]
    flipped = flipped * jnp.asarray([-1.0, 1.0, 1.0])
    return flipped - jnp.mean(flipped, axis=-2, keepdims=True)


def flip_kps(kps: jax.Array, img_width: float) -> jax.Array:
    """Mirror (.., K, 3) 2D kps in a width-w image with the 25-kp swap
    (data_utils.py:601-629). x -> w - x - 1."""
    new_x = img_width - kps[..., 0] - 1.0
    out = jnp.stack([new_x, kps[..., 1], kps[..., 2]], axis=-1)
    return out[..., COCO25_FLIP_INDS, :]


def rotate_global_pose(pose: jax.Array, theta: jax.Array) -> jax.Array:
    """In-plane rotation update of the 72-D pose's global rotation
    (data_utils.py:752-758): R0' = Rz(theta)^T R0."""
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rz = jnp.stack([
        jnp.stack([cos, -sin, jnp.zeros_like(cos)]),
        jnp.stack([sin, cos, jnp.zeros_like(cos)]),
        jnp.stack([jnp.zeros_like(cos), jnp.zeros_like(cos),
                   jnp.ones_like(cos)]),
    ])
    r0 = rodrigues(pose[:3][None])[0]
    r0_new = rz.T @ r0
    pose0_new = rot_to_axis_angle(r0_new[None])[0]
    return jnp.concatenate([pose0_new, pose[3:]], axis=0)


class TubeAugmentParams(NamedTuple):
    """Per-tube sampled augmentation (one sample per tube; applied per
    frame)."""

    trans: jax.Array       # (T, 2) int-valued center jitter
    scale: jax.Array       # (T,) log2 scale jitter
    rotate: jax.Array      # (T,) radians
    flip: jax.Array        # () bool


def sample_tube_params(
    key: jax.Array,
    t: int,
    trans_max: int = 20,
    delta_trans_max: int = 3,
    scale_max: float = 0.3,
    delta_scale_max: float = 0.05,
    rotate_max: float = 0.0,
    delta_rotate_max: float = 0.0,
) -> TubeAugmentParams:
    """Random walks + one flip per tube (tube_augmentation.py:56-85)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    trans = bounded_random_walk(
        k1, -trans_max, trans_max + 1, -delta_trans_max,
        delta_trans_max + 1, t, dim=2, integer=True,
    )
    scale = bounded_random_walk(
        k2, -scale_max, scale_max, -delta_scale_max, delta_scale_max, t
    )[:, 0]
    rotate = bounded_random_walk(
        k3, -rotate_max, rotate_max, -delta_rotate_max, delta_rotate_max, t
    )[:, 0]
    flip = jax.random.uniform(k4, ()) < 0.5
    return TubeAugmentParams(trans, scale, rotate, flip)


def _bilinear_sample(image: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (H, W, C) at float coords (..., 2) [x, y], edge-clamped."""
    h, w = image.shape[:2]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def at(ix, iy):
        ix = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        return image[iy, ix]

    v00 = at(x0, y0)
    v01 = at(x0 + 1, y0)
    v10 = at(x0, y0 + 1)
    v11 = at(x0 + 1, y0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def augment_tube(
    images: jax.Array,       # (T, H, W, 3) in [0, 1]
    labels: jax.Array,       # (T, 3, K) kps channel-first (schema layout)
    centers: jax.Array,      # (T, 2) int person centers
    poses: jax.Array,        # (T, 72)
    gt3ds: jax.Array,        # (T, 14, 3)
    params: TubeAugmentParams,
    output_size: int = 224,
    apply_rotation: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Jitter/scale/rotate/flip one tube -> 224 crops + updated labels.

    Kp/pose/3D math matches preprocess_image
    (tube_augmentation.py:114-186); the image path is a fused affine warp
    (see module docstring).

    Returns (crops (T,S,S,3) in [-1,1], labels (T,3,K) normalized to
    [-1,1]*vis, poses (T,72), gt3ds (T,14,3)).
    """
    t_len, h, w = images.shape[:3]
    s_out = output_size
    half = s_out / 2.0

    scale_factor = 2.0 ** params.scale                      # (T,)
    # Jittered center in source pixels (jitter_center + jitter_scale:
    # center' = (center + trans) * factor; crop starts at center' - 112).
    center_j = centers.astype(jnp.float32) + params.trans   # (T, 2)

    theta = params.rotate                                   # (T,)
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    # Output pixel grid (relative to crop center).
    xs = jnp.arange(s_out, dtype=jnp.float32) - half        # (S,)
    gx, gy = jnp.meshgrid(xs, xs)                           # (S, S) [x], [y]

    def warp_frame(image, c, sf, co, si):
        # Inverse map: rotate about crop center by +theta (tf.contrib
        # rotate maps output->input by the rotation matrix), then
        # unscale, then offset by the jittered center.
        rx = co * gx - si * gy
        ry = si * gx + co * gy
        src_x = (rx + sf * c[0]) / sf
        src_y = (ry + sf * c[1]) / sf
        coords = jnp.stack([src_x, src_y], axis=-1)
        return _bilinear_sample(image, coords)

    crops = jax.vmap(warp_frame)(images, center_j, scale_factor, cos, sin)

    # Keypoints: scale, then express relative to crop, then rotate about
    # the crop center (kp_rot = R^T (kp - c), data_utils.py:741-746).
    vis = labels[:, 2, :]                                   # (T, K)
    kp = labels[:, :2, :]                                   # (T, 2, K)
    kp_scaled = kp * scale_factor[:, None, None]
    crop_origin = scale_factor[:, None] * center_j - half   # (T, 2)
    kp_crop = kp_scaled - crop_origin[:, :, None]           # in crop coords
    # Rotate about image center (half, half) by theta (forward map uses
    # R^T since the image was pulled by R).
    kx = kp_crop[:, 0] - half
    ky = kp_crop[:, 1] - half
    kx_r = cos[:, None] * kx + sin[:, None] * ky
    ky_r = -sin[:, None] * kx + cos[:, None] * ky
    kp_rot = jnp.stack([kx_r + half, ky_r + half], axis=1)  # (T, 2, K)

    kps_t = jnp.concatenate([kp_rot, vis[:, None]], axis=1)  # (T, 3, K)

    # 3D joints rotate about their mean (data_utils.py:748-751) and the
    # global pose is updated (752-758).
    def rot3d(g, co_, si_):
        r = jnp.stack([
            jnp.stack([co_, -si_, 0.0 * co_]),
            jnp.stack([si_, co_, 0.0 * co_]),
            jnp.stack([0.0 * co_, 0.0 * co_, 1.0 + 0.0 * co_]),
        ])
        mean = jnp.mean(g)
        return (g - mean) @ r + mean

    # Rotation label updates are gated statically, like the reference's
    # `if self.rotate_max != 0` (tube_augmentation.py:157-166).
    if apply_rotation:
        gt3ds = jax.vmap(rot3d)(gt3ds, cos, sin)
        poses = jax.vmap(rotate_global_pose)(poses, theta)

    # Flip whole tube.
    kps_flipped = jnp.transpose(
        flip_kps(jnp.transpose(kps_t, (0, 2, 1)), float(s_out)), (0, 2, 1)
    )
    kps_t = jnp.where(params.flip, kps_flipped, kps_t)
    crops = jnp.where(params.flip, crops[:, :, ::-1], crops)
    poses = jnp.where(params.flip, reflect_pose(poses), poses)
    gt3ds = jnp.where(params.flip, reflect_joints3d(gt3ds), gt3ds)

    # Normalize kps to [-1, 1], zero the invisible
    # (tube_augmentation.py:174-182).
    final_vis = (kps_t[:, 2, :] > 0).astype(jnp.float32)
    final = jnp.stack([
        2.0 * (kps_t[:, 0, :] / s_out) - 1.0,
        2.0 * (kps_t[:, 1, :] / s_out) - 1.0,
        final_vis,
    ], axis=1)
    final = final * final_vis[:, None, :]

    # Image [0,1] -> [-1,1] (rescale_image, data_utils.py:370-378).
    crops = (crops - 0.5) * 2.0
    return crops, final, poses, gt3ds
