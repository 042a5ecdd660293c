"""Train tfrecord writer: tubes -> 300px crops -> (optional) on-device
augmentation + phi extraction -> sharded records.

Behavioral target: add_to_tfrecord / process_videos
(/root/reference/src/datasets/video_in_the_wild_to_tfrecords.py:192-415):
smooth bbox per tube, 300x300 crops (2x the 150px person height leaves
slack for the 224 training crops), tube-consistent augmentation copies,
phi pre-extraction, 50 tubes per shard, idempotent shard skip.

The reference runs augmentation + ResNet through two TF sessions; here
both are jitted device calls (data/augment.py + phi_extractor).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from human_dynamics_tpu.data.schema import convert_to_example_temporal
from human_dynamics_tpu.data.tfrecord import TFRecordWriter
from human_dynamics_tpu.datasets.common import (
    crop_person,
    encode_jpeg,
    load_image,
)
from human_dynamics_tpu.infer.bbox import get_smooth_bbox_params


class TubeConverter:
    """Writes training tubes into sharded tfrecords."""

    def __init__(
        self,
        out_dir: str,
        feature_extractor=None,
        augment: bool = True,
        trans_max: int = 20,
        delta_trans_max: int = 3,
        scale_max: float = 0.3,
        delta_scale_max: float = 0.05,
        tubes_per_shard: int = 50,
        save_img: bool = False,
        seed: int = 0,
    ):
        self.out_dir = out_dir
        self.feature_extractor = feature_extractor
        self.augment = augment and feature_extractor is not None
        self.aug_params = dict(
            trans_max=trans_max, delta_trans_max=delta_trans_max,
            scale_max=scale_max, delta_scale_max=delta_scale_max,
        )
        self.tubes_per_shard = tubes_per_shard
        self.save_img = save_img
        self.seed = seed
        os.makedirs(out_dir, exist_ok=True)

    def shard_path(self, prefix: str, shard_id: int, num_shards: int):
        return os.path.join(
            self.out_dir,
            f"{prefix}_{shard_id:03d}_of_{num_shards:03d}.tfrecord",
        )

    def process_tube(
        self,
        image_paths: List[str],
        gt2ds: np.ndarray,          # (N, 25, 3)
        poses: Optional[np.ndarray] = None,
        shape: Optional[np.ndarray] = None,
        gt3ds: Optional[np.ndarray] = None,
        vis_thresh: float = 0.0,
        sigma: float = 3,
        images: Optional[List[np.ndarray]] = None,
        rng_key: int = 0,
    ) -> Optional[bytes]:
        """One tube -> serialized temporal example (or None if empty)."""
        bbox_params, t1, t2 = get_smooth_bbox_params(
            list(gt2ds), vis_thresh, sigma=sigma
        )
        if t2 <= t1:
            return None

        image_datas, image_shapes, labels = [], [], []
        centers, scale_factors, start_pts = [], [], []
        crops = []
        for i in range(t1, t2):
            image = (
                images[i] if images is not None
                else load_image(image_paths[i])
            )
            ret = crop_person(
                image, gt2ds[i], bbox_params[i], crop_size=300,
                vis_thresh=vis_thresh,
            )
            image_datas.append(ret["image_data"])
            image_shapes.append(ret["image_shape"])
            labels.append(ret["label"])
            centers.append(ret["center"])
            scale_factors.append(ret["scale_factors"])
            start_pts.append(ret["start_pt"])
            if self.feature_extractor is not None:
                crops.append(ret["image"] / 255.0)

        phis = None
        if self.feature_extractor is not None:
            crops224, labels = self._augment_tube(
                crops, labels, centers, rng_key
            )
            image_shapes = [[224, 224]] * len(crops224)
            centers = [np.array([112, 112])] * len(crops224)
            phis = self.feature_extractor.compute_all_phis(crops224)
            image_datas = (
                [encode_jpeg(((im + 1) * 0.5) * 255.0)
                 for im in crops224]
                if self.save_img else None
            )
        elif not self.save_img:
            image_datas = None

        return convert_to_example_temporal(
            image_datas=image_datas,
            image_paths=image_paths[t1:t2],
            image_shapes=np.asarray(image_shapes),
            labels=np.asarray(labels),
            centers=np.asarray(centers),
            gt3ds=None if gt3ds is None else gt3ds[t1:t2],
            scale_factors=np.asarray(scale_factors),
            start_pts=np.asarray(start_pts),
            cams=None if gt3ds is None else np.zeros((t2 - t1, 3)),
            poses=None if poses is None else poses[t1:t2],
            shape=shape,
            phis=phis,
            time_pts=np.asarray([t1, t2]),
        )

    def _augment_tube(self, crops, labels, centers, rng_key):
        """Tube-consistent 300->224 augmentation on device."""
        import jax
        import jax.numpy as jnp

        from human_dynamics_tpu.data.augment import (
            augment_tube,
            sample_tube_params,
        )

        t = len(crops)
        # Pad ragged 300-crops (edge crops can be smaller) to 300x300.
        imgs = np.zeros((t, 300, 300, 3), np.float32)
        for i, c in enumerate(crops):
            imgs[i, :c.shape[0], :c.shape[1]] = c
        params = sample_tube_params(
            jax.random.PRNGKey(self.seed + rng_key), t,
            **self.aug_params,
        )
        crops224, out_labels, _, _ = augment_tube(
            jnp.asarray(imgs),
            jnp.asarray(np.stack(labels), jnp.float32),
            jnp.asarray(np.stack(centers), jnp.float32),
            jnp.zeros((t, 72)),
            jnp.zeros((t, 14, 3)),
            params,
        )
        # Labels come back normalized to [-1,1]*vis (the precomputed-phi
        # training contract).
        return np.asarray(crops224), list(np.asarray(out_labels))

    def write_tubes(self, prefix: str, tubes: List[dict]) -> List[str]:
        """tubes: list of kwargs for process_tube. Returns shard paths.
        Idempotent: existing shards are skipped
        (video_in_the_wild:348-350)."""
        num_shards = max(
            1, int(np.ceil(len(tubes) / self.tubes_per_shard))
        )
        paths = []
        for shard_id in range(num_shards):
            path = self.shard_path(prefix, shard_id, num_shards)
            paths.append(path)
            if os.path.exists(path):
                continue
            chunk = tubes[
                shard_id * self.tubes_per_shard:
                (shard_id + 1) * self.tubes_per_shard
            ]
            tmp = path + ".tmp"
            with TFRecordWriter(tmp) as writer:
                for i, tube_kwargs in enumerate(chunk):
                    serialized = self.process_tube(
                        rng_key=shard_id * self.tubes_per_shard + i,
                        **tube_kwargs,
                    )
                    if serialized is not None:
                        writer.write(serialized)
            os.replace(tmp, path)
        return paths
