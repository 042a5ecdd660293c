"""InstaVariety (OpenPose/detect-and-track 2D tracks) -> train tfrecords.

Behavioral target: video_in_the_wild_to_tfrecords.py /
insta_variety_to_tfrecords.py: per-frame JSON keypoint tracks ->
tube cleaning (visibility trimming, face-only rejection, 40<=len<=500)
-> smooth bbox -> 300 crops -> tube-consistent augmentation (num_copy
copies) -> phi extraction -> 50 tubes/shard.

Track JSON contract per frame (get_seq_labels,
video_in_the_wild:445-494): a directory of per-video json files, each a
list over frames of {people: [{pose_keypoints_2d: [x,y,score]*25}]}, or
the PoseFlow-style dict consumed by infer.tracks.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import List, Optional

import numpy as np

from human_dynamics_tpu.datasets.common import clean_tube


def load_track_json(path: str) -> List[Optional[np.ndarray]]:
    """One track json -> per-frame (25, 3) kps or None."""
    with open(path) as f:
        data = json.load(f)
    frames = []
    if isinstance(data, list):
        for frame in data:
            people = frame.get("people", [])
            if not people:
                frames.append(None)
                continue
            kp = np.array(
                people[0]["pose_keypoints_2d"], np.float64
            ).reshape(-1, 3)
            frames.append(kp[:25])
    else:
        # PoseFlow-style dict: take the longest tracklet.
        from human_dynamics_tpu.infer.tracks import get_labels_poseflow
        import tempfile

        tracks = get_labels_poseflow(path, num_frames=len(data))
        frames = tracks[0] if tracks else []
    return frames


def gather_tubes(
    track_dir: str,
    frame_root: str,
    num_copies: int = 1,
):
    """Yield tube dicts for TubeConverter from a directory of tracks."""
    for track_path in sorted(glob.glob(os.path.join(track_dir, "*.json"))):
        video_name = os.path.splitext(os.path.basename(track_path))[0]
        frame_dir = os.path.join(frame_root, video_name)
        frame_paths = sorted(
            glob.glob(os.path.join(frame_dir, "*.jpg"))
            + glob.glob(os.path.join(frame_dir, "*.png"))
        )
        kps = load_track_json(track_path)
        n = min(len(frame_paths), len(kps))
        if n == 0:
            continue
        for start, end in clean_tube(kps[:n]):
            tube_kps = np.stack(kps[start:end])
            for _ in range(num_copies):
                yield dict(
                    image_paths=frame_paths[start:end],
                    gt2ds=tube_kps,
                )


def convert(
    track_dir: str,
    frame_root: str,
    out_dir: str,
    feature_extractor=None,
    num_copies: int = 1,
    tubes_per_shard: int = 50,
    shuffle_seed: int = 0,
):
    from human_dynamics_tpu.datasets.tube_writer import TubeConverter

    tubes = list(gather_tubes(track_dir, frame_root, num_copies))
    rng = np.random.RandomState(shuffle_seed)
    rng.shuffle(tubes)          # shard shuffling (video_in_the_wild:399)
    conv = TubeConverter(
        os.path.join(out_dir, "train"),
        feature_extractor=feature_extractor,
        tubes_per_shard=tubes_per_shard,
    )
    return conv.write_tubes("insta_variety_train", tubes)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--track_dir", required=True)
    parser.add_argument("--frame_root", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--num_copies", type=int, default=1)
    parser.add_argument("--resnet_ckpt", default=None)
    args = parser.parse_args()

    fe = None
    if args.resnet_ckpt:
        from human_dynamics_tpu.datasets.phi_extractor import (
            FeatureExtractor,
        )
        from human_dynamics_tpu.utils.checkpoint import load_variables

        fe = FeatureExtractor(load_variables(args.resnet_ckpt))
    convert(args.track_dir, args.frame_root, args.out_dir, fe,
            args.num_copies)


if __name__ == "__main__":
    main()
