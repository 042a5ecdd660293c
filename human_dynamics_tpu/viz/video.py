"""Video IO: frame dump and h264 assembly via ffmpeg subprocess.

Behavioral targets: frame extraction (extract_tracks.py:42-60) and video
assembly (run_video.py:205-234). ffmpeg stays a process boundary, as in
the reference (SURVEY.md §2.2).
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional

import numpy as np


def dump_frames(
    vid_path: str, out_dir: str, fmt: str = "frame%010d.png"
) -> List[str]:
    """Extract all frames of a video to pngs (extract_tracks.py:42-60).
    Idempotent: skips when the directory already has frames."""
    os.makedirs(out_dir, exist_ok=True)
    existing = sorted(
        f for f in os.listdir(out_dir) if f.endswith(".png")
    )
    if existing:
        return [os.path.join(out_dir, f) for f in existing]
    cmd = [
        "ffmpeg", "-loglevel", "error", "-nostdin",
        "-i", vid_path, os.path.join(out_dir, fmt),
    ]
    subprocess.run(cmd, check=True)
    return [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".png")
    ]


def make_video(
    output_path: str,
    img_dir: Optional[str] = None,
    frames: Optional[List[np.ndarray]] = None,
    fps: int = 25,
    img_fmt: str = "frame%010d.png",
) -> None:
    """Assemble pngs (or in-memory frames) into an h264 mp4
    (run_video.py:205-234)."""
    import tempfile

    if frames is not None:
        import cv2

        tmp = tempfile.mkdtemp()
        for i, frame in enumerate(frames):
            f = frame
            if np.issubdtype(f.dtype, np.floating):
                f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(tmp, img_fmt % (i + 1)),
                cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
            )
        img_dir = tmp

    cmd = [
        "ffmpeg", "-y", "-loglevel", "error", "-nostdin",
        "-framerate", str(fps),
        "-i", os.path.join(img_dir, img_fmt),
        "-vcodec", "libx264", "-pix_fmt", "yuv420p",
        # Even dimensions required by yuv420p.
        "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
        output_path,
    ]
    subprocess.run(cmd, check=True)
