"""Demo driver: video / frame dir + 2D track JSON -> per-frame Omega pkl
(+ rendered video).

Behavioral port target: demo_video.py + run_video.py
(/root/reference/demo_video.py, /root/reference/src/evaluation/run_video.py).
The external AlphaPose/PoseFlow trackers remain a JSON process boundary
(SURVEY.md §2.2): this driver consumes a precomputed
``alphapose-results-forvis-tracked.json`` (BASELINE config 1 uses one).

Pipeline: track JSON -> smooth bbox -> 224 crops -> windowed TPU
prediction (one jitted program; see infer/predictor.py) -> pkl with the
exact demo schema (cams/joints/kps/poses/shapes/verts/omegas + _delta
stacks, tester.py:217-255) -> optional composite render + mp4.

Idempotent like the reference: existing pkl / rendered videos are reused
(demo_video.py:160-166, run_video.py:132-134).
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import List, Optional

import numpy as np

from human_dynamics_tpu.infer.bbox import get_smooth_bbox_params
from human_dynamics_tpu.infer.crop import process_image
from human_dynamics_tpu.infer.predictor import HmmrPredictor
from human_dynamics_tpu.infer.tracks import get_labels_poseflow


def preprocess_track(
    frames: List[np.ndarray],
    kps: List[Optional[np.ndarray]],
    vis_thresh: float = 0.1,
):
    """Smooth-bbox + crop every frame of one tracklet
    (demo_video.py:136-153)."""
    bbox_params_smooth, s, e = get_smooth_bbox_params(
        kps, vis_thresh=vis_thresh
    )
    min_f = max(s, 0)
    max_f = min(e, len(kps))
    images = []
    proc_infos = []
    for i in range(min_f, max_f):
        proc = process_image(frames[i], bbox_params_smooth[i])
        images.append(proc.pop("image"))
        proc_infos.append(proc)
    return np.stack(images), proc_infos, (min_f, max_f)


def predict_on_tracks(
    predictor: HmmrPredictor,
    frames: List[np.ndarray],
    poseflow_path: str,
    output_path: str,
    track_id: int = 0,
    trim_length: int = 0,
):
    """Predict one PoseFlow tracklet and save hmmr_output.pkl
    (demo_video.py:124-191)."""
    all_kps = get_labels_poseflow(poseflow_path, len(frames))
    track_id = min(track_id, len(all_kps) - 1)
    kps = all_kps[track_id]

    images, proc_infos, (min_f, max_f) = preprocess_track(frames, kps)

    if track_id > 0:
        output_path += f"_{track_id}"
    os.makedirs(output_path, exist_ok=True)
    pred_path = os.path.join(output_path, "hmmr_output.pkl")
    if os.path.exists(pred_path):
        with open(pred_path, "rb") as f:
            preds = pickle.load(f)
    else:
        preds = predictor.predict_all_images(images)
        # Frame provenance (TPU-native addition; helps eval tooling).
        preds["frame_range"] = np.array([min_f, max_f])
        with open(pred_path, "wb") as f:
            pickle.dump(preds, f)

    return preds, images, proc_infos, output_path


def render_preds(
    output_path: str,
    preds,
    images,
    proc_infos,
    faces: np.ndarray,
    trim_length: int = 0,
    fps: int = 25,
    orig_frames=None,
):
    """2x2 composite video: mesh-on-crop / mesh-on-original-frame /
    2D skeleton / rotated mesh (run_video.py:110-202).

    When ``orig_frames`` (list of raw RGB frames aligned with the crop
    range) is given, the top-right panel renders the mesh back in the
    original image space via the crop->orig camera transform
    (nmr_renderer.py:333-419); otherwise it falls back to the crop.
    """
    import cv2

    from human_dynamics_tpu.viz.composite import (
        visualize_img,
        visualize_img_orig,
    )
    from human_dynamics_tpu.viz.renderer import VisRenderer
    from human_dynamics_tpu.viz.video import make_video

    out_mp4 = os.path.join(output_path, "hmmr_output.mp4")
    if os.path.exists(out_mp4):
        return out_mp4

    crop_size = images.shape[1]
    renderer = VisRenderer(img_size=crop_size, faces=faces)
    t = slice(trim_length, len(images) - trim_length or None)
    frames_out = []
    for i in range(*t.indices(len(images))):
        skel, rend, rot = visualize_img(
            img=images[i],
            cam=preds["cams"][i],
            kp_pred=preds["kps"][i],
            vert=preds["verts"][i],
            renderer=renderer,
            rotated_view=True,
            no_text=True,
        )
        if orig_frames is not None:
            info = proc_infos[i]
            orig = ((orig_frames[i] / 255.0) - 0.5) * 2
            _, rend_orig = visualize_img_orig(
                cam=preds["cams"][i],
                kp_pred=preds["kps"][i],
                vert=preds["verts"][i],
                renderer=renderer,
                start_pt=info["start_pt"],
                scale=info["scale"],
                proc_img_shape=info["im_shape"],
                img=orig,
                no_text=True,
            )
            rend_orig = cv2.resize(
                (rend_orig * 255).astype(np.uint8),
                (crop_size, crop_size),
            ) / 255.0
            panel_tr = rend_orig
        else:
            panel_tr = rend
        crop = ((images[i] + 1) * 0.5)
        top = np.hstack([crop, panel_tr])
        bottom = np.hstack([skel, rot])
        frames_out.append(np.vstack([top, bottom]).astype(np.float32))

    make_video(out_mp4, frames=frames_out, fps=fps)
    return out_mp4


def _predict_and_render(
    predictor, smpl, args, frames, track_json, out_base, trim_length
):
    """Shared tail of every input mode: predict one tracklet, save the
    pkl, optionally render the composite video."""
    preds, images, proc_infos, out = predict_on_tracks(
        predictor, frames, track_json, out_base,
        track_id=args.track_id, trim_length=trim_length,
    )
    print(f"Saved predictions for {len(images)} frames to {out}")

    if not args.no_render:
        fr = preds.get("frame_range")
        orig = frames[fr[0]:fr[1]] if fr is not None else None
        mp4 = render_preds(
            out, preds, images, proc_infos, smpl.faces,
            trim_length=trim_length, orig_frames=orig,
        )
        print(f"Rendered {mp4}")


def run_on_video(predictor, smpl, args, vid_path: str, trim_length: int):
    """One video end-to-end: tracks -> prediction -> render
    (demo_video.py:194-217). When ``--track_json`` is absent the
    AlphaPose/PoseFlow pipeline is invoked via ``compute_tracks``
    (idempotent; per-video subdir under ``--track_dir`` like
    extract_tracks.py:137-160)."""
    import cv2

    from human_dynamics_tpu.infer.extract_tracks import compute_tracks
    from human_dynamics_tpu.viz.video import dump_frames

    vid_name = os.path.splitext(os.path.basename(vid_path))[0]
    if args.track_json:
        track_json = args.track_json
        img_dir = os.path.join(args.out_dir, vid_name + "_frames")
        paths = dump_frames(vid_path, img_dir)
        out_base = os.path.join(args.out_dir, "hmmr_output")
    else:
        print(f"Computing tracks on {vid_path}.")
        track_dir = os.path.join(args.track_dir or args.out_dir, vid_name)
        track_json, img_dir = compute_tracks(
            vid_path, track_dir,
            alphapose_dir=args.alphapose_dir,
            poseflow_dir=args.poseflow_dir,
        )
        paths = sorted(
            os.path.join(img_dir, f)
            for f in os.listdir(img_dir)
            if f.endswith((".png", ".jpg"))
        )
        out_base = os.path.join(args.out_dir, vid_name, "hmmr_output")
    frames = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths]
    _predict_and_render(
        predictor, smpl, args, frames, track_json, out_base, trim_length
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--vid_path", help="input video")
    parser.add_argument("--img_dir", help="or: directory of frames")
    parser.add_argument("--vid_dir",
                        help="or: run on every *.mp4 in a directory "
                             "(demo_video.py:229-231)")
    parser.add_argument("--track_json",
                        help="PoseFlow tracked json; when absent the "
                             "AlphaPose/PoseFlow pipeline runs via "
                             "compute_tracks (requires --vid_path/--vid_dir)")
    parser.add_argument("--track_dir",
                        help="where track intermediates go "
                             "(default: --out_dir)")
    parser.add_argument("--alphapose_dir",
                        help="AlphaPose checkout (see extract_tracks)")
    parser.add_argument("--poseflow_dir",
                        help="PoseFlow checkout (see extract_tracks)")
    parser.add_argument("--load_path", required=True,
                        help="checkpoint dir (orbax) or .npz params")
    parser.add_argument("--smpl_model_path", required=True)
    parser.add_argument("--out_dir", default="demo_output")
    parser.add_argument("--track_id", type=int, default=0)
    parser.add_argument("--trim", action="store_true")
    parser.add_argument("--no_render", action="store_true")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--T", type=int, default=20)
    parser.add_argument("--fast", action="store_true",
                        help="fused SMPL kernel + bf16 encoder "
                             "(~2e-3 relative deviation)")
    args = parser.parse_args(argv)
    n_inputs = sum(bool(x) for x in (args.vid_path, args.img_dir, args.vid_dir))
    if n_inputs != 1:
        parser.error(
            "exactly one of --vid_path / --img_dir / --vid_dir is required"
        )
    if args.img_dir and not args.track_json:
        parser.error("--img_dir requires --track_json (no video to track)")
    if args.vid_dir and args.track_json:
        parser.error("--vid_dir computes tracks per video; "
                     "--track_json only applies to a single input")

    from human_dynamics_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from human_dynamics_tpu.core.smpl import load_smpl_model
    from human_dynamics_tpu.models.hmmr import HmmrModel
    from human_dynamics_tpu.utils.checkpoint import load_variables

    smpl = load_smpl_model(args.smpl_model_path, joint_type="cocoplus")
    model = HmmrModel(include_resnet=True)
    variables = load_variables(args.load_path)
    predictor = HmmrPredictor(
        model, variables, smpl,
        batch_size=args.batch_size, seq_length=args.T,
        use_fused_smpl=args.fast, bf16_encoder=args.fast,
    )
    trim_length = predictor.model.fov // 2 if args.trim else 0

    if args.vid_dir:
        import glob as globmod

        vid_paths = sorted(globmod.glob(os.path.join(args.vid_dir, "*.mp4")))
        if not vid_paths:
            raise SystemExit(f"no *.mp4 in {args.vid_dir}")
        for vid_path in vid_paths:
            run_on_video(predictor, smpl, args, vid_path, trim_length)
    elif args.vid_path:
        run_on_video(predictor, smpl, args, args.vid_path, trim_length)
    else:
        # Frame directory + precomputed tracks (no video file).
        import cv2

        paths = sorted(
            os.path.join(args.img_dir, f)
            for f in os.listdir(args.img_dir)
            if f.endswith((".png", ".jpg"))
        )
        frames = [
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths
        ]
        _predict_and_render(
            predictor, smpl, args, frames, args.track_json,
            os.path.join(args.out_dir, "hmmr_output"), trim_length,
        )


if __name__ == "__main__":
    main()
