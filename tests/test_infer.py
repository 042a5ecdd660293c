"""Tests for the windowed inference engine and host-side preprocessing.

The window-stitch parity test (SURVEY.md §4 implication (3)) mimics the
reference's predict_all_images loop (tester.py:260-312) in plain numpy
against the same fake model, and requires exact agreement with the
single-jitted-program predictor.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.infer import HmmrPredictor, WindowSchedule
from human_dynamics_tpu.infer.bbox import (
    get_all_bbox_params,
    get_smooth_bbox_params,
    kp_to_bbox_param,
)
from human_dynamics_tpu.infer.crop import process_image
from human_dynamics_tpu.infer.tracks import get_labels_poseflow
from human_dynamics_tpu.models.hmmr import HmmrOutputs
from human_dynamics_tpu.models.omega import compute_smpl, split_omega

RNG = np.random.RandomState(7)


# ---------------------------------------------------------------------------
# Window schedule math
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [1, 7, 8, 63, 64, 65, 100, 500])
def test_window_schedule_matches_reference_formulas(n):
    b, t, fov = 8, 20, 13
    s = WindowSchedule(num_frames=n, batch_size=b, seq_length=t, fov=fov)
    margin = (fov - 1) // 2
    g = t - 2 * margin
    count = int(np.ceil(n / (g * b)))
    num_fill = count * b * g + t - n
    assert s.margin == margin == 6
    assert s.good_frames == g == 8
    assert s.count == count
    assert s.num_fill == num_fill
    assert s.padded_length == margin + n + num_fill
    # Every window fits in the padded array.
    starts = s.window_starts()
    assert starts[-1] + t <= s.padded_length
    # Stitch covers exactly N frames.
    assert s.num_windows * g >= n


def test_window_pad_and_stitch_roundtrip():
    s = WindowSchedule(num_frames=100, batch_size=4, seq_length=20, fov=13)
    frames = RNG.randn(100, 3).astype(np.float32)
    padded = s.pad(frames)
    assert padded.shape == (s.padded_length, 3)
    np.testing.assert_array_equal(padded[:s.margin], 0)
    np.testing.assert_array_equal(padded[s.margin:s.margin + 100], frames)
    # Kept-center gather reproduces the original frame order.
    g, m = s.good_frames, s.margin
    wins = np.stack([
        padded[i * g:i * g + s.seq_length] for i in range(s.num_windows)
    ]).reshape(s.count, s.batch_size, s.seq_length, 3)
    stitched = s.stitch(wins[:, :, m:m + g])
    np.testing.assert_array_equal(stitched, frames)


# ---------------------------------------------------------------------------
# Predictor vs reference-style window loop
# ---------------------------------------------------------------------------

class FakeHmmrModel:
    """Deterministic stand-in exposing the HmmrModel surface."""

    num_conv_layers = 3
    delta_t_values = (-5, 5)
    fov = 13
    include_resnet = False

    def apply(self, variables, windows, train=False):
        assert not train
        w = np.asarray if isinstance(windows, np.ndarray) else jnp
        phi = windows
        present = jnp.tanh(phi[..., :85]) * 0.5
        present = present.at[..., 0].set(1.0 + 0.1 * jnp.tanh(phi[..., 0]))
        deltas = {
            dt: jnp.concatenate(
                [
                    jnp.ones_like(phi[..., :1]),
                    jnp.zeros_like(phi[..., :2]),
                    jnp.tanh(phi[..., 85:157]) * 0.3 + 0.01 * dt,
                    present[..., 75:],
                ],
                axis=-1,
            )
            for dt in self.delta_t_values
        }
        return HmmrOutputs(
            omega_pred=present,
            omegas_delta=deltas,
            omega_hal=None,
            omegas_hal_delta={},
            movie_strip=phi,
            hal_strip=None,
            phi=phi,
        )


def reference_predict_all_images(model, smpl, all_phi, b, t):
    """Numpy mimic of tester.py:260-312 + make_fetch_dict."""
    n = len(all_phi)
    fov = model.fov
    margin = (fov - 1) // 2
    g = t - 2 * margin
    count = int(np.ceil(n / (g * b)))
    num_fill = count * b * g + t - n
    d = all_phi.shape[-1]
    padded = np.concatenate(
        [np.zeros((margin, d)), all_phi, np.zeros((num_fill, d))], axis=0
    ).astype(np.float32)
    batched = np.stack(
        [padded[i * g:i * g + t] for i in range(count * b)]
    ).reshape(count, b, t, d)

    results = {}
    for images in batched:
        out = model.apply(None, jnp.asarray(images), train=False)
        present = out.omega_pred
        cams = split_omega(present)[0]
        fetch = {}

        def head_fetch(raw, cams_use, suffix=""):
            sm = compute_smpl(
                smpl, raw, use_optcam=False, cams_override=cams_use
            )
            return {
                "cams" + suffix: np.asarray(cams_use),
                "joints" + suffix: np.asarray(sm.joints),
                "kps" + suffix: np.asarray(sm.kps),
                "poses" + suffix: np.asarray(sm.poses_rot),
                "shapes" + suffix: np.asarray(split_omega(raw)[2]),
                "verts" + suffix: np.asarray(sm.verts),
                "omegas" + suffix: np.asarray(raw),
            }

        fetch.update(head_fetch(present, cams))
        delta_parts = []
        for dt in sorted(out.omegas_delta):
            delta_parts.append(head_fetch(out.omegas_delta[dt], cams, "_d"))
        for key in delta_parts[0]:
            fetch[key + "elta"] = np.stack(
                [p[key] for p in delta_parts], axis=2
            )
        for k, v in fetch.items():
            results.setdefault(k, []).append(v)

    new_results = {}
    for k, v in results.items():
        v = np.array(v)[:, :, margin:-margin]
        old_shape = v.shape[3:]
        new_results[k] = v.reshape((-1,) + old_shape)[:n]
    return new_results


def test_predictor_matches_reference_window_loop():
    smpl = synthetic_smpl_model(num_verts=48, num_kps=19)
    model = FakeHmmrModel()
    b, t = 2, 20
    n = 37
    phi = RNG.randn(n, 160).astype(np.float32) * 0.5

    pred = HmmrPredictor(
        model, variables=None, smpl=smpl, batch_size=b, seq_length=t
    )
    got = pred.predict_all_images(phi)
    want = reference_predict_all_images(model, smpl, phi, b, t)

    assert set(got) == set(want)
    for k in sorted(want):
        assert got[k].shape == want[k].shape, k
        np.testing.assert_allclose(got[k], want[k], atol=2e-5, err_msg=k)
    # Schema sanity: shapes per tester.make_fetch_dict.
    assert got["omegas"].shape == (n, 85)
    assert got["poses"].shape == (n, 24, 3, 3)
    assert got["verts"].shape == (n, 48, 3)
    assert got["cams_delta"].shape == (n, 2, 3)
    # Delta cams equal present cams (tester set_cams).
    np.testing.assert_allclose(got["cams_delta"][:, 0], got["cams"])


def test_predictor_rejects_bad_pred_mode():
    smpl = synthetic_smpl_model(num_verts=16)
    with pytest.raises(ValueError):
        HmmrPredictor(FakeHmmrModel(), None, smpl, pred_mode="nope")


def test_bucket_values():
    from human_dynamics_tpu.infer.predictor import _bucket

    for x, want in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 6), (6, 6),
                    (7, 8), (8, 8), (9, 12), (12, 12), (13, 16),
                    (17, 24), (25, 32)]:
        assert _bucket(x) == want, x
    for x in range(1, 200):
        assert _bucket(x) >= x
        assert _bucket(x) < 1.5 * x + 1  # waste bound


def test_groups_per_step_chunking_matches_single_batch():
    """Many window groups split into groups_per_step super-chunks must
    equal processing them in one batch (and the reference loop)."""
    smpl = synthetic_smpl_model(num_verts=48, num_kps=19)
    model = FakeHmmrModel()
    b, t = 2, 20
    n = 130  # count = ceil(130/16) = 9 -> bucket 12 groups
    phi = RNG.randn(n, 160).astype(np.float32) * 0.5

    outs = {}
    # gps=8 does NOT divide the 12-group count: the predictor must run
    # the largest fitting divisor (6), not one 12-group mega-step.
    for gps in (2, 8, 12):
        pred = HmmrPredictor(
            model, variables=None, smpl=smpl, batch_size=b,
            seq_length=t, groups_per_step=gps,
        )
        outs[gps] = pred.predict_all_images(phi)
    for gps in (8, 12):
        for k in outs[2]:
            np.testing.assert_allclose(
                outs[2][k], outs[gps][k], atol=1e-6, err_msg=f"{gps}:{k}"
            )
    want = reference_predict_all_images(model, smpl, phi, b, t)
    for k in sorted(want):
        np.testing.assert_allclose(
            outs[2][k], want[k], atol=2e-5, err_msg=k
        )


def test_unrolled_chunk_loop_matches_lax_map():
    """unroll_chunks replaces the fused program's per-chunk lax.map with
    a flat unrolled graph; results must be identical (same per-chunk
    math, different scheduling only) in both fp32 and int8-static
    encoder modes."""
    from human_dynamics_tpu.models import HmmrModel

    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    images = RNG.rand(25, 64, 64, 3).astype(np.float32) * 2 - 1
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    kw = dict(batch_size=2, seq_length=20, encode_chunk=16)
    for int8 in (False, True):
        ikw = (
            dict(int8_encoder=True, int8_calibration=images[:8])
            if int8 else {}
        )
        base = HmmrPredictor(model, variables, smpl, **kw, **ikw)
        unrolled = HmmrPredictor(
            model, variables, smpl, unroll_chunks=8, **kw, **ikw
        )
        want = base.predict_all_images(images)
        got = unrolled.predict_all_images(images)
        assert set(got) == set(want)
        for k in sorted(want):
            np.testing.assert_allclose(
                got[k], want[k], atol=1e-6,
                err_msg=f"int8={int8}:{k}",
            )


def test_uint8_frames_match_normalized_float():
    """Raw uint8 frames (normalized on device inside the fused program)
    must produce the same predictions as host-normalized [-1,1] floats,
    in both the fp32 and int8-static encoder modes — including uint8
    calibration frames."""
    from human_dynamics_tpu.models import HmmrModel

    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    raw = RNG.randint(0, 256, (25, 64, 64, 3)).astype(np.uint8)
    norm = ((raw / 255.0) - 0.5) * 2  # crop.py:52 host convention
    norm = norm.astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    kw = dict(batch_size=2, seq_length=20, encode_chunk=16)
    for int8 in (False, True):
        fkw = (
            dict(int8_encoder=True, int8_calibration=norm[:8])
            if int8 else {}
        )
        ukw = (
            dict(int8_encoder=True, int8_calibration=raw[:8])
            if int8 else {}
        )
        pf = HmmrPredictor(model, variables, smpl, **kw, **fkw)
        pu = HmmrPredictor(model, variables, smpl, **kw, **ukw)
        want = pf.predict_all_images(norm)
        got = pu.predict_all_images(raw)
        assert set(got) == set(want)
        # fp32: same math up to the fp association of the normalization
        # (host (x/255-0.5)*2 vs device x*(2/255)-1). int8: the uint8
        # calibration batch yields fractionally different static scales,
        # which moves requant rounding boundaries — quantization-level
        # deviation, same budget as the other int8 e2e tests.
        atol = 0.2 if int8 else 1e-3
        np.testing.assert_allclose(
            got["omegas"], want["omegas"], atol=atol,
            err_msg=f"int8={int8}",
        )
        np.testing.assert_allclose(
            got["verts"], want["verts"], atol=atol,
            err_msg=f"int8={int8}",
        )


def test_bf16_temporal_close_to_fp32():
    """The opt-in bf16 window tail must stay within bf16 tolerance of
    the fp32 path (omegas are cast back to fp32 before SMPL)."""
    from human_dynamics_tpu.models import HmmrModel

    model = HmmrModel(include_resnet=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)))
    smpl = synthetic_smpl_model(num_verts=48, num_kps=19)
    phi = RNG.randn(40, 2048).astype(np.float32) * 0.1

    out32 = HmmrPredictor(
        model, variables, smpl, batch_size=2, seq_length=20,
    ).predict_all_images(phi)
    out16 = HmmrPredictor(
        model, variables, smpl, batch_size=2, seq_length=20,
        bf16_temporal=True,
    ).predict_all_images(phi)
    assert out16["omegas"].dtype == np.float32
    # Omegas start near mean_param (small IEF outputs); absolute bf16
    # deviation stays well under typical pose magnitudes.
    d = np.abs(out32["omegas"] - out16["omegas"]).max()
    assert d < 0.05, d
    # Delta-head cams track the (bf16-rounded) present cams.
    np.testing.assert_allclose(
        out16["cams_delta"][:, 0], out16["cams"], atol=1e-6
    )


# ---------------------------------------------------------------------------
# Host-side preprocessing
# ---------------------------------------------------------------------------

def _make_kp(cx, cy, h, k=25):
    kp = np.zeros((k, 3))
    kp[:, 0] = np.linspace(cx - h / 4, cx + h / 4, k)
    kp[:, 1] = np.linspace(cy - h / 2, cy + h / 2, k)
    kp[:, 2] = 1.0
    return kp


def test_kp_to_bbox_param():
    kp = _make_kp(100, 80, 60)
    p = kp_to_bbox_param(kp, vis_thresh=0.5)
    np.testing.assert_allclose(p[:2], [100, 80], atol=1e-6)
    height = np.linalg.norm(kp[:, :2].max(0) - kp[:, :2].min(0))
    np.testing.assert_allclose(p[2], 150.0 / height)
    assert kp_to_bbox_param(None, 0.5) is None
    assert kp_to_bbox_param(np.zeros((25, 3)), 0.5) is None


def test_bbox_interpolation_over_gap():
    kps = [None, _make_kp(10, 10, 50), None, None, _make_kp(40, 40, 50),
           _make_kp(50, 50, 50), None]
    params, start, end = get_all_bbox_params(kps, vis_thresh=0.5)
    assert start == 1
    assert end == 6
    assert len(params) == 5  # frames 1..5
    # Gap frames 2, 3 linearly interpolated between (10,10) and (40,40).
    np.testing.assert_allclose(params[1, :2], [20, 20], atol=1e-6)
    np.testing.assert_allclose(params[2, :2], [30, 30], atol=1e-6)


def test_smooth_bbox_prepends_zeros():
    kps = [None] * 3 + [_make_kp(10 + i, 10, 50) for i in range(30)]
    smoothed, start, end = get_smooth_bbox_params(kps, vis_thresh=0.5)
    assert start == 3
    np.testing.assert_array_equal(smoothed[:3], 0)
    assert len(smoothed) == 33


def test_process_image_shapes_and_range():
    img = RNG.randint(0, 255, (300, 400, 3)).astype(np.uint8)
    out = process_image(img, np.array([200.0, 150.0, 1.0]))
    assert out["image"].shape == (224, 224, 3)
    assert out["image"].min() >= -1.0 and out["image"].max() <= 1.0
    assert out["im_shape"] == [224, 224]
    # Center content preserved: crop center pixel equals source pixel.
    src = ((img[150, 200] / 255.0) - 0.5) * 2
    np.testing.assert_allclose(out["image"][112, 112], src, atol=0.05)


def test_process_image_scale():
    img = RNG.randint(0, 255, (200, 200, 3)).astype(np.uint8)
    out = process_image(img, np.array([100.0, 100.0, 2.0]))
    assert out["image"].shape == (224, 224, 3)
    assert out["scale"] == 2.0


def test_get_labels_poseflow(tmp_path):
    data = {}
    for i in range(30):
        frame = f"frame{i:04d}.png"
        people = []
        # track 0: all 30 frames; track 1: frames 5..27 (23 frames);
        # track 2: only 3 frames (dropped by min_kp_count=20).
        people.append({"keypoints": [1.0, 2.0, 0.9] * 25, "idx": 0})
        if 5 <= i < 28:
            people.append({"keypoints": [3.0, 4.0, 0.8] * 25, "idx": 1})
        if i < 3:
            people.append({"keypoints": [5.0, 6.0, 0.7] * 25, "idx": 2})
        data[frame] = people
    path = tmp_path / "tracked.json"
    path.write_text(json.dumps(data))

    tracks = get_labels_poseflow(str(path), num_frames=30)
    assert len(tracks) == 2  # short track dropped
    assert all(len(t) == 30 for t in tracks)
    # longest first
    assert sum(k is not None for k in tracks[0]) == 30
    assert sum(k is not None for k in tracks[1]) == 23
    assert tracks[1][0] is None and tracks[1][5] is not None
    assert tracks[0][0].shape == (25, 3)


# ---------------------------------------------------------------------------
# Track-extraction subprocess contract (stub AlphaPose/PoseFlow)
# ---------------------------------------------------------------------------

def test_compute_tracks_with_stub_trackers(tmp_path):
    """Drives compute_tracks end-to-end with stub tracker scripts so the
    subprocess contract (arg names, output paths, idempotency) is actually
    exercised (reference: extract_tracks.py:63-150)."""
    from human_dynamics_tpu.infer.extract_tracks import (
        TRACKED_JSON, compute_tracks)

    out_dir = tmp_path / "out"
    # Pre-seed frames so dump_frames (idempotent) skips the video decode.
    img_dir = out_dir / "video_frames"
    img_dir.mkdir(parents=True)
    (img_dir / "frame0000000001.png").write_bytes(b"png")

    alphapose_dir = tmp_path / "AlphaPose"
    alphapose_dir.mkdir()
    (alphapose_dir / "demo.py").write_text(
        "import argparse, json, os\n"
        "p = argparse.ArgumentParser()\n"
        "p.add_argument('--indir'); p.add_argument('--outdir')\n"
        "p.add_argument('--sp', action='store_true')\n"
        "p.add_argument('--format')\n"
        "a = p.parse_args()\n"
        "assert os.path.isdir(a.indir)\n"
        "open(os.path.join(a.outdir, 'alphapose-results.json'), 'w')"
        ".write(json.dumps({'frame0000000001.png': []}))\n"
    )
    poseflow_dir = tmp_path / "PoseFlow"
    poseflow_dir.mkdir()
    (poseflow_dir / "tracker-general.py").write_text(
        "import argparse, json, os\n"
        "p = argparse.ArgumentParser()\n"
        "p.add_argument('--imgdir'); p.add_argument('--in_json')\n"
        "p.add_argument('--out_json')\n"
        "a = p.parse_args()\n"
        "assert os.path.exists(a.in_json)\n"
        "assert a.out_json.endswith('-tracked.json')\n"
        "open(a.out_json, 'w').write(json.dumps(\n"
        "    {'frame0000000001.png': [{'keypoints': [1.0, 2.0, 0.9] * 25,"
        " 'idx': 0}]}))\n"
    )

    tracked, frames = compute_tracks(
        str(tmp_path / "missing.mp4"), str(out_dir),
        alphapose_dir=str(alphapose_dir), poseflow_dir=str(poseflow_dir))
    assert os.path.basename(tracked) == TRACKED_JSON
    assert os.path.exists(tracked)
    assert frames == str(img_dir)
    # The tracked json is consumable by the demo's track reader.
    tracks = get_labels_poseflow(tracked, num_frames=1, min_kp_count=0)
    assert len(tracks) == 1 and tracks[0][0].shape == (25, 3)

    # Idempotent: wipe the stubs; a second call must not shell out.
    (alphapose_dir / "demo.py").unlink()
    (poseflow_dir / "tracker-general.py").unlink()
    tracked2, _ = compute_tracks(
        str(tmp_path / "missing.mp4"), str(out_dir),
        alphapose_dir=str(alphapose_dir), poseflow_dir=str(poseflow_dir))
    assert tracked2 == tracked
