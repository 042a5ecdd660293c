"""H3.6M raw-ingestion tests: metadata camera parsing, distortion
projection vs an independent per-point oracle, and the full
raw -> intermediate -> tfrecord chain on synthetic assets
(read_human36m.py parity without spacepy/CDF)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from human_dynamics_tpu.datasets.h36m_raw import (
    action_name_map,
    camera_parameters,
    convert_raw,
    euler_xyz_to_rotation,
    poses_to_lsp14,
    project_points,
    read_cameras_metadata,
    read_pose_file,
    reprojection_error,
)

RNG = np.random.RandomState(17)


def _oracle_project(point, rot, t, f, c, k3, p2):
    """Single-point projection written independently from the module."""
    x = rot @ (point - t)
    u, v = x[0] / x[2], x[1] / x[2]
    r2 = u * u + v * v
    radial = 1 + k3[0] * r2 + k3[1] * r2**2 + k3[2] * r2**3
    tan = p2[0] * v + p2[1] * u
    ud = u * (radial + tan) + p2[1] * r2
    vd = v * (radial + tan) + p2[0] * r2
    return np.array([ud * f[0] + c[0], vd * f[1] + c[1]])


def test_euler_rotation_is_orthonormal():
    r = euler_xyz_to_rotation([0.3, -1.1, 2.0])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)
    # Pure z rotation sanity.
    rz = euler_xyz_to_rotation([0, 0, np.pi / 2])
    np.testing.assert_allclose(
        rz @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)


def test_project_points_matches_oracle():
    rot = euler_xyz_to_rotation(RNG.randn(3))
    t = RNG.randn(3) * 100
    f = np.array([1100.0, 1105.0])
    c = np.array([512.0, 500.0])
    k3 = np.array([-0.2, 0.05, -0.001])
    p2 = np.array([0.001, -0.002])
    # World points placed in front of the camera: X_cam = R (P - t),
    # so P = R^T X_cam + t for positive-depth camera points.
    cam_pts = RNG.randn(6, 14, 3) * 200 + np.array([0, 0, 4000.0])
    pts = cam_pts @ rot + t
    got = project_points(pts, rot, t, f, c, k3, p2)
    want = np.stack([
        np.stack([
            _oracle_project(p, rot, t, f, c, k3, p2) for p in frame
        ]) for frame in pts
    ])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def _write_metadata(path, tokens, names):
    root = ET.Element("root")
    w0 = ET.SubElement(root, "w0")
    w0.text = "[" + " ".join(f"{t:.10g}" for t in tokens) + "]"
    mapping = ET.SubElement(root, "mapping")
    for row in names:
        tr = ET.SubElement(mapping, "tr")
        for cell in row:
            td = ET.SubElement(tr, "td")
            td.text = cell
    ET.ElementTree(root).write(path)


def _synth_tokens(rng):
    """Random full w0 block: 4 cams x 11 subjects x 6 ext + 4 x 9 intr."""
    return rng.randn(4 * 11 * 6 + 4 * 9)


def test_metadata_camera_slicing(tmp_path):
    tokens = _synth_tokens(RNG)
    xml = tmp_path / "metadata.xml"
    _write_metadata(str(xml), tokens, [])
    got = read_cameras_metadata(str(xml))
    np.testing.assert_allclose(got, tokens, rtol=1e-9)

    cam = camera_parameters(got, subject=3, camera=2)
    # Extrinsics at (cam-1)*11*6 + (sbj-1)*6 (read_human36m.py:150-152).
    start = (1 * 11 + 2) * 6
    np.testing.assert_allclose(
        cam["rotation"],
        euler_xyz_to_rotation(tokens[start:start + 3]), rtol=1e-9)
    np.testing.assert_allclose(
        cam["translation"], tokens[start + 3:start + 6], rtol=1e-9)
    istart = 4 * 11 * 6 + 1 * 9
    np.testing.assert_allclose(cam["focal"], tokens[istart:istart + 2])
    np.testing.assert_allclose(
        cam["principal"], tokens[istart + 2:istart + 4])
    np.testing.assert_allclose(
        cam["k_radial"], tokens[istart + 4:istart + 7])
    np.testing.assert_allclose(
        cam["p_tangential"], tokens[istart + 7:istart + 9])


def test_pose_file_npy_standin(tmp_path):
    poses = RNG.randn(1, 9, 64).astype(np.float32)  # [1, N, 32*2]
    p = tmp_path / "pose.npy"
    np.save(p, poses)
    arr = read_pose_file(str(p), dim=2)
    assert arr.shape == (9, 32, 2)
    lsp = poses_to_lsp14(arr)
    assert lsp.shape == (9, 14, 2)
    # Spot-check the joint routing: LSP idx 0 (R ankle) is raw joint 3.
    np.testing.assert_allclose(lsp[:, 0], arr[:, 3])
    # LSP idx 13 (head) is raw joint 15 (17-subset idx 10).
    np.testing.assert_allclose(lsp[:, 13], arr[:, 15])


@pytest.fixture()
def raw_h36m(tmp_path):
    """Synthetic raw release: 1 subject, 1 action, 1 trial, 2 cameras,
    consistent gt3d->gt2d projections."""
    import cv2

    raw = tmp_path / "raw"
    n, fps = 12, 10
    tokens = _synth_tokens(RNG)
    # Make camera intrinsics sane for reprojection checks.
    for cam_id in range(4):
        istart = 4 * 11 * 6 + cam_id * 9
        tokens[istart:istart + 9] = [
            1100, 1100, 512, 512, -0.2, 0.05, -0.001, 0.001, -0.002,
        ]
    names = [
        ["not", "a", "row"],
        # action_id 1 (table value 2), trial 1; names for S1..S11.
        ["2", "1"] + [f"Walking {s}" for s in range(1, 12)],
    ]
    raw.mkdir()
    _write_metadata(str(raw / "metadata.xml"), tokens, names)

    seq_name = "Walking 1"
    s_dir = raw / "S1"
    (s_dir / "Videos").mkdir(parents=True)
    (s_dir / "MyPoseFeatures" / "D2_Positions").mkdir(parents=True)
    (s_dir / "MyPoseFeatures" / "D3_Positions_mono").mkdir(parents=True)

    for cam in (1, 2):
        # Camera-frame 3D (mono), mm, in front of the camera.
        pose3d = RNG.randn(n, 32, 3) * 150 + np.array([0, 0, 4000.0])
        cam_params = camera_parameters(tokens, 1, cam)
        pose2d = project_points(
            pose3d, np.eye(3), np.zeros(3),
            cam_params["focal"], cam_params["principal"],
            cam_params["k_radial"], cam_params["p_tangential"],
        )
        np.save(
            s_dir / "MyPoseFeatures" / "D2_Positions" /
            f"{seq_name}.cam{cam}.npy",
            pose2d.reshape(1, n, 64).astype(np.float32))
        np.save(
            s_dir / "MyPoseFeatures" / "D3_Positions_mono" /
            f"{seq_name}.cam{cam}.npy",
            pose3d.reshape(1, n, 96).astype(np.float32))
        vid_path = str(s_dir / "Videos" / f"{seq_name}.cam{cam}.mp4")
        w = cv2.VideoWriter(
            vid_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (64, 64))
        for i in range(n):
            w.write(np.full((64, 64, 3), i * 10, np.uint8))
        w.release()
    return str(raw)


def test_convert_raw_end_to_end(raw_h36m, tmp_path):
    out = str(tmp_path / "intermediate")
    dirs = convert_raw(
        raw_h36m, out, subjects=(1,), frame_skip=2, cameras=(1, 2),
    )
    assert len(dirs) == 2
    assert os.path.basename(dirs[0]) == "S1_Directions_0_cam00"

    for d in dirs:
        gt2d = np.load(os.path.join(d, "gt2d.npy"))
        gt3d = np.load(os.path.join(d, "gt3d.npy"))
        assert gt2d.shape == (6, 14, 3) and gt3d.shape == (6, 14, 3)
        assert np.all(gt2d[..., 2] == 1)  # visibility column
        frames = sorted(os.listdir(os.path.join(d, "frames")))
        assert len(frames) == 6
        # gt3d projects back onto gt2d through the stored camera.
        assert reprojection_error(d) < 1e-3

    # Idempotent second pass.
    dirs2 = convert_raw(
        raw_h36m, out, subjects=(1,), frame_skip=2, cameras=(1, 2))
    assert dirs2 == dirs

    # The intermediate feeds the existing tfrecord converter.
    from human_dynamics_tpu.datasets.h36m import load_sequence

    seq = load_sequence(dirs[0])
    assert seq is not None
    assert seq["gt2d"].shape == (6, 25, 3)
    assert seq["gt3d"].shape == (6, 14, 3)


# ---------------------------------------------------------------------------
# CDF backend import branches (neither spacepy nor cdflib is installed
# here, so these run against stub modules monkeypatched into sys.modules;
# the npy stand-in path is covered by the tests above).
# ---------------------------------------------------------------------------

def _fake_pose():
    return RNG.rand(1, 5, 96).astype(np.float64)


def test_read_cdf_pose_spacepy_branch(monkeypatch, tmp_path):
    import sys
    import types

    arr = _fake_pose()

    class FakeCDF:
        def __init__(self, path):
            assert path.endswith(".cdf")

        def __enter__(self):
            return {"Pose": arr}

        def __exit__(self, *exc):
            return False

    pycdf = types.ModuleType("spacepy.pycdf")
    pycdf.CDF = FakeCDF
    spacepy = types.ModuleType("spacepy")
    spacepy.pycdf = pycdf
    monkeypatch.setitem(sys.modules, "spacepy", spacepy)
    monkeypatch.setitem(sys.modules, "spacepy.pycdf", pycdf)

    got = read_pose_file(str(tmp_path / "D3_Positions.cdf"), dim=3)
    np.testing.assert_allclose(got, arr[0].reshape(5, 32, 3))


def test_read_cdf_pose_cdflib_branch(monkeypatch, tmp_path):
    import sys
    import types

    arr = _fake_pose()

    class FakeCDF:
        def __init__(self, path):
            assert path.endswith(".cdf")

        def varget(self, name):
            assert name == "Pose"
            return arr

    cdflib = types.ModuleType("cdflib")
    cdflib.CDF = FakeCDF
    # spacepy absent: None in sys.modules makes the import raise.
    monkeypatch.setitem(sys.modules, "spacepy", None)
    monkeypatch.setitem(sys.modules, "cdflib", cdflib)

    got = read_pose_file(str(tmp_path / "D3_Positions.cdf"), dim=3)
    np.testing.assert_allclose(got, arr[0].reshape(5, 32, 3))


def test_read_cdf_pose_no_backend_message(monkeypatch, tmp_path):
    import sys

    monkeypatch.setitem(sys.modules, "spacepy", None)
    monkeypatch.setitem(sys.modules, "cdflib", None)
    with pytest.raises(ImportError, match="spacepy or cdflib"):
        read_pose_file(str(tmp_path / "poses.cdf"), dim=3)
