"""Tiny closed-loop run of the synthetic ground-truth gauntlet
(scripts/synthetic_gauntlet.py): generate known-Omega tubes, train
phi-mode from scratch on the real loader/trainer, run the FULL eval
harness on held-out records at each checkpoint, and check the known
Omega starts being recovered (errors drop from the untrained baseline)
plus the demo pkl schema. The full-size run (4000 steps, feature 2048)
lives in docs/synthetic_gauntlet.md; this test keeps the whole loop
honest in CI at toy scale."""

import json
import os
import pickle
from types import SimpleNamespace

import numpy as np


def test_gauntlet_tiny_closed_loop(tmp_path):
    from scripts.synthetic_gauntlet import METRIC_KEYS, run_gauntlet

    args = SimpleNamespace(
        out=str(tmp_path / "g"),
        mode="phi",
        img_size=224,
        e_lr=1e-4,
        bf16=False,
        num_steps=150,
        save_step=75,
        num_tubes=8,
        num_test_tubes=2,
        frames_per_tube=60,
        feature_dim=64,
        num_verts=48,
        batch_size=2,
        T=20,
        seed=0,
        fused=False,
        report=str(tmp_path / "report.md"),
    )
    result = run_gauntlet(args)

    table = {int(k): v for k, v in result["table"].items()}
    steps = sorted(table)
    assert steps[0] == 0 and steps[-1] == 150
    for s in steps:
        for k in METRIC_KEYS:
            assert np.isfinite(table[s][k]), (s, k)

    # 150 toy steps cannot fully recover Omega, but the unaligned
    # errors must already have moved below the untrained floor.
    # (joints_pa is NOT asserted at toy scale: Procrustes alignment
    # leaves an untrained init near the metric floor already — only the
    # full-size run in docs/synthetic_gauntlet.md moves it.)
    assert table[150]["kp"] < table[0]["kp"]
    assert table[150]["joints"] < table[0]["joints"]

    # Demo pkl leg: schema-complete pickle on disk.
    assert result["gates"]["demo_pkl_schema_complete"]
    with open(os.path.join(args.out, "demo_out", "hmmr_output.pkl"),
              "rb") as f:
        preds = pickle.load(f)
    assert preds["omegas"].shape[1] == 85
    assert preds["frame_range"].tolist() == [0, preds["omegas"].shape[0]]

    # Eval-harness artifacts: per-step results JSON + caches exist.
    assert os.path.exists(
        os.path.join(args.out, "gauntlet_results.json")
    )
    with open(os.path.join(args.out, "gauntlet_results.json")) as f:
        saved = json.load(f)
    assert sorted(int(k) for k in saved["table"]) == steps

    # The markdown report was written with the metric table.
    with open(args.report) as f:
        report = f.read()
    assert "| step |" in report and "| 150 |" in report


def test_gauntlet_tiny_image_mode(tmp_path):
    """Image-mode closed loop at toy scale: tubes are rendered skeleton
    frames (jpeg), a RANDOM-INIT resnet_v2_50 trains end-to-end from
    pixels through the real loader (on-device tube augmentation), and
    the full eval harness runs on held-out IMAGE records — there is no
    phi in the records, so any improvement proves the conv path learns.
    The full-size run lives in docs/synthetic_gauntlet_image.md."""
    from scripts.synthetic_gauntlet import run_gauntlet

    args = SimpleNamespace(
        out=str(tmp_path / "gi"),
        mode="image",
        img_size=64,
        e_lr=3e-4,
        bf16=False,
        num_steps=60,
        save_step=60,
        num_tubes=8,
        num_test_tubes=2,
        frames_per_tube=40,
        feature_dim=2048,   # resnet output width (fixed in image mode)
        num_verts=48,
        batch_size=2,
        T=16,   # must exceed the temporal fov (13)
        seed=0,
        fused=False,
        report=str(tmp_path / "report_image.md"),
    )
    result = run_gauntlet(args)

    table = {int(k): v for k, v in result["table"].items()}
    steps = sorted(table)
    assert steps == [0, 60]
    for s in steps:
        for k in ("kp", "kp_pck", "joints", "joints_pa"):
            assert np.isfinite(table[s][k]), (s, k)

    # 60 toy steps of a from-scratch resnet cannot localize joints yet,
    # but the keypoint error must already move below the untrained
    # floor (the kp loss dominates early).
    assert table[60]["kp"] < table[0]["kp"]

    # Demo pkl leg ran through the image path (uint8 frames).
    assert result["gates"]["demo_pkl_schema_complete"]
