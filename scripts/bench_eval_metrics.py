"""Eval-path timing: on-device metrics vs the numpy oracle path.

`Evaluator(device_metrics=True)` computes each tube's error dict as ONE
jitted program (eval/metrics_device.py) and fetches <=9 scalars; the
numpy path fetches every prediction array (incl. (N, 6890, 3) verts) to
host first. Parity between the two is asserted by
tests/test_eval_device_metrics.py — this script measures what the
design choice is FOR: wall-clock of a full `Evaluator.run` over
synthetic 3dpw-style test records, both modes, on the real chip.

Through this environment's tunneled runtime (device->host ~0.6 MB/s,
CLAUDE.md) the gap is extreme; on local PCIe the same structure is
what keeps eval at device speed instead of transfer speed.

Method: both paths are compile- and cache-warmed on one record
(max_records=1, throwaway output dirs), then each full run is timed
once into a fresh output dir. The runs do identical prediction work
(same predictor, same records); they differ only in where the error
dict is computed and what crosses the link.

Usage:
    python scripts/bench_eval_metrics.py [--tubes 4 --frames 240]
        [--json docs/eval_device_metrics_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tubes", type=int, default=4,
                    help="held-out test tubes (one record each)")
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--num_verts", type=int, default=6890)
    ap.add_argument("--feature_dim", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--T", type=int, default=20)
    ap.add_argument("--out", default="/tmp/hd_tpu_bench_eval")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from human_dynamics_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")

    from scripts.stability_run import generate_data

    from human_dynamics_tpu.core.smpl import load_smpl_model
    from human_dynamics_tpu.eval.harness import Evaluator
    from human_dynamics_tpu.infer.predictor import HmmrPredictor
    from human_dynamics_tpu.models.hmmr import HmmrModel

    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.makedirs(args.out)
    data_dir, smpl_path = generate_data(
        args.out,
        num_tubes=4,                      # train shards (unused here)
        frames_per_tube=args.frames,
        feature_dim=args.feature_dim,
        num_verts=args.num_verts,
        seed=0,
        num_test_tubes=args.tubes,
        test_dataset="3dpw",
    )
    smpl = load_smpl_model(smpl_path, joint_type="cocoplus")
    model = HmmrModel(include_resnet=False, feature_dim=args.feature_dim)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, args.T, args.feature_dim))
    )
    predictor = HmmrPredictor(
        model, variables, smpl,
        batch_size=args.batch_size, seq_length=args.T,
        use_fused_smpl=True,
    )

    def evaluator(tag, device_metrics):
        return Evaluator(
            predictor, os.path.join(args.out, tag),
            model_tag="bench", device_metrics=device_metrics,
        )

    # Warm both paths (compiles + any lazy jits) on one record.
    for dm in (True, False):
        evaluator(f"warm_{dm}", dm).eval_dataset(
            "3dpw", data_dir, split="test", max_records=1
        )

    def timed(tag, device_metrics):
        ev = evaluator(tag, device_metrics)
        t0 = time.perf_counter()
        results = ev.run(data_dir, ["3dpw"], split="test")
        dt = time.perf_counter() - t0
        return dt, results["3dpw"]

    t_np, m_np = timed("numpy", False)
    t_dev, m_dev = timed("device", True)

    # Same answer (the device path's contract), tube-count tolerance.
    for k, v in m_dev.items():
        ref = m_np[k]
        assert abs(v - ref) <= 1e-3 * max(1.0, abs(ref)), (k, v, ref)

    out = {
        "tubes": args.tubes,
        "frames_per_tube": args.frames,
        "num_verts": args.num_verts,
        "numpy_path_s": round(t_np, 2),
        "device_metrics_s": round(t_dev, 2),
        "speedup": round(t_np / t_dev, 1),
        "metrics_agree": True,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
