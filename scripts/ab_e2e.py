"""Interleaved A/B of end-to-end predictor configurations on one chip.

Same measurement discipline as bench.py (fetch-verified two-length
differencing, globally advancing inputs), but alternating between named
configurations rep by rep so tunnel/session drift hits both arms
equally. Prints one JSON line per configuration with the per-clip
median and all rep diffs.

Usage:
  python scripts/ab_e2e.py --reps 10 base root_wfold
Configs: base (int8 static), root_s2d, root_wfold, bf16, chunk96,
         chunk112 (int8 static at other encode chunks).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from human_dynamics_tpu.utils.cache import enable_compilation_cache


def build_predictors(names, model, variables, smpl, calib):
    from human_dynamics_tpu.infer import HmmrPredictor

    common = dict(batch_size=8, seq_length=20, use_fused_smpl=True,
                  bf16_temporal=True)
    cfgs = {
        "base": dict(int8_encoder=True, int8_calibration=calib),
        "root_s2d": dict(int8_encoder=True, int8_calibration=calib,
                         int8_root=True),
        "root_wfold": dict(int8_encoder=True, int8_calibration=calib,
                           int8_root="wfold"),
        # Byte-direct root: pair with --uint8 (raw frames feed the
        # int8 conv as u ^ 0x80; no full-res normalize/quantize pass).
        "root_u8": dict(int8_encoder=True, int8_calibration=calib,
                        int8_root="u8"),
        "bf16": dict(bf16_encoder=True),
        "chunk96": dict(int8_encoder=True, int8_calibration=calib,
                        encode_chunk=96),
        "chunk112": dict(int8_encoder=True, int8_calibration=calib,
                         encode_chunk=112),
    }
    return {
        name: HmmrPredictor(
            model, variables, smpl, **common, **cfgs[name]
        )
        for name in names
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("configs", nargs="+")
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--frames", type=int, default=480)
    p.add_argument("--uint8", action="store_true",
                   help="feed raw uint8 frames (device-side normalize)")
    args = p.parse_args()

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.models import HmmrModel

    n = args.frames
    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=6890, num_kps=25)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 224, 224, 3))
    )
    inputs = [
        jax.random.uniform(
            jax.random.PRNGKey(k), (n, 224, 224, 3),
            minval=-1.0, maxval=1.0,
        )
        for k in range(10)
    ]
    if args.uint8:
        inputs = [
            ((x + 1.0) * 127.5).astype(jnp.uint8) for x in inputs
        ]
    preds = build_predictors(
        args.configs, model, variables, smpl, inputs[0][:32]
    )

    cursor = [0]

    def run_block(pred, iters):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = pred.predict_all_images(
                inputs[cursor[0] % len(inputs)], as_numpy=False
            )
            cursor[0] += 1
        checksum = float(jnp.sum(out["verts"]))
        assert np.isfinite(checksum)
        return time.time() - t0

    # Warm every arm first (compile), then interleave timed reps.
    for name, pred in preds.items():
        t0 = time.time()
        run_block(pred, 1)
        print(f"# warm {name}: {time.time() - t0:.1f} s", flush=True)

    diffs = {name: [] for name in preds}
    for r in range(args.reps):
        for name, pred in preds.items():
            t_short = run_block(pred, 1)
            t_long = run_block(pred, 4)
            diffs[name].append((t_long - t_short) / 3)
        print(f"# rep {r}: " + " ".join(
            f"{k}={v[-1] * 1e3:.1f}ms" for k, v in diffs.items()
        ), flush=True)

    for name, d in diffs.items():
        med = float(np.median(d))
        print(json.dumps({
            "config": name,
            "ms_per_clip": round(med * 1e3, 2),
            "frames_per_s": round(n / med, 1),
            "reps_ms": [round(x * 1e3, 1) for x in d],
        }), flush=True)


if __name__ == "__main__":
    main()
