"""Streaming (live-video) latency benchmark on the real chip.

Measures what `docs/serving.md` specifies only in frames
(latency_frames = quantum + margin): the wall-clock cost of one
StreamingPredictor emission, per serving config:

- phi mode, batch_size=1 (lowest latency) and 8 (throughput),
- image mode (full ResNet-50, 224x224 uint8 frames) with the serving
  encoder config (calibrated static int8 + bf16 tail), batch_size=1/8.

Three numbers per config:

1. first_emission_ms: compile-inclusive cost of the first emission in
   this process (the persistent compilation cache makes later processes
   warm — run twice to see the warm number).
2. per-emission p50/p95 ms, measured with a real scalar fetch per
   emission. Through this environment's tunneled runtime each fetch
   carries ~80 ms RTT that does NOT exist on a local deployment, so
   these are upper bounds here; on local PCIe the fetch adds <1 ms.
3. steady_ms: amortized steady-state ms/emission via the only timing
   method that survives the tunnel (CLAUDE.md): two run lengths of
   back-to-back emissions, each ended with one scalar fetch,
   differenced (cancels the fetch RTT), median of repeats.

Usage:
    python scripts/bench_streaming.py [--configs phi_b1 phi_b8 ...]
        [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_predictor(mode: str, batch_size: int):
    import jax
    import jax.numpy as jnp

    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer import HmmrPredictor
    from human_dynamics_tpu.models import HmmrModel

    smpl = synthetic_smpl_model(num_verts=6890, num_kps=25)
    rng = np.random.RandomState(0)
    if mode == "phi":
        model = HmmrModel(include_resnet=False)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 20, 2048))
        )
        pred = HmmrPredictor(
            model, variables, smpl, batch_size=batch_size,
            seq_length=20, use_fused_smpl=True, bf16_temporal=True,
        )

        def make_frames(n):
            return rng.randn(n, 2048).astype(np.float32) * 0.1

        return pred, make_frames
    # image mode: serving config — uint8 frames, calibrated static int8
    # encoder, bf16 tail (the bench.py fast path).
    model = HmmrModel(include_resnet=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 224, 224, 3))
    )
    calib = rng.randint(0, 256, (16, 224, 224, 3)).astype(np.uint8)
    pred = HmmrPredictor(
        model, variables, smpl, batch_size=batch_size, seq_length=20,
        use_fused_smpl=True, bf16_temporal=True,
        int8_encoder=True, int8_calibration=calib,
        encode_chunk=120,
    )

    def make_frames(n):
        return rng.randint(0, 256, (n, 224, 224, 3)).astype(np.uint8)

    return pred, make_frames


def measure(pred, make_frames, n_emissions=40, short=6, long=24, reps=5):
    import jax.numpy as jnp

    from human_dynamics_tpu.infer.streaming import StreamingPredictor

    sp = StreamingPredictor(pred)
    q = sp.quantum

    # --- first emission (compile-inclusive in this process) ---
    t0 = time.perf_counter()
    ems = sp.feed(make_frames(sp.latency_frames))
    assert len(ems) == 1, len(ems)
    _ = float(jnp.sum(ems[0]["omegas"]))
    first_ms = (time.perf_counter() - t0) * 1e3

    # --- per-emission latency with a real fetch per emission ---
    times = []
    for _ in range(n_emissions):
        frames = make_frames(q)
        t0 = time.perf_counter()
        ems = sp.feed(frames)
        assert len(ems) == 1
        _ = float(jnp.sum(ems[0]["omegas"]))
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    p50 = float(np.percentile(times, 50))
    p95 = float(np.percentile(times, 95))

    # --- amortized steady state: two-length difference ---
    def run(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = sp.feed(make_frames(q))[0]
        _ = float(jnp.sum(last["omegas"]))
        return time.perf_counter() - t0

    diffs = []
    for _ in range(reps):
        a = run(short)
        b = run(long)
        diffs.append((b - a) / (long - short) * 1e3)
    steady_ms = float(np.median(diffs))

    return {
        "quantum_frames": q,
        "latency_frames": sp.latency_frames,
        "first_emission_ms": round(first_ms, 1),
        "per_emission_p50_ms": round(p50, 1),
        "per_emission_p95_ms": round(p95, 1),
        "steady_ms_per_emission": round(steady_ms, 2),
        "steady_ms_per_frame": round(steady_ms / q, 3),
    }


CONFIGS = {
    "phi_b1": ("phi", 1),
    "phi_b8": ("phi", 8),
    "image_u8_int8_b1": ("image", 1),
    "image_u8_int8_b8": ("image", 8),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    ap.add_argument("--json", default=None)
    ap.add_argument("--n_emissions", type=int, default=40)
    args = ap.parse_args()

    from human_dynamics_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    print(f"backend: {jax.default_backend()}")
    results = {}
    for name in args.configs:
        mode, b = CONFIGS[name]
        pred, make_frames = build_predictor(mode, b)
        r = measure(pred, make_frames, n_emissions=args.n_emissions)
        results[name] = r
        print(name, json.dumps(r))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
