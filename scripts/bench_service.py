"""Concurrent live-stream serving benchmark: N streams, one chip.

docs/serving.md reads the single-stream steady cost as "~12 concurrent
30 fps image streams per chip"; this measures it directly: N
StreamingSessions multiplexed onto ONE PredictionService (one
dispatcher thread owning all jit calls), every session fed
round-robin, aggregate throughput timed to a real value fetch.

Method (CLAUDE.md "Timing"): emissions stay device-resident
(as_numpy=False); the wall clock covers feed->resolution of every
future plus ONE scalar fetch per session at the end, at two different
round counts, differenced — so neither async-dispatch returns nor the
tunnel's fetch RTT pollute the number.

Usage:
    python scripts/bench_service.py [--mode image] [--streams 1 4 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_config(mode: str, n_streams: int, rounds_short: int,
               rounds_long: int, batch_size: int = 1, reps: int = 5):
    """One (mode, n_streams) config.

    rounds_long/short are per-stream feed rounds; callers size them so
    the DIFF workload ((long-short)*n_streams emissions) is several
    seconds of device compute — the tunnel's fetch/dispatch jitter is
    O(100 ms..s), so a sub-second diff (the first draft used 20
    emissions ~ 0.5 s) is pure noise.
    """
    import jax.numpy as jnp

    from scripts.bench_streaming import build_predictor
    from human_dynamics_tpu.infer.service import PredictionService

    pred, make_frames = build_predictor(mode, batch_size)
    results = {}
    with PredictionService(pred) as service:
        sessions = [service.open_stream() for _ in range(n_streams)]
        q = sessions[0].quantum

        # Warm: one emission per session (compile + steady state).
        warm = [s.feed(make_frames(s.latency_frames)) for s in sessions]
        for f in warm:
            ems = f.result(timeout=3600)
            assert len(ems) == 1
        _ = float(jnp.sum(warm[-1].result()[0]["omegas"]))

        # Pre-generate a cycled pool of distinct frame buffers so host
        # RNG never runs inside the timed loop (1-core host; the
        # dispatcher thread needs the GIL). Distinct buffers + the
        # evolving per-stream device state defeat the runtime's
        # repeated-dispatch result cache (CLAUDE.md "Timing").
        pool = [make_frames(q) for _ in range(4 * n_streams)]

        def run(rounds):
            t0 = time.perf_counter()
            futs = []
            k = 0
            for _ in range(rounds):
                futs = []
                for s in sessions:
                    futs.append(s.feed(pool[k % len(pool)]))
                    k += 1
            # Resolution of the last round implies all prior rounds
            # resolved (per-session FIFO through one dispatcher).
            last = [f.result(timeout=3600)[0] for f in futs]
            for out in last:
                _ = float(jnp.sum(out["omegas"]))
            return time.perf_counter() - t0

        # Interleaved short/long pairs; median of per-pair diffs
        # cancels the fetch RTT and rides out its ~+-100 ms jitter
        # (a single pair can even go negative at small workloads).
        diffs = []
        for i in range(reps):
            a = run(rounds_short)
            b = run(rounds_long)
            print(f"  rep {i}: short={a:.3f}s long={b:.3f}s "
                  f"diff={b - a:.3f}s", flush=True)
            diffs.append(b - a)
        dt = float(np.median(diffs))
        frames = (rounds_long - rounds_short) * n_streams * q
        fps = frames / dt
        results = {
            "streams": n_streams,
            "quantum": q,
            "agg_frames_per_s": round(fps, 1),
            "per_stream_fps": round(fps / n_streams, 1),
            "keeps_up_30fps_streams": round(fps / 30.0, 1),
            "diff_spread_s": [round(min(diffs), 4), round(max(diffs), 4)],
        }
        stats = service.stats()
        assert stats["failed"] == 0
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("phi", "image"), default="image")
    ap.add_argument("--streams", nargs="*", type=int, default=[1, 4, 12])
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument(
        "--emissions", type=int, default=None,
        help="aggregate emissions in the LONG block across all streams "
        "(default: 540 image / 4000 phi => the timed diff is ~5-20 s of "
        "device compute, dwarfing the tunnel's ~+-1 s fetch jitter)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from human_dynamics_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"backend: {jax.default_backend()}")
    emissions = args.emissions or (4000 if args.mode == "phi" else 540)
    out = []
    for n in args.streams:
        rounds = max(6, emissions // n)
        r = run_config(
            args.mode, n, rounds_short=rounds // 3,
            rounds_long=rounds, batch_size=args.batch_size,
            reps=args.reps,
        )
        out.append(r)
        print(args.mode, json.dumps(r))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
