"""Train-step throughput benchmark — committed evidence for the perf
ledger (CLAUDE.md) and BENCH notes.

Measures the full simultaneous E/D update (train.trainer.train_step:
fwd + bwd + two Adams) on synthetic device-resident batches, so it
times exactly the compiled step and not the input pipeline (the loader
is benchmarked separately; it overlaps via the prefetch thread in real
runs).

Timing discipline for the tunnel-attached chip (CLAUDE.md): chained
donated-state dispatches with distinct precomputed rngs, each timed
block ended by a REAL scalar fetch (block_until_ready is unreliable
for donated-aliased outputs on this runtime), two block lengths
differenced to cancel the fetch round trip, median over `--reps`.
Use --steps large enough that the compute difference dwarfs the
~±100 ms fetch jitter (>=100 for phi, >=40 for image modes).

Modes (reference counterparts: do_train.sh / config.py defaults):
  phi            precomputed_phi=True   (the canonical training mode)
  image-frozen   images + freeze_phi    (resnet fwd only, no E grads)
  image          images, resnet trained end to end

Example:
  python scripts/bench_train.py --mode phi --bf16 --fused_smpl
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.core.rotations import rodrigues
from human_dynamics_tpu.train.trainer import (
    Batch,
    TrainState,
    create_train_state,
    fake_pool_size,
    make_optimizers,
    split_frozen_params,
    train_step,
)
from human_dynamics_tpu.utils.cache import enable_compilation_cache
from human_dynamics_tpu.utils.config import Config


def synthetic_batch(config: Config, rng: np.random.RandomState) -> Batch:
    b, t = config.batch_size, config.T
    if config.precomputed_phi:
        net_in = rng.randn(b, t, config.feature_dim).astype(np.float32)
    else:
        net_in = rng.uniform(
            -1, 1, (b, t, config.img_size, config.img_size, 3)
        ).astype(np.float32)
    kps = rng.randn(b, t, config.num_kps, 3).astype(np.float32)
    kps[..., 2] = 1.0
    pool = fake_pool_size(config)
    poses_real = np.asarray(
        rodrigues(jnp.asarray(
            (rng.randn(pool, 24, 3) * 0.2).astype(np.float32)
        ))
    )
    return Batch(
        phis=jnp.asarray(net_in),
        kps=jnp.asarray(kps),
        poses_gt=jnp.asarray(
            (rng.randn(b, t, 24, 3) * 0.2).astype(np.float32)
        ),
        shapes_gt=jnp.asarray(
            (rng.randn(b, 10) * 0.3).astype(np.float32)
        ),
        joints_gt=jnp.asarray(rng.randn(b, t, 14, 3).astype(np.float32)),
        has_3d_joints=jnp.ones((b,)),
        has_3d_smpl=jnp.ones((b,)),
        poses_real=jnp.asarray(poses_real),
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="phi",
                   choices=("phi", "image-frozen", "image"))
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--T", type=int, default=20)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision network fwd/bwd")
    p.add_argument("--fused_smpl", action="store_true",
                   help="Pallas fused SMPL decode")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize resnet units in the backward")
    p.add_argument("--freeze_bn_stats", action="store_true",
                   help="fine-tune with inference-mode BatchNorm "
                        "(standard pretrained-trunk recipe)")
    p.add_argument("--freeze_stages", type=int, default=0,
                   help="freeze the first N resnet stages (1=root, "
                        "2=+block1, ...) — prunes their backward")
    p.add_argument("--num_verts", type=int, default=6890)
    p.add_argument("--steps", type=int, default=20,
                   help="chained steps per timed rep")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    enable_compilation_cache()

    config = Config(
        batch_size=args.batch_size,
        T=args.T,
        img_size=args.img_size,
        num_kps=25,
        precomputed_phi=args.mode == "phi",
        freeze_phi=args.mode == "image-frozen",
        feature_dim=2048,
        use_bfloat16=args.bf16,
        use_fused_smpl=args.fused_smpl,
        remat_resnet=args.remat,
        freeze_bn_stats=args.freeze_bn_stats,
        freeze_resnet_stages=args.freeze_stages,
    )
    smpl = synthetic_smpl_model(num_verts=args.num_verts, num_kps=25)
    rng = np.random.RandomState(0)

    state, hmmr, disc = create_train_state(config, jax.random.PRNGKey(0))
    tx_e, tx_d = make_optimizers(config)
    batch = synthetic_batch(config, rng)
    step_rng = jax.random.PRNGKey(1)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch: Batch, rng: jax.Array):
        new_state, metrics = train_step(
            config, hmmr, disc, smpl, tx_e, tx_d, state, batch, rng
        )
        return new_state, metrics["e_loss"]

    # State is donated (in-place param/moment updates — what Trainer
    # does); the loop always rebinds it, so no stale reference exists.
    state, _ = step(state, batch, step_rng)           # compile + warm
    jax.block_until_ready(state.params_e)

    # One large leaf to block on (per-buffer blocking costs ~2 ms each).
    def big_leaf(s: TrainState):
        leaves = jax.tree_util.tree_leaves(s.params_e)
        return max(leaves, key=lambda x: x.size)

    # Timing discipline (all three rules are load-bearing on this
    # runtime — see CLAUDE.md "Timing on this tunnel"):
    # 1. Distinct rng per dispatch, precomputed: identical repeated
    #    dispatches can be result-cached.
    # 2. A REAL value fetch (scalar sum of the largest leaf) ends each
    #    timed block: block_until_ready returns without waiting for
    #    outputs that alias DONATED inputs, reporting impossible times.
    # 3. Two block lengths, differenced: cancels the fetch round trip
    #    and dispatch pipeline fill.
    n_rngs = args.reps * (args.steps + args.steps // 10 + 2)
    rngs_arr = jax.vmap(
        lambda i: jax.random.fold_in(step_rng, i)
    )(jnp.arange(n_rngs))
    rngs = [rngs_arr[i] for i in range(n_rngs)]
    jax.block_until_ready(rngs_arr)
    call = 0

    def run_block(nsteps):
        nonlocal state, call
        t0 = time.perf_counter()
        loss = None
        for _ in range(nsteps):
            state, loss = step(state, batch, rngs[call])
            call += 1
        checksum = float(jnp.sum(big_leaf(state)))
        assert np.isfinite(checksum), "non-finite params in benchmark"
        return time.perf_counter() - t0, loss

    # The scalar-fetch round trip has ~±100 ms jitter on this tunnel:
    # the long block must carry MUCH more compute than that, and the
    # median (not min) of the diffs is reported — a min of differences
    # can go negative under jitter.
    short = max(1, args.steps // 10)
    diffs = []
    loss = None
    for _ in range(args.reps):
        t_short, _ = run_block(short)
        t_long, loss = run_block(args.steps)
        diffs.append((t_long - t_short) / (args.steps - short))
    best = float(np.median(diffs))

    assert bool(jnp.isfinite(loss)), "non-finite loss in benchmark"
    frames = config.batch_size * config.T
    print(json.dumps({
        "mode": args.mode,
        "bf16": args.bf16,
        "fused_smpl": args.fused_smpl,
        "remat": args.remat,
        "freeze_stages": args.freeze_stages,
        "batch_size": config.batch_size,
        "T": config.T,
        "ms_per_step": round(best * 1e3, 2),
        "frames_per_s_trained": round(frames / best, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
