"""Training entry point.

Behavioral port target: /root/reference/src/main.py + do_train.sh. Wires
Config -> model_dir preparation (+ params.json) -> data pipeline ->
Trainer with auto-resume -> train loop with logging/checkpoints.

Usage (mirrors do_train.sh:11):
    python -m human_dynamics_tpu.train.main \
        --data_dir /path/to/tf_datasets \
        --smpl_model_path models/smpl_model.npz \
        --do_hallucinate --log_dir logs
"""

from __future__ import annotations

import argparse
import dataclasses


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI flags generated from the Config dataclass (one source of
    truth, unlike the reference's absl-flag soup)."""
    from human_dynamics_tpu.utils.config import Config

    parser = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        default = f.default
        if f.type == "bool" or isinstance(default, bool):
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default, nargs="?", const=True,
            )
        elif isinstance(default, tuple):
            parser.add_argument(name, nargs="*", default=default)
        elif default is None:
            parser.add_argument(name, default=None)
        else:
            parser.add_argument(name, type=type(default), default=default)
    parser.add_argument("--num_steps", type=int, default=None,
                        help="override max_iteration")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of steps "
                             "10-15")
    return parser


def config_from_args(args) -> "Config":
    from human_dynamics_tpu.utils.config import Config

    kwargs = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name)
        if isinstance(f.default, tuple) and isinstance(v, list):
            v = tuple(
                int(x) if str(x).lstrip("-").isdigit() else x for x in v
            )
        kwargs[f.name] = v
    return Config(**kwargs)


def main(argv=None):
    from human_dynamics_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_arg_parser().parse_args(argv)
    config = config_from_args(args)

    from human_dynamics_tpu.core.smpl import load_smpl_model
    from human_dynamics_tpu.data.loader import TrainDataPipeline
    from human_dynamics_tpu.train.trainer import Batch, Trainer
    from human_dynamics_tpu.utils.logging import MetricLogger

    config.prepare_dirs()
    config.save()
    print(f"[*] MODEL dir: {config.model_dir}")

    smpl = load_smpl_model(config.smpl_model_path, joint_type="cocoplus")

    # Multi-host: each process reads a disjoint shard subset
    # (parallel/multihost.py); single-process runs get (0, 1).
    from human_dynamics_tpu.parallel.multihost import initialize

    host_id, num_hosts = initialize()
    pipeline = TrainDataPipeline(
        config, host_id=host_id, num_hosts=num_hosts
    )

    import jax.numpy as jnp

    def device_batches():
        for batch in pipeline:
            yield Batch(*[jnp.asarray(x) for x in batch])

    logger = MetricLogger(config.model_dir)
    trainer = Trainer(
        config, smpl, data_iter=device_batches(), logger=logger
    )
    # Warm-start gate per use_pretrained (trainer_sequence_fc.py:426-445):
    # fresh run + pretrained path given; in precomputed-phi mode only when
    # use_hmr_ief_init (the warm start then carries the HMR IEF weights).
    warm_start_ok = (
        not config.precomputed_phi or config.use_hmr_ief_init
    )
    if (
        config.pretrained_model_path
        and int(trainer.state.step) == 0
        and warm_start_ok
    ):
        trainer.load_pretrained(config.pretrained_model_path)

    num_steps = args.num_steps or config.max_iteration
    profile = range(10, 15) if args.profile else None
    try:
        trainer.train(num_steps, profile_steps=profile)
    finally:
        trainer.save()
        logger.close()
        pipeline.close()


if __name__ == "__main__":
    main()
