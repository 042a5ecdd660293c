"""Multi-host process runner: one Python process per host, disjoint
input shards, XLA collectives over ICI/DCN.

The reference is strictly single-process (SURVEY.md §2.3); this is new
TPU-native capability. The data plane was already multi-host ready
(ExampleStream slices shards per host, data/loader.py); this module adds
the process-level piece: initializing ``jax.distributed`` from either
explicit arguments, environment variables, or the TPU metadata that the
JAX runtime auto-detects, and reporting (host_id, num_hosts) for the
input pipeline.

Usage (one command per host)::

    HD_TPU_COORDINATOR=host0:9876 HD_TPU_NUM_PROCESSES=4 \
    HD_TPU_PROCESS_ID=$i python -m human_dynamics_tpu.train.main ...

On Cloud TPU pods, ``jax.distributed.initialize()`` discovers all three
values from the metadata server, so no env vars are needed.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

ENV_COORDINATOR = "HD_TPU_COORDINATOR"
ENV_NUM_PROCESSES = "HD_TPU_NUM_PROCESSES"
ENV_PROCESS_ID = "HD_TPU_PROCESS_ID"


def process_env(
    environ: Optional[dict] = None,
) -> Optional[Tuple[str, int, int]]:
    """Parse (coordinator_address, num_processes, process_id) from the
    environment, or None when not configured for multi-process."""
    env = os.environ if environ is None else environ
    coordinator = env.get(ENV_COORDINATOR)
    num_processes = int(env.get(ENV_NUM_PROCESSES, "1"))
    if num_processes <= 1:
        return None
    if not coordinator:
        raise ValueError(
            f"{ENV_NUM_PROCESSES}={num_processes} requires "
            f"{ENV_COORDINATOR}=host:port"
        )
    process_id = int(env.get(ENV_PROCESS_ID, "-1"))
    if not 0 <= process_id < num_processes:
        raise ValueError(
            f"{ENV_PROCESS_ID} must be in [0, {num_processes})"
        )
    return coordinator, num_processes, process_id


def initialize(environ: Optional[dict] = None) -> Tuple[int, int]:
    """Initialize multi-process JAX if configured; returns
    (host_id, num_hosts) for the input pipeline.

    Safe to call unconditionally: a single-process run (no env config,
    no TPU-pod metadata) returns (0, 1) without touching
    jax.distributed.
    """
    import jax

    spec = process_env(environ)
    if spec is not None:
        coordinator, num_processes, process_id = spec
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()
