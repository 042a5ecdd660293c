"""Device mesh + sharding helpers (SURVEY.md §2.3).

The reference has no distributed execution at all (single GPU,
trainer_sequence_fc.py); device parallelism here is new TPU-native
design:

- data parallelism: batch axis sharded over a 1-D ``data`` mesh axis;
  parameters replicated; XLA/GSPMD inserts the gradient psum.
- temporal halo sharding for long-clip inference lives in
  parallel/halo.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over the first num_devices devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array leaf along its leading (batch) axis."""
    def put(x):
        spec = P(axis_name) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
