"""Device mesh + sharding helpers (SURVEY.md §2.3).

The reference has no distributed execution at all (single GPU,
trainer_sequence_fc.py); device parallelism here is new TPU-native
design:

- data parallelism: batch axis sharded over a 1-D ``data`` mesh axis;
  parameters replicated; XLA/GSPMD inserts the gradient psum.
- 2-D (data x time) training: batch over ``data`` AND the T axis of the
  per-frame tensors over ``time``. GSPMD partitions the temporal convs
  spatially (halo exchange over ICI), makes GroupNorm/loss reductions
  global, and all-reduces grads over both axes — the step function is
  unchanged; only the input shardings differ (the scaling-book recipe:
  annotate shardings, let XLA insert collectives).
- temporal halo sharding for long-clip inference lives in
  parallel/halo.py (manual ppermute halos, for the inference path where
  we also shard a *single* clip's frames).
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


def make_mesh_2d(
    data_size: int,
    time_size: int,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data", "time"),
) -> Mesh:
    """(data_size x time_size) mesh. Lay ``time`` innermost so the
    per-step halo exchanges of the temporal convs ride neighboring
    devices (ICI) while gradient all-reduce spans the outer axis."""
    if devices is None:
        devices = jax.devices()
    n = data_size * time_size
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for a {data_size}x{time_size} mesh, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:n]).reshape(data_size, time_size)
    return Mesh(grid, tuple(axis_names))


def make_mesh_tp(
    data_size: int,
    model_size: int,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """(data x model) mesh for tensor-parallel parameter sharding.

    ``model`` is innermost so the per-layer TP collectives (activation
    all-reduces GSPMD inserts around the partitioned matmuls) ride
    neighboring devices on ICI while the gradient all-reduce spans the
    outer ``data`` axis.
    """
    return make_mesh_2d(
        data_size, model_size, devices=devices, axis_names=axis_names
    )


def shard_params_tp(
    tree,
    mesh: Mesh,
    model_axis: str = "model",
    min_dim: int = 128,
):
    """Tensor-parallel param-sharding hook (SURVEY.md §2.3 TP row).

    Policy: every weight with >=2 dims whose LAST (output-feature) dim
    is divisible by the model-axis size and at least ``min_dim`` wide is
    sharded over ``model`` on that dim — Dense kernels column-parallel,
    conv kernels over output channels. Everything else (biases, norm
    scales, small kernels, optimizer scalars) is replicated; GSPMD
    propagates the shardings through the step function and inserts the
    activation collectives (the scaling-book recipe — annotate, compile,
    let XLA place the all-reduces).

    This is a capability HOOK: at HMMR's parameter scale (~127 MB fp32
    encoder + <20 MB heads) replicated DP is the right deployment, and
    TP is not a perf claim; the hook exists so the same step function
    scales to configurations where single-replica params do not fit.
    Works on any pytree whose array leaves mirror param shapes (e.g.
    a whole TrainState: Adam moments shard like their params).
    """
    m = mesh.shape[model_axis]

    def put(x):
        nd = getattr(x, "ndim", 0)
        if nd >= 2 and x.shape[-1] >= min_dim and x.shape[-1] % m == 0:
            spec = P(*([None] * (nd - 1)), model_axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def shard_batch_2d(
    batch,
    mesh: Mesh,
    data_axis: str = "data",
    time_axis: str = "time",
):
    """Shard a train Batch over (data x time).

    Per-frame tensors (phis/kps/poses_gt/joints_gt: (B, T, ...)) shard
    batch over ``data`` and time over ``time``; per-tube tensors
    ((B, ...)) shard over ``data`` only; the mocap real pool is
    replicated (its pool axis is tied to the fake-pool contract, not B).
    T must divide the time-axis size.
    """
    time_sharded = {"phis", "kps", "poses_gt", "joints_gt"}
    data_sharded = {"shapes_gt", "has_3d_joints", "has_3d_smpl"}

    t_dev = mesh.shape[time_axis]
    out = {}
    for name, x in batch._asdict().items():
        if name in time_sharded:
            if x.shape[1] % t_dev != 0:
                raise ValueError(
                    f"{name}: T={x.shape[1]} not divisible by "
                    f"time mesh axis {t_dev}"
                )
            spec = P(data_axis, time_axis)
        elif name in data_sharded:
            spec = P(data_axis)
        else:
            spec = P()
        out[name] = jax.device_put(x, NamedSharding(mesh, spec))
    return type(batch)(**out)
