"""Temporal sequence parallelism via halo exchange.

The reference bounds long clips with a host-side sliding window + overlap
margin (tester.py:260-312) because its temporal encoder has a finite
receptive field (fov = 13 frames). The TPU-native equivalent (SURVEY.md
§2.3/§5): shard time across the mesh and exchange 1-frame halos with
``jax.lax.ppermute`` over ICI around every temporal conv, so an
arbitrarily long clip runs as ONE jitted program with no overlap
recompute. GroupNorm statistics are made global with a psum over the
time axis — the sharded encoder is numerically *identical* to running
the unsharded encoder on the whole clip (the windowed approach is only
approximate at window borders).

This file reimplements TemporalEncoderFC2GN's forward functionally over
a shard (same flax params), plus a shard_map driver.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_pad(x_local: jax.Array, axis_name: str) -> jax.Array:
    """Append 1-frame halos from both neighbors: (Tl, C) -> (Tl+2, C).

    Boundary devices receive zeros, matching the unsharded 'SAME' conv
    zero padding at clip edges.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    # Send my last frame to the right neighbor => I receive my left
    # neighbor's last frame.
    from_left = jax.lax.ppermute(
        x_local[-1:], axis_name,
        perm=[(i, (i + 1) % n) for i in range(n)],
    )
    from_right = jax.lax.ppermute(
        x_local[:1], axis_name,
        perm=[(i, (i - 1) % n) for i in range(n)],
    )
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x_local, from_right], axis=0)


def _conv3_halo(
    x_local: jax.Array, kernel: jax.Array, bias: jax.Array, axis_name: str
) -> jax.Array:
    """Width-3 'SAME' temporal conv across the shard boundary.

    x_local (Tl, C); kernel (3, C, C) (flax nn.Conv layout); bias (C,).
    """
    xp = _halo_pad(x_local, axis_name)
    return (
        xp[:-2] @ kernel[0] + xp[1:-1] @ kernel[1] + xp[2:] @ kernel[2]
        + bias
    )


def _group_norm_global(
    x_local: jax.Array,
    mask_local: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    axis_name: str,
    eps: float = 1e-6,
) -> jax.Array:
    """GroupNorm with statistics over the FULL (valid) time extent.

    Matches nn.GroupNorm on the unsharded (1, T, C) input: stats are per
    (group) over (T_global, channels_in_group). ``mask_local`` (Tl, 1)
    marks real frames — padding frames are excluded from the statistics
    AND zeroed on output, so they behave exactly like the zero 'SAME'
    padding the unsharded conv would see at the clip edge.
    """
    tl, c = x_local.shape
    cg = c // num_groups
    xg = (x_local * mask_local).reshape(tl, num_groups, cg)

    local_sum = jnp.sum(xg, axis=(0, 2))            # (G,)
    local_sumsq = jnp.sum(xg * xg, axis=(0, 2))
    local_count = jnp.sum(mask_local) * cg

    total_sum = jax.lax.psum(local_sum, axis_name)
    total_sumsq = jax.lax.psum(local_sumsq, axis_name)
    total_count = jax.lax.psum(local_count, axis_name)

    mean = total_sum / total_count                   # (G,)
    var = total_sumsq / total_count - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    normed = (
        x_local.reshape(tl, num_groups, cg) - mean[None, :, None]
    ) * inv[None, :, None]
    out = normed.reshape(tl, c) * scale + bias
    return out * mask_local


def temporal_encoder_sharded(
    params: dict,
    phi_local: jax.Array,
    num_layers: int,
    axis_name: str,
    num_groups: int = 32,
    mask_local: Optional[jax.Array] = None,
) -> jax.Array:
    """TemporalEncoderFC2GN forward on a time shard (Tl, C).

    params: the flax param subtree
    variables['params']['temporal_encoder'].
    """
    if mask_local is None:
        mask_local = jnp.ones((phi_local.shape[0], 1), phi_local.dtype)
    net = phi_local * mask_local
    for i in range(num_layers):
        blk = params[f"block_{i}"]
        h = _group_norm_global(
            net, mask_local, blk["gn1"]["scale"], blk["gn1"]["bias"],
            num_groups, axis_name,
        )
        h = jax.nn.relu(h)
        h = _conv3_halo(
            h, blk["conv1"]["kernel"], blk["conv1"]["bias"], axis_name
        ) * mask_local
        h = _group_norm_global(
            h, mask_local, blk["gn2"]["scale"], blk["gn2"]["bias"],
            num_groups, axis_name,
        )
        h = jax.nn.relu(h)
        h = _conv3_halo(
            h, blk["conv2"]["kernel"], blk["conv2"]["bias"], axis_name
        ) * mask_local
        net = net + h
    return net


def predict_clip_sharded(
    model,
    variables,
    smpl,
    phi: jax.Array,
    mesh: Mesh,
    axis_name: str = "time",
    want_verts: bool = True,
):
    """Whole-clip HMMR inference, time-sharded over the mesh.

    The complete pipeline — halo-exchange temporal encoder, present +
    ±dt IEF heads, SMPL decode — runs as ONE program with the clip's
    frames sharded across devices. Unlike the windowed predictor (which
    mirrors the reference's approximate overlap-stitching,
    tester.py:260-312), this is numerically the *full-clip* forward: the
    GroupNorm statistics span the entire clip via psum and conv halos
    cross shard boundaries exactly.

    Args:
        model: HmmrModel (precomputed-phi mode).
        variables: its flax variables.
        smpl: SmplModel for the decode.
        phi: (N, C) per-frame features for the whole clip.
        mesh: 1-D device mesh.

    Returns:
        dict with omegas (N, 85), joints (N, K, 3), kps (N, K, 2),
        poses (N, 24, 3, 3), verts (N, V, 3) [if want_verts], and
        omegas_delta {dt: (N, 85)}.
    """
    from human_dynamics_tpu.models.omega import compute_smpl, split_omega

    n, c = phi.shape
    n_dev = mesh.devices.size
    n_pad = int(np.ceil(n / n_dev)) * n_dev
    phi_p = jnp.pad(phi, ((0, n_pad - n), (0, 0)))
    mask = (jnp.arange(n_pad) < n).astype(phi.dtype)[:, None]

    enc_params = variables["params"]["temporal_encoder"]
    num_layers = model.num_conv_layers

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name),
    )
    def run(variables, enc_params, phi_shard, mask_shard):
        strip = temporal_encoder_sharded(
            enc_params, phi_shard, num_layers, axis_name,
            mask_local=mask_shard,
        )
        # Per-frame IEF heads on the local shard (weights replicated).
        present, deltas = model.apply(
            variables, strip[None], False, model.predict_delta,
            method=lambda m, f, train, wd: m._pred_heads(f, train, wd),
        )
        present = present[0]                       # (Tl, 85)
        deltas = {dt: v[0] for dt, v in deltas.items()}

        heads = [present] + [deltas[dt] for dt in sorted(deltas)]
        stacked = jnp.stack(heads)                 # (H, Tl, 85)
        cams = split_omega(present)[0]
        cams_all = jnp.broadcast_to(
            cams[None], stacked.shape[:-1] + (3,)
        )
        sm = compute_smpl(
            smpl, stacked, use_optcam=False, cams_override=cams_all,
            want_verts=want_verts,
        )
        out = {
            "omegas": present,
            "joints": sm.joints[0],
            "kps": sm.kps[0],
            "poses": sm.poses_rot[0],
        }
        if want_verts:
            out["verts"] = sm.verts[0]
        for i, dt in enumerate(sorted(deltas)):
            out[f"omegas_delta_{dt}"] = stacked[i + 1]
            out[f"joints_delta_{dt}"] = sm.joints[i + 1]
        return out

    out = run(variables, enc_params, phi_p, mask)
    return {k: v[:n] for k, v in out.items()}


def predict_clips_sharded_2d(
    model,
    variables,
    smpl,
    phis: jax.Array,
    mesh: Mesh,
    data_axis: str = "data",
    time_axis: str = "time",
    want_verts: bool = True,
):
    """Whole-clip inference for a BATCH of clips on a 2-D mesh.

    Composes the two parallelism modes (SURVEY.md §2.3): clips shard
    over ``data_axis`` (independent streams), each clip's frames over
    ``time_axis`` (halo-exchange temporal encoder + psum-global GN, as
    in predict_clip_sharded). One jitted program for the whole batch.

    Args:
        phis: (B, N, C) per-frame features, B clips of N frames.
        mesh: 2-D mesh with axes (data_axis, time_axis).

    Returns:
        dict of (B, N, ...) arrays (same keys as predict_clip_sharded).
    """
    from human_dynamics_tpu.models.omega import compute_smpl, split_omega

    b, n, c = phis.shape
    d_dev = mesh.shape[data_axis]
    t_dev = mesh.shape[time_axis]
    b_pad = int(np.ceil(b / d_dev)) * d_dev
    n_pad = int(np.ceil(n / t_dev)) * t_dev
    phi_p = jnp.pad(phis, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    mask = jnp.broadcast_to(
        (jnp.arange(n_pad) < n).astype(phis.dtype)[None, :, None],
        (b_pad, n_pad, 1),
    )

    enc_params = variables["params"]["temporal_encoder"]
    num_layers = model.num_conv_layers

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(),
            P(data_axis, time_axis, None),
            P(data_axis, time_axis, None),
        ),
        out_specs=P(data_axis, time_axis),
    )
    def run(variables, enc_params, phi_shard, mask_shard):
        # phi_shard (Bl, Tl, C): vmap the per-clip halo encoder over the
        # local clip axis — the ppermute/psum batch across clips.
        strip = jax.vmap(
            lambda p, m: temporal_encoder_sharded(
                enc_params, p, num_layers, time_axis, mask_local=m
            )
        )(phi_shard, mask_shard)

        present, deltas = model.apply(
            variables, strip, False, model.predict_delta,
            method=lambda m, f, train, wd: m._pred_heads(f, train, wd),
        )                                           # (Bl, Tl, 85)

        heads = [present] + [deltas[dt] for dt in sorted(deltas)]
        stacked = jnp.stack(heads)                  # (H, Bl, Tl, 85)
        cams = split_omega(present)[0]
        cams_all = jnp.broadcast_to(
            cams[None], stacked.shape[:-1] + (3,)
        )
        sm = compute_smpl(
            smpl, stacked, use_optcam=False, cams_override=cams_all,
            want_verts=want_verts,
        )
        out = {
            "omegas": present,
            "joints": sm.joints[0],
            "kps": sm.kps[0],
            "poses": sm.poses_rot[0],
        }
        if want_verts:
            out["verts"] = sm.verts[0]
        for i, dt in enumerate(sorted(deltas)):
            out[f"omegas_delta_{dt}"] = stacked[i + 1]
            out[f"joints_delta_{dt}"] = sm.joints[i + 1]
        return out

    out = run(variables, enc_params, phi_p, mask)
    return {k: v[:b, :n] for k, v in out.items()}


def movie_strip_sharded(
    variables,
    phi: jax.Array,
    mesh: Mesh,
    num_layers: int = 3,
    axis_name: str = "time",
) -> jax.Array:
    """Run the temporal encoder over a whole clip, time-sharded.

    phi: (N, C) per-frame features for the full clip (will be padded to
    a multiple of the mesh size; padding frames produce garbage outputs
    that are trimmed before returning).

    Returns the (N, C) movie strip, identical (up to fp) to applying the
    unsharded encoder to the whole clip at once.
    """
    n, c = phi.shape
    n_dev = mesh.devices.size
    n_pad = int(np.ceil(n / n_dev)) * n_dev
    phi_p = jnp.pad(phi, ((0, n_pad - n), (0, 0)))
    mask = (jnp.arange(n_pad) < n).astype(phi.dtype)[:, None]

    # Accept a full HmmrModel tree or a bare TemporalEncoderFC2GN tree.
    params = variables["params"]
    params = params.get("temporal_encoder", params)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    def run(params, phi_shard, mask_shard):
        return temporal_encoder_sharded(
            params, phi_shard, num_layers, axis_name,
            mask_local=mask_shard,
        )

    out = run(params, phi_p, mask)
    return out[:n]
