"""Pallas fused int8 bottleneck-v2 units: measured NEGATIVE result.

Hypothesis: with static activation scales the XLA int8 trunk
(models/resnet_int8.apply_int8_static, 9.99 ms/batch160 vs bf16's
10.63 ms) still materializes the residual stream in HBM at every conv
boundary; fusing a whole bottleneck unit — or a whole block's chain of
stride-1 units — into one kernel keeps intermediates in VMEM and should
approach the conv-level int8 rate (366-405 TOP/s, ~2x bf16, measured by
scripts/probe_mxu.py).

MEASURED on one v5e (batch 160, 224x224; chained-scan timing per
CLAUDE.md), all three kernel generations:
- per-unit, 3x3 conv as 9 masked shifted dots:        12.54 ms trunk
- per-unit, taps concatenated into one K=9*Cb matmul: 13.31 ms
  (the (HW, 9Cb) VMEM cat copies cost ~5 us/img — worse)
- whole-block chains (residual stream crosses HBM once per BLOCK,
  group-batched grid steps, 100 MB vmem limit):       13.35 ms
- per-block attribution vs the 9.99 ms XLA-static baseline:
  pallas on block4 only +0.27 ms, block3 only +0.79, block2 only +2.14.
Kernel-internal ablation (28x28x512 unit, us/image): DMA floor 4.9,
+preact/requant elementwise +0.9, +1x1 matmuls ~0 (hide under DMA),
+3x3 machinery +2.1. A bare Pallas int8 matmul hits 215 TOP/s at
1024^3, so the MXU int8 path itself is fine.

CONCLUSION: XLA's integer convs + fused static-scale epilogues already
pipeline DMA/MXU/VPU at tile granularity across the op; a Mosaic kernel
executes its phases serially per grid step, and the saved HBM traffic
does not pay for the lost overlap at these activation sizes. The
static-scale XLA path (apply_int8_static) is the fastest int8 encoder
on this hardware; this module stays as the tested experimental
substrate (`use_pallas=True`) and the record of why.

Design notes (kept accurate for future work): planar 2-D layout
throughout (Mosaic rejects >1 batch-dim matmuls / most in-kernel
reshapes); 3x3 conv as 9 shifted dots on a row-planar matrix with
H-edge/W-wrap masks; preact+quant and dequant+requant folded to single
elementwise passes with host-precomputed per-channel multipliers;
(1, G*HW, C) blocks keep block starts aligned for 196/49-row
geometries; G images per grid step amortize launch overhead.

Reference hot path: encoder_resnet (/root/reference/src/models.py:50-77
via slim resnet_v2_50); quantization scheme: models/resnet_int8.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


PARAM_KEYS = ("pA", "pB", "w1", "q1m", "q1a", "w2", "q2m", "q2a",
              "w3", "d3m", "d3a")
SC_KEYS = PARAM_KEYS + ("wsc", "dscm", "dsca")


def _keys(has_shortcut):
    return SC_KEYS if has_shortcut else PARAM_KEYS


def _unit_body(state, refs, pad_ref, *, hw: int, w: int,
               has_shortcut: bool):
    """One bottleneck unit on an SSA (rows, Cin) bf16 value."""
    pq = jnp.clip(
        jnp.round(jnp.maximum(
            state.astype(jnp.float32) * refs["pA"][:] + refs["pB"][:],
            0.0,
        )),
        0.0, 127.0,
    ).astype(jnp.int8)

    if has_shortcut:
        ysc = jnp.dot(pq, refs["wsc"][:],
                      preferred_element_type=jnp.int32)
        shortcut = (ysc.astype(jnp.float32) * refs["dscm"][:]
                    + refs["dsca"][:])
    else:
        shortcut = state.astype(jnp.float32)

    h1 = jnp.dot(pq, refs["w1"][:], preferred_element_type=jnp.int32)
    h1q = jnp.clip(
        jnp.round(h1.astype(jnp.float32) * refs["q1m"][:]
                  + refs["q1a"][:]),
        0.0, 127.0,
    ).astype(jnp.int8)                                     # (rows, Cb)

    res = _conv3x3_planar(
        h1q, refs["w2"], refs["q2m"], refs["q2a"], refs["w3"],
        pad_ref, hw=hw, w=w, cb=h1q.shape[-1],
    )
    return (
        shortcut + res.astype(jnp.float32) * refs["d3m"][:]
        + refs["d3a"][:]
    ).astype(state.dtype)


def _conv3x3_planar(h1q, w2_ref, q2m_ref, q2a_ref, w3_ref, pad_ref,
                    *, hw: int, w: int, cb: int):
    """3x3 SAME conv + requant + 1x1 conv3 on planar (G*HW, Cb) int8.

    Nine shifted, masked (rows, Cb) x (Cb, Cb) dots accumulated in
    int32 — measured FASTER than concatenating the taps into one
    (rows, 9*Cb) matrix (the VMEM cat copies cost ~5 us/img; the small
    dots hide under the DMA of the surrounding stream).

    G images ride in one grid step as row-concatenated planes; a row
    mask ((row mod HW) // W + dy - 1 in [0, H)) zeroes every tap
    contribution that would cross an H edge — which simultaneously
    handles image boundaries, so no per-image padding is needed.
    """
    rows = h1q.shape[0]                  # G*HW
    pad0 = w + 2  # covers the max row shift |(dy-1)*w + (dx-1)| = w+1
    pad_ref[0:pad0, :cb] = jnp.zeros((pad0, cb), jnp.int8)
    pad_ref[pad0 + rows:, :cb] = jnp.zeros(
        (pad_ref.shape[0] - pad0 - rows, cb), jnp.int8
    )
    pad_ref[pad0:pad0 + rows, :cb] = h1q

    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, cb), 0)
    w_col = row_id % w
    h_row = (row_id % hw) // w
    h = hw // w
    acc = jnp.zeros((rows, cb), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            off = (dy - 1) * w + (dx - 1)
            shifted = pad_ref[pad0 + off:pad0 + off + rows, :cb]
            valid = (h_row + dy - 1 >= 0) & (h_row + dy - 1 < h)
            if dx != 1:
                valid &= (
                    (w_col + dx - 1 >= 0) & (w_col + dx - 1 < w)
                )
            if dy != 1 or dx != 1:
                shifted = jnp.where(valid, shifted, 0).astype(jnp.int8)
            tap = w2_ref[t * cb:(t + 1) * cb, :]
            acc = acc + jnp.dot(shifted, tap,
                                preferred_element_type=jnp.int32)
    h2q = jnp.clip(
        jnp.round(acc.astype(jnp.float32) * q2m_ref[:] + q2a_ref[:]),
        0.0, 127.0,
    ).astype(jnp.int8)
    return jnp.dot(h2q, w3_ref[:], preferred_element_type=jnp.int32)


def _chained_block_kernel(*args, unit_specs, hw: int, w: int):
    """All stride-1 units of one resnet block in ONE kernel: the
    residual stream crosses HBM once per BLOCK instead of once per
    unit (the per-unit kernel measured DMA-bound at its own floor)."""
    x_ref = args[0]
    out_ref = args[-2]
    pad_ref = args[-1]
    state = x_ref[0]
    pos = 1
    for has_shortcut in unit_specs:
        keys = _keys(has_shortcut)
        refs = dict(zip(keys, args[pos:pos + len(keys)]))
        pos += len(keys)
        state = _unit_body(state, refs, pad_ref, hw=hw, w=w,
                           has_shortcut=has_shortcut)
    out_ref[0] = state


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "unit_specs", "interpret", "group"),
)
def fused_block(
    x: jax.Array,
    unit_params,
    *,
    h: int,
    w: int,
    unit_specs,
    interpret: bool = False,
    group: int | None = None,
) -> jax.Array:
    """Run a chain of stride-1 bottleneck units as ONE Pallas kernel.

    Args:
        x: (N, H, W, Cin) bf16 residual-stream input.
        unit_params: tuple of per-unit dicts (``prepare_pallas_unit``):
            pA/pB (1, Cin) f32; w1 (Cin, Cb) int8; q1m/q1a (1, Cb);
            w2 (9*Cb, Cb) int8; q2m/q2a (1, Cb); w3 (Cb, Cout) int8;
            d3m/d3a (1, Cout); + wsc (Cin, Cout) int8, dscm/dsca
            (1, Cout) for projection-shortcut units.
        h/w: spatial dims (static; unchanged across the chain).
        unit_specs: tuple of has_shortcut bools, one per unit.

    Returns:
        (N, H, W, Cout) in x.dtype.
    """
    # Mosaic only compiles for TPU; interpret elsewhere (CPU tests).
    interpret = interpret or jax.default_backend() != "tpu"
    n = x.shape[0]
    c_in = x.shape[-1]
    cb = unit_params[0]["w1"].shape[-1]
    for p in unit_params:
        assert p["w1"].shape[-1] == cb, "chain shares one Cb"
    c_out = unit_params[-1]["w3"].shape[-1]
    hw = h * w

    wbytes = sum(
        int(np.prod(p[k].shape)) * (1 if p[k].dtype == jnp.int8 else 4)
        for p in unit_params for k in p
    )
    if group is None:
        # G images per grid step, bounded by a conservative VMEM model
        # (v5e VMEM is large enough that the 100 MB compiler limit, not
        # 16 MB, governs; stay well under it).
        for g in (8, 4, 2, 1):
            act = g * hw * (6 * c_in + 6 * c_out + 16 * cb)
            if n % g == 0 and act + wbytes < 40 * 2**20:
                group = g
                break
        else:
            group = 1
    rows = group * hw
    # (1, G*HW, C) blocks: the leading grid dim keeps every block start
    # aligned regardless of HW (196/49 rows are not sublane-tile
    # multiples).
    x2 = x.reshape(n // group, rows, c_in)
    pad_rows = rows + 2 * (w + 2)

    operands = [x2]
    for p, sc in zip(unit_params, unit_specs):
        operands += [p[k] for k in _keys(sc)]

    kernel = functools.partial(
        _chained_block_kernel,
        unit_specs=tuple(unit_specs), hw=hw, w=w,
    )

    rep = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, rows, c_in), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ] + [rep(a) for a in operands[1:]]

    flops = sum(
        2 * rows * cb * (
            p["w1"].shape[0] + 9 * cb + p["w3"].shape[-1]
            + (p["w3"].shape[-1] if sc else 0)
        )
        for p, sc in zip(unit_params, unit_specs)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // group, rows, c_out),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((pad_rows, cb), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=(n // group) * flops,
            bytes_accessed=n * hw * (2 * c_in + 2 * c_out) + wbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(n, h, w, c_out)


def fused_bottleneck_unit(
    x: jax.Array,
    params: Dict[str, jax.Array],
    *,
    h: int,
    w: int,
    has_shortcut: bool = False,
    interpret: bool = False,
    group: int | None = None,
) -> jax.Array:
    """One fused unit (single-element chain); see ``fused_block``."""
    return fused_block(
        x, (params,), h=h, w=w, unit_specs=(has_shortcut,),
        interpret=interpret, group=group,
    )


def prepare_pallas_unit(
    qp: Dict[str, jax.Array],
    scales: Dict[str, jax.Array],
    pre: str,
    has_shortcut: bool,
) -> Dict[str, jax.Array]:
    """Fold (qp, static scales) for one unit into kernel operands.

    ``qp``/``scales`` are models/resnet_int8.prepare_int8_params /
    calibrate_int8_scales outputs; ``pre`` the unit prefix
    ('block2/unit_2/bottleneck_v2/'). The requant multipliers compose
    dequant (s_x * scale) and next-layer quant (1/s_out) exactly as
    apply_int8_static does, so the kernel is numerically equivalent.
    """
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    s_p = f32(scales[pre + "preact"])
    s_h1 = f32(scales[pre + "conv1"])
    s_h2 = f32(scales[pre + "conv2"])
    row = lambda v: f32(v).reshape(1, -1)

    w1 = qp[pre + "conv1/wq"]
    w2 = qp[pre + "conv2/wq"]
    w3 = qp[pre + "conv3/wq"]
    cb = w2.shape[-1]
    out = {
        "pA": row(qp[pre + "preact/A"]) / s_p,
        "pB": row(qp[pre + "preact/B"]) / s_p,
        "w1": w1.reshape(w1.shape[-2], w1.shape[-1]),
        "q1m": row(qp[pre + "conv1/scale"]) * s_p / s_h1,
        "q1a": row(qp[pre + "conv1/bias"]) / s_h1,
        "w2": w2.reshape(9 * cb, cb),
        "q2m": row(qp[pre + "conv2/scale"]) * s_h1 / s_h2,
        "q2a": row(qp[pre + "conv2/bias"]) / s_h2,
        "w3": w3.reshape(w3.shape[-2], w3.shape[-1]),
        "d3m": row(qp[pre + "conv3/scale"]) * s_h2,
        "d3a": row(qp[pre + "conv3/bias"]),
    }
    if has_shortcut:
        wsc = qp[pre + "shortcut/wq"]
        out["wsc"] = wsc.reshape(wsc.shape[-2], wsc.shape[-1])
        out["dscm"] = row(qp[pre + "shortcut/scale"]) * s_p
        out["dsca"] = row(qp[pre + "shortcut/bias"])
    return out
