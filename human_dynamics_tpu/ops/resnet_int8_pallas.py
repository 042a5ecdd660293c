"""Pallas fused int8 bottleneck-v2 unit: the whole residual unit as ONE
TPU kernel.

Why: with static activation scales the XLA int8 trunk
(models/resnet_int8.apply_int8_static) already fuses each requant into
its conv epilogue, but every conv boundary still materializes an
activation tensor in HBM — per unit the residual stream is read/written
~4x. Measured: 9.99 ms/batch160 vs bf16's 10.63 ms, while the convs
alone run at ~2x the bf16 MXU rate (scripts/probe_mxu.py). The only way
to close that gap is to keep a unit's intermediates in VMEM, which XLA
will not do across convolutions — hence this kernel.

Design (planar 2-D throughout — Mosaic rejects >1 batch-dim matmuls and
most in-kernel reshapes, see CLAUDE.md):
- The image is processed per grid step as an (H*W, C) planar matrix.
- preact BN+relu and int8 quantization fold into one elementwise pass:
  pq = clip(round(max(x*pA + pB, 0)), 0, 127), pA = A/s_p, pB = B/s_p.
- 1x1 convs are plain (HW, Cin) @ (Cin, Cout) int8 matmuls (MXU,
  s8 x s8 -> s32).
- The 3x3 conv is 9 shifted matmuls on the planar matrix: tap (dy, dx)
  contributes in[r + (dy-1)*W + (dx-1)] @ W[dy,dx]. Row shifts resolve
  via a zero-padded copy of the input (H-edge zeros); column wrap at
  the W edges is cancelled by masking the shifted operand where
  (r mod W) + dx - 1 lands outside [0, W).
- Requantization multipliers are precomputed per channel on the host
  (q1m = s_p*scale1/s_h1 etc.), so each epilogue is one fused
  multiply-add-round-clip on registers.
- The unit's output (shortcut + dequantized conv3) is the only HBM
  write; the bf16 input is the only HBM read.

Applies to stride-1 bottleneck units (identity shortcut, or the
projection-shortcut unit_1 of a block — the projection is just one more
1x1 matmul on pq). Stride-2 units and the root stay on XLA.

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


def _fused_unit_kernel(
    x_ref, pa_ref, pb_ref, w1_ref, q1m_ref, q1a_ref, w2_ref,
    q2m_ref, q2a_ref, w3_ref, d3m_ref, d3a_ref, out_ref,
    pad_ref, *, hw: int, w: int, cb: int, has_shortcut: bool,
):
    """One stride-1 bottleneck unit on one (HW, Cin) planar image."""
    if has_shortcut:
        # Projection-shortcut variant appends wsc/dscm/dsca before out.
        raise AssertionError("use _fused_unit_kernel_sc")
    xf = x_ref[0].astype(jnp.float32)                      # (HW, Cin)
    pq = jnp.clip(
        jnp.round(jnp.maximum(xf * pa_ref[:] + pb_ref[:], 0.0)),
        0.0, 127.0,
    ).astype(jnp.int8)

    h1 = jnp.dot(pq, w1_ref[:], preferred_element_type=jnp.int32)
    h1q = jnp.clip(
        jnp.round(h1.astype(jnp.float32) * q1m_ref[:] + q1a_ref[:]),
        0.0, 127.0,
    ).astype(jnp.int8)                                     # (HW, Cb)

    res = _conv3x3_planar(h1q, w2_ref, q2m_ref, q2a_ref, w3_ref,
                          pad_ref, hw=hw, w=w, cb=cb)
    out_ref[0] = (
        xf + res.astype(jnp.float32) * d3m_ref[:] + d3a_ref[:]
    ).astype(out_ref.dtype)


def _fused_unit_kernel_sc(
    x_ref, pa_ref, pb_ref, w1_ref, q1m_ref, q1a_ref, w2_ref,
    q2m_ref, q2a_ref, w3_ref, d3m_ref, d3a_ref,
    wsc_ref, dscm_ref, dsca_ref, out_ref,
    pad_ref, *, hw: int, w: int, cb: int,
):
    """Projection-shortcut (unit_1) variant: shortcut = 1x1 conv on pq."""
    xf = x_ref[0].astype(jnp.float32)
    pq = jnp.clip(
        jnp.round(jnp.maximum(xf * pa_ref[:] + pb_ref[:], 0.0)),
        0.0, 127.0,
    ).astype(jnp.int8)

    ysc = jnp.dot(pq, wsc_ref[:], preferred_element_type=jnp.int32)
    shortcut = ysc.astype(jnp.float32) * dscm_ref[:] + dsca_ref[:]

    h1 = jnp.dot(pq, w1_ref[:], preferred_element_type=jnp.int32)
    h1q = jnp.clip(
        jnp.round(h1.astype(jnp.float32) * q1m_ref[:] + q1a_ref[:]),
        0.0, 127.0,
    ).astype(jnp.int8)

    res = _conv3x3_planar(h1q, w2_ref, q2m_ref, q2a_ref, w3_ref,
                          pad_ref, hw=hw, w=w, cb=cb)
    out_ref[0] = (
        shortcut + res.astype(jnp.float32) * d3m_ref[:] + d3a_ref[:]
    ).astype(out_ref.dtype)


def _conv3x3_planar(h1q, w2_ref, q2m_ref, q2a_ref, w3_ref, pad_ref,
                    *, hw: int, w: int, cb: int):
    """3x3 SAME conv + requant + 1x1 conv3 on a planar (HW, Cb) int8."""
    pad0 = w + 2  # covers the max row shift |(dy-1)*w + (dx-1)| = w+1
    # Zero the H-edge pads once, then drop the payload in the middle.
    pad_ref[0:pad0, :] = jnp.zeros((pad0, cb), jnp.int8)
    pad_ref[pad0 + hw:, :] = jnp.zeros(
        (pad_ref.shape[0] - pad0 - hw, cb), jnp.int8
    )
    pad_ref[pad0:pad0 + hw, :] = h1q

    w_col = jax.lax.broadcasted_iota(jnp.int32, (hw, cb), 0) % w
    acc = jnp.zeros((hw, cb), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            off = (dy - 1) * w + (dx - 1)
            shifted = pad_ref[pad0 + off:pad0 + off + hw, :]
            # Cancel the column wrap at the W edges for this tap.
            if dx != 1:
                valid = (
                    (w_col + dx - 1 >= 0) & (w_col + dx - 1 < w)
                )
                shifted = jnp.where(valid, shifted, 0).astype(jnp.int8)
            tap = w2_ref[(dy * 3 + dx) * cb:(dy * 3 + dx + 1) * cb, :]
            acc = acc + jnp.dot(
                shifted, tap, preferred_element_type=jnp.int32
            )
    h2q = jnp.clip(
        jnp.round(acc.astype(jnp.float32) * q2m_ref[:] + q2a_ref[:]),
        0.0, 127.0,
    ).astype(jnp.int8)
    return jnp.dot(h2q, w3_ref[:], preferred_element_type=jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "has_shortcut", "interpret"),
)
def fused_bottleneck_unit(
    x: jax.Array,
    params: Dict[str, jax.Array],
    *,
    h: int,
    w: int,
    has_shortcut: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Run one fused stride-1 bottleneck unit over a batch.

    Args:
        x: (N, H, W, Cin) bf16 residual-stream input.
        params: per-unit tensors from ``prepare_pallas_unit``:
            pA/pB (1, Cin) f32; w1 (Cin, Cb) int8; q1m/q1a (1, Cb);
            w2 (9*Cb, Cb) int8; q2m/q2a (1, Cb); w3 (Cb, Cout) int8;
            d3m/d3a (1, Cout); [wsc (Cin, Cout) int8, dscm/dsca
            (1, Cout) when has_shortcut].
        h/w: spatial dims (static).
        has_shortcut: projection-shortcut (unit_1) variant.

    Returns:
        (N, H, W, Cout) in x.dtype.
    """
    # Mosaic only compiles for TPU; interpret elsewhere (CPU tests).
    interpret = interpret or jax.default_backend() != "tpu"
    n = x.shape[0]
    c_in = x.shape[-1]
    cb = params["w1"].shape[-1]
    c_out = params["w3"].shape[-1]
    hw = h * w
    # (1, HW, C) blocks: the leading grid dim keeps every block start
    # aligned regardless of HW (196/49 rows are not sublane-tile
    # multiples; 2-D (HW, C) blocks at offset i*HW fail BlockSpec
    # alignment for those geometries).
    x2 = x.reshape(n, hw, c_in)
    pad_rows = hw + 2 * (w + 2)

    operands = [
        x2, params["pA"], params["pB"], params["w1"],
        params["q1m"], params["q1a"], params["w2"],
        params["q2m"], params["q2a"], params["w3"],
        params["d3m"], params["d3a"],
    ]
    if has_shortcut:
        operands += [params["wsc"], params["dscm"], params["dsca"]]
        kernel = functools.partial(
            _fused_unit_kernel_sc, hw=hw, w=w, cb=cb
        )
    else:
        kernel = functools.partial(
            _fused_unit_kernel, hw=hw, w=w, cb=cb,
            has_shortcut=False,
        )

    rep = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, hw, c_in), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ] + [rep(a) for a in operands[1:]]

    flops = 2 * hw * cb * (c_in + 9 * cb + c_out
                           + (c_out if has_shortcut else 0))
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hw, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((pad_rows, cb), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=n * flops,
            bytes_accessed=n * hw * (2 * c_in + 2 * c_out),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(n, h, w, c_out)


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
