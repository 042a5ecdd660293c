"""Int8 quantized ResNet-50 v2 inference path (post-training quant).

Why: the v5e MXU executes s8 x s8 -> s32 at ~2x its bf16 rate —
measured on this chip with artifact-proof chained timing (CLAUDE.md
perf ledger): 4096^3 matmul 358 TOP/s int8 vs 196 TFLOP/s bf16, and
366-405 TOP/s vs 180-192 TFLOP/s on the resnet-stage 3x3 convs
*including* requantization overhead. Quantizing the encoder targets
the dominant compute in video->SMPL inference (encoder_resnet,
/root/reference/src/models.py:50-77).

MEASURED RESULTS on v5e at batch 160, 224x224 (bf16 trunk: 10.63 ms):
- DYNAMIC activation scales via XLA: 11.9-14.1 ms — SLOWER than bf16.
  Each re-quantization needs a max|x| reduction over the conv output,
  which forces materialization plus ~2 extra HBM passes per conv.
- STATIC calibrated scales via XLA (``apply_int8_static``): 9.99 ms —
  the dequant+quant pair composes into one elementwise epilogue that
  XLA fuses into the integer conv, so int8 beats bf16 by ~6%.
- STATIC + fused Pallas bottleneck units/chains (``use_pallas=True``,
  ops/resnet_int8_pallas.py): 12.5-13.4 ms — SLOWER than the XLA
  static path in every variant tried (per-unit, concatenated-tap,
  whole-block chains; full per-block attribution in that module's
  docstring). XLA's tile-pipelined integer convs win; the kernel is
  kept as a tested experimental path and a documented negative.
- STATIC + int8 RESIDUAL STREAM (``int8_stream=True``): 10.57 ms —
  also SLOWER than the bf16-stream static path (9.99). Carrying the
  inter-unit activations as int8 should halve the HBM bytes of the
  preact read and shortcut add, but the measured loss shows those
  passes are not the binding cost at this size (XLA fuses them into
  conv operands/epilogues either way; the extra f32 round/clip VPU
  work in every epilogue outweighs the byte savings). Per-BLOCK
  restriction doesn't rescue it: with the int8 root (9.55 below),
  stream (1,) = 9.76 and stream (1, 2) = 9.88 — negative even where
  the spatial maps are largest. Kept as a tested opt-in; refutes the
  "stream elementwise is the 131 vs 366 T/s gap" hypothesis — the
  gap lives in root/block1 geometry and strided units, not the
  stream dtype.
- STATIC + INT8 ROOT STEM (``int8_root=True``): **9.55 ms = 16.8k
  img/s at B=160, 6.19 ms = 19.4k img/s at B=120** — the fastest
  measured ISOLATED trunk on this chip (+5% over static's
  10.02/6.49 in the same session). The stem in isolation drops
  1.97 -> 1.16 ms: the stride-folded space-to-depth conv (7x7/2
  Cin=3 == exact 4x4/1 Cin=12, `_s2d_root_weights`) fixes the worst
  MXU geometry in the trunk, input quantization is lossless-grade on
  natively-8-bit images (fixed 1/127 grid), and the conv epilogue
  requantizes so the 3x3/2 maxpool runs on int8 (exact: per-channel
  max commutes with a positive scale), halving the stem's dominant
  HBM traffic. Per-stage attribution that led here: root+pool
  1.85 ms @ 20 T/s, block1 3.66 ms @ 47 T/s, blocks 3-4 @ 219-274
  T/s (probe_mxu int8_stages). BUT inside the predictor's fused
  whole-clip program it measures ~3% SLOWER end-to-end (10-rep A/B
  medians 33.8 vs 32.7 ms per 480-frame clip): the s2d
  reshape+transpose is an extra unfused HBM pass there, and the
  isolated stem win does not survive XLA's scheduling of the larger
  program. Kept as a tested opt-in; bench.py stays on the
  bf16-root static config.
- STATIC + WIDTH-FOLD ROOT (``int8_root="wfold"``): the transpose-free
  fix attempt — ``_wfold`` merges adjacent width pixels into channels
  as a PURE RESHAPE (free in NHWC), giving a 7x4/strides-(2,1) Cin=6
  conv. Trunk-level it lands between the others (B=160: static 9.87,
  wfold 9.70, s2d 9.55 ms; B=120 session: 6.10 / 6.32 / 6.15). e2e
  through the fused predictor (10-rep interleaved A/B medians,
  480-frame clips): base 32.8, wfold 33.7, s2d 35.6 ms — wfold
  recovers most of s2d's e2e loss (the transpose WAS a real cost) but
  still trails the bf16-root static config by ~2.5%. Since removing
  the transpose did not flip the sign, the remaining cost is the
  extra full-resolution input quantize pass (f32 read -> int8 write)
  that the bf16 root avoids by feeding images straight into the conv.
  Both roots stay tested opt-ins; bench.py stays on base static.
- STATIC + BYTE-DIRECT ROOT (``int8_root="u8"``): raw uint8 frames
  enter the wfold conv as (u ^ 0x80) int8 with an exact affine border
  correction folded into the epilogue bias — NO full-resolution
  normalize or quantize pass, and the 255-grid representation is
  exact (bit-identical between uint8 and normalized-float ingestion,
  verified on the real chip). e2e 20-rep interleaved A/B vs base
  static: 32.54 vs 32.67 ms/clip — statistical tie; the input-pass
  cost that made wfold -2.5% is gone, what remains is the wfold conv
  geometry at B=120. The probe_mxu ``wfold_block1`` follow-up showed
  block1 is HBM-bound (its 1x1 256<->64 pair runs ~380 GB/s), closing
  the encoder-geometry search.
Use ``HmmrPredictor(int8_encoder=True, int8_calibration=frames)`` for
the fastest measured path (add ``int8_root="u8"`` to feed raw uint8
frames at equal speed); dynamic (no calibration) stays for
weight-memory-bound serving and warns that it is slower.

Scheme (standard symmetric PTQ, chosen for exactness of intent and
zero calibration data):
- Weights: per-output-channel symmetric int8 (`s_w[c] = max|w|/127`).
- Activations: dynamic per-tensor symmetric int8, scale computed on
  device per call (`s_x = max|x|/127`) — no calibration assets needed.
- BatchNorm (inference uses moving stats) is FOLDED into the conv
  dequantization: conv -> BN+relu becomes
  `relu(y_i32 * (s_x*s_w*A)[c] + B[c])` with `A = g/sqrt(v+eps)`,
  `B = b - m*A` — one fused multiply-add, no separate BN pass.
- Everything elementwise (preact, requant, shortcut adds, pooling)
  runs in bf16; conv accumulators are int32.
- The root 7x7 conv (3 input channels — MXU-inefficient and ~3% of
  FLOPs) and the final postnorm/pool stay bf16.

Zero-padding note: symmetric quantization maps real 0 to quantized 0,
so XLA's zero-padded int8 convolutions remain exact at the borders
(an asymmetric/uint8 scheme would not have this property).

The v2/preact structure of models/resnet.py (preact BN+relu feeding
both branches, identity shortcuts on the RAW input, stride on the last
unit, slim conv2d_same padding) is replicated exactly; only number
formats change. Opt-in via ``HmmrPredictor(int8_encoder=True)``; the
fp32/bf16 paths remain the parity-bearing defaults.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

BLOCKS = (
    (3, 256, 64),
    (4, 512, 128),
    (6, 1024, 256),
    (3, 2048, 512),
)
BN_EPS = 1e-5


def _fold_bn(params: Dict, stats: Dict):
    """(gamma, beta, moving stats) -> (A, B) with y_bn = y*A + B."""
    a = params["gamma"] * jax.lax.rsqrt(stats["moving_variance"] + BN_EPS)
    b = params["beta"] - stats["moving_mean"] * a
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _quant_weight(w: jax.Array):
    """Per-output-channel symmetric int8: w (H, W, I, O)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _s2d_root_weights(w: jax.Array) -> jax.Array:
    """Fold the root 7x7/stride-2 conv into an exact 4x4/stride-1 conv
    over space-to-depth input: 7x7/2 on (224,224,3) == 4x4/1 on
    (112,112,12) with rearranged (1/16 zero-padded) weights. Each
    original tap (ky,kx) maps to s2d tap (ay,ax) and phase (dy,dx):
    ky-3 = 2*ay' + dy, ay = ay'+2 — standard MLPerf-ResNet stem trick,
    done once at weight-prep, NOT a retrain (the transform is exact).
    """
    w2 = jnp.zeros((4, 4, 12, w.shape[-1]), w.dtype)
    for ky in range(7):
        dy = (ky - 3) % 2
        ay = (ky - 3 - dy) // 2 + 2
        for kx in range(7):
            dx = (kx - 3) % 2
            ax = (kx - 3 - dx) // 2 + 2
            c2 = (dy * 2 + dx) * 3
            w2 = w2.at[ay, ax, c2:c2 + 3, :].set(w[ky, kx])
    return w2


def _s2d(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), 2x2 phase-major."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _wfold_root_weights(w: jax.Array) -> jax.Array:
    """Fold only the WIDTH stride of the root 7x7/2 conv: 7x7/2 on
    (224,224,3) == (7,4)-kernel conv with strides (2,1) and padding
    ((3,3),(2,1)) on the width-paired view (224,112,6). Unlike full
    space-to-depth, the input transform ``_wfold`` is a pure reshape
    (adjacent width pixels merge into channels IN NHWC LAYOUT ORDER),
    so it costs nothing — no transpose pass. Original tap kx maps to
    folded column a=(kx+1)//2 and phase p=(kx+1)%2 (channel slot
    p*C+c); 7 of the 8 (column, phase) slots per row are used. Per
    output the contraction grows 147 (7x7x3) -> 168 (7x4x6, 12.5%
    zeros), vs 192 (4x4x12, 23% zeros) for full s2d.
    """
    k, _, c, o = w.shape
    assert k == 7
    w2 = jnp.zeros((7, 4, 2 * c, o), w.dtype)
    for kx in range(7):
        a, p = (kx + 1) // 2, (kx + 1) % 2
        w2 = w2.at[:, a, p * c:(p + 1) * c, :].set(w[:, kx])
    return w2


def _wfold(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H, W/2, 2C): pure reshape, free in NHWC."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def prepare_int8_params(variables) -> Dict[str, jax.Array]:
    """Flatten + quantize ResNetV2_50 flax variables for apply_int8.

    Cheap (one pass over ~23M weights) — callers may run it inside the
    same jit as the forward; XLA constant-folds it when `variables` are
    literals and it costs ~a bandwidth pass otherwise.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    w_root = params["conv1"]["kernel"]
    wq_s2d, s_s2d = _quant_weight(_s2d_root_weights(w_root))
    wq_wf, s_wf = _quant_weight(_wfold_root_weights(w_root))
    out: Dict[str, jax.Array] = {
        "root/w": w_root.astype(jnp.bfloat16),
        "root/b": params["conv1"]["bias"].astype(jnp.bfloat16),
        # Exact stride-folded space-to-depth root (int8_root fast path)
        "root/wq_s2d": wq_s2d,
        "root/scale_s2d": s_s2d,
        # Width-only stride fold (int8_root="wfold"): the input view is
        # a FREE reshape, no s2d transpose pass.
        "root/wq_wfold": wq_wf,
        "root/scale_wfold": s_wf,
        "root/b32": params["conv1"]["bias"].astype(jnp.float32),
    }
    for bi, (num_units, _depth, _db) in enumerate(BLOCKS, start=1):
        for ui in range(1, num_units + 1):
            name = f"block{bi}/unit_{ui}/bottleneck_v2"
            p, st = params[name], stats[name]
            pre = f"{name}/"
            out[pre + "preact/A"], out[pre + "preact/B"] = _fold_bn(
                p["preact"], st["preact"]
            )
            for conv, bn in (("conv1", "conv1_bn"), ("conv2", "conv2_bn")):
                q, sw = _quant_weight(p[conv]["kernel"])
                a, b = _fold_bn(p[bn], st[bn])
                out[pre + conv + "/wq"] = q
                # Fold BN scale into the dequant multiplier.
                out[pre + conv + "/scale"] = sw * a
                out[pre + conv + "/bias"] = b
            q, sw = _quant_weight(p["conv3"]["kernel"])
            out[pre + "conv3/wq"] = q
            out[pre + "conv3/scale"] = sw
            out[pre + "conv3/bias"] = p["conv3"]["bias"].astype(
                jnp.float32
            )
            if "shortcut" in p:
                q, sw = _quant_weight(p["shortcut"]["kernel"])
                out[pre + "shortcut/wq"] = q
                out[pre + "shortcut/scale"] = sw
                out[pre + "shortcut/bias"] = p["shortcut"]["bias"].astype(
                    jnp.float32
                )
    out["postnorm/A"], out["postnorm/B"] = _fold_bn(
        params["postnorm"], stats["postnorm"]
    )
    return out


def _quant_act(x: jax.Array):
    """Dynamic per-tensor symmetric int8."""
    s = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-12
    q = jnp.clip(
        jnp.round(x / s.astype(x.dtype)), -127, 127
    ).astype(jnp.int8)
    return q, s


def _conv_s8(xq: jax.Array, wq: jax.Array, stride: int) -> jax.Array:
    """int8 conv, int32 accumulate; slim conv2d_same padding rules."""
    k = wq.shape[0]
    if stride == 1:
        padding = "SAME"
    else:
        pad_beg = (k - 1) // 2
        pad_end = k - 1 - pad_beg
        padding = ((pad_beg, pad_end), (pad_beg, pad_end))
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def calibrate_int8_scales(
    qp: Dict[str, jax.Array], images: jax.Array, margin: float = 1.0
) -> Dict[str, jax.Array]:
    """Observe per-layer activation maxima for the static-scale path.

    Runs the dynamic-quant trunk on a calibration batch and records the
    per-tensor scales it computed (3 scalars per bottleneck unit:
    preact / conv1 / conv2 outputs). Feed several batches and reduce
    with ``merge_calibrations``. ``margin`` (>1 guards outliers at the
    cost of resolution) multiplies every scale.
    """
    scales: Dict[str, jax.Array] = {}
    apply_int8(qp, images, _observe=scales)
    if margin != 1.0:
        scales = {k: v * margin for k, v in scales.items()}
    return scales


def merge_calibrations(*scale_dicts) -> Dict[str, jax.Array]:
    """Elementwise max across per-batch calibration dicts."""
    out = dict(scale_dicts[0])
    for d in scale_dicts[1:]:
        for k, v in d.items():
            out[k] = jnp.maximum(out[k], v)
    return out


def apply_int8_static(
    qp: Dict[str, jax.Array],
    scales: Dict[str, jax.Array],
    images: jax.Array,
    use_pallas: bool = False,
    pallas_blocks: tuple = (2, 3, 4),
    int8_stream: bool = False,
    int8_root=False,
) -> jax.Array:
    """Static-scale int8 trunk: requant fused into conv epilogues.

    ``int8_root``: False (bf16 root), True (s2d stride-folded int8
    stem), or "wfold" (width-only fold — the input view is a free
    reshape, no transpose pass; built for the fused whole-clip
    program).

    The dynamic path (``apply_int8``) is ~25% slower than bf16 because
    every activation re-quantization needs a max|x| REDUCTION over the
    conv output — XLA must materialize the tensor, reduce it, then run
    a separate quantize pass (~2 extra HBM round trips per conv). With
    calibrated static scales the requant is pure elementwise and fuses
    into the integer conv's epilogue, which `scripts/probe_mxu.py`
    measured at 366-405 TOP/s (~2x bf16) on the stage convs. scales
    comes from ``calibrate_int8_scales``.

    ``use_pallas`` additionally runs every stride-1 bottleneck unit of
    blocks 2-4 as ONE fused Pallas kernel (ops/resnet_int8_pallas.py):
    the whole unit's intermediates stay in VMEM, so the residual stream
    is read+written once per unit instead of ~4x.
    """
    return apply_int8(
        qp, images, _static_scales=scales, _use_pallas=use_pallas,
        _pallas_blocks=pallas_blocks, _int8_stream=int8_stream,
        _int8_root=int8_root,
    )


def apply_int8(
    qp: Dict[str, jax.Array],
    images: jax.Array,
    _observe: Optional[Dict[str, jax.Array]] = None,
    _static_scales: Optional[Dict[str, jax.Array]] = None,
    _use_pallas: bool = False,
    _pallas_blocks: tuple = (2, 3, 4),
    _int8_stream: bool = False,
    _int8_root=False,
) -> jax.Array:
    """(N, H, W, 3) [-1, 1] images -> (N, 2048) fp32 phi."""
    # int8 residual stream: inter-unit activations ride HBM as int8
    # with calibrated per-unit scales, halving the traffic of the
    # stream-bound elementwise passes (preact read, shortcut add);
    # every dequant folds into an adjacent fused pass. GLOBALLY
    # (True = all blocks) this measured SLOWER than the bf16 stream
    # (10.57 vs 9.99 ms at batch 160 on v5e): the byte savings only
    # dominate where spatial maps are large, so a per-block tuple
    # (e.g. (1,)) restricts streaming to the early blocks — see the
    # module docstring for measurements.
    stream_blocks = (
        (1, 2, 3, 4) if _int8_stream is True
        else tuple(_int8_stream) if _int8_stream else ()
    )
    if stream_blocks or _int8_root:
        assert _static_scales is not None, (
            "int8_stream/int8_root need calibrated static scales"
        )
    s_stream = None
    if _int8_root:
        # Fast root stem (measured 1.97 -> 1.16 ms at batch 160 on
        # v5e): images are natively 8-bit so the fixed 1/127 grid
        # loses nothing; the stride-folded s2d 4x4 conv replaces the
        # MXU-hostile Cin=3 7x7/2 geometry; the conv epilogue
        # requantizes so the 3x3/2 maxpool runs on int8 (exact per
        # channel: max commutes with the positive scale), halving the
        # stem's dominant HBM traffic.
        s_root = _static_scales["root/out"]
        if _int8_root == "u8":
            # Byte-direct root: raw uint8 frames enter the conv as
            # (u ^ 0x80) int8 — NO full-resolution float pass at all
            # (no normalize, no quantize; the only elementwise work is
            # a byte->byte bit flip). The crop normalization
            # x = 2u/255 - 1 (crop.py:52) is affine in u, so with
            # q = u - 128:  x = (2/255) q + 1/255, and
            #   conv(x) = s_w * ((2/255) conv_s8(q) + (1/255) ones_conv)
            # where ones_conv = conv_s8(1-mask) is a constant map that
            # is the per-channel weight sum in the interior and the
            # truncated-window sum at SAME-padded borders — so the
            # affine offset is corrected EXACTLY everywhere, including
            # padding (padded taps contribute 0 to both terms). This
            # representation of x is exact (the 255-grid IS the input),
            # strictly tighter than the 1/127 grid of the other roots.
            if images.dtype == jnp.uint8:
                q = jax.lax.bitcast_convert_type(
                    images ^ jnp.uint8(128), jnp.int8
                )
            else:
                # Already-normalized floats (tests / non-u8 pipelines):
                # snap back to the exact 255-grid; bit-identical to the
                # uint8 branch for inputs that came from bytes.
                q = (jnp.clip(
                    jnp.round(
                        images.astype(jnp.float32) * 127.5 + 127.5
                    ), 0, 255,
                ) - 128.0).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                _wfold(q), qp["root/wq_wfold"], (2, 1),
                ((3, 3), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # Constant border-correction map (1, H/2, W/2, 64): conv of
            # an all-ones image. Loop-invariant and input-independent —
            # XLA hoists/CSEs it; cost is one batch-element of root
            # conv even if it doesn't (~1/120 of a chunk).
            ones_conv = jax.lax.conv_general_dilated(
                _wfold(jnp.ones((1,) + q.shape[1:], jnp.int8)),
                qp["root/wq_wfold"], (2, 1), ((3, 3), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            w_scale = qp["root/scale_wfold"]
            mult = w_scale * (2.0 / 255.0)
            bias_map = (
                ones_conv.astype(jnp.float32) * (w_scale / 255.0)
                + qp["root/b32"]
            )
        else:
            xq = jnp.clip(
                jnp.round(images * 127.0), -127, 127
            ).astype(jnp.int8)
            if _int8_root == "wfold":
                # Width-only fold: _wfold is a pure reshape (free), so
                # the stem has no transpose pass at all — the variant
                # built for the fused whole-clip program, where the s2d
                # transpose measured as an extra unfused HBM pass.
                y = jax.lax.conv_general_dilated(
                    _wfold(xq), qp["root/wq_wfold"], (2, 1),
                    ((3, 3), (2, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                w_scale = qp["root/scale_wfold"]
            else:
                y = jax.lax.conv_general_dilated(
                    _s2d(xq), qp["root/wq_s2d"], (1, 1),
                    ((2, 1), (2, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                w_scale = qp["root/scale_s2d"]
            mult = w_scale / 127.0
            bias_map = qp["root/b32"]
        yq = jnp.clip(jnp.round(
            y.astype(jnp.float32) * (mult / s_root)
            + bias_map / s_root), -127, 127).astype(jnp.int8)
        x = jax.lax.reduce_window(
            yq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), "SAME"
        )
        s_stream = s_root  # x is int8 until a non-stream block
    else:
        x = images.astype(jnp.bfloat16)
        # Root conv2d_same 7x7/2 (bf16) + 3x3/2 SAME maxpool.
        x = jax.lax.conv_general_dilated(
            x, qp["root/w"], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + qp["root/b"]
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            "SAME"
        )
        if _observe is not None:
            _observe["root/out"] = (
                jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-12
            )

    def dequant(y_i32, s_x, scale, bias, relu):
        # fp32 math inside one fused elementwise pass (registers, not
        # memory traffic — the expensive thing is extra passes, not
        # precision), bf16 result written out.
        y = (y_i32.astype(jnp.float32) * (s_x * scale) + bias).astype(
            jnp.bfloat16
        )
        return jnp.maximum(y, 0) if relu else y

    def requant(y_i32, s_x, scale, bias, s_out, relu):
        # Static-scale path: dequant + next-layer quantization composed
        # into ONE elementwise epilogue on the int32 conv output (no
        # reduction, no intermediate bf16 tensor) — this is what lets
        # XLA fuse it into the integer conv like probe_mxu's shift.
        y = y_i32.astype(jnp.float32) * (
            s_x * scale / s_out
        ) + bias / s_out
        lo = 0.0 if relu else -127.0  # relu folds into the low clamp
        return jnp.clip(jnp.round(y), lo, 127.0).astype(jnp.int8)

    # Consecutive Pallas-eligible units chain into ONE kernel per block
    # (the residual stream crosses HBM once per chain, not per unit).
    pending_params: list = []
    pending_specs: list = []

    def flush_chain(x):
        if not pending_params:
            return x
        from human_dynamics_tpu.ops.resnet_int8_pallas import (
            fused_block,
        )

        x = fused_block(
            x, tuple(pending_params), h=x.shape[1], w=x.shape[2],
            unit_specs=tuple(pending_specs),
        )
        pending_params.clear()
        pending_specs.clear()
        return x

    def _boundary_scale(bi):
        if bi == 1:
            return _static_scales["root/out"]
        n_prev = BLOCKS[bi - 2][0]
        return _static_scales[
            f"block{bi-1}/unit_{n_prev}/bottleneck_v2/out"]

    cur_depth = x.shape[-1]  # logical channels incl. pending chain units
    for bi, (num_units, depth, _db) in enumerate(BLOCKS, start=1):
        last_block = bi == len(BLOCKS)
        in_stream = bi in stream_blocks
        # Stream <-> bf16 transitions happen at block boundaries (one
        # cheap elementwise pass over the between-block map).
        if in_stream and s_stream is None:
            x = flush_chain(x)
            s_stream = _boundary_scale(bi)
            x = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_stream), -127, 127
            ).astype(jnp.int8)
        elif not in_stream and s_stream is not None:
            x = x.astype(jnp.bfloat16) * s_stream.astype(jnp.bfloat16)
            s_stream = None
        for ui in range(1, num_units + 1):
            stride = 2 if (ui == num_units and not last_block) else 1
            pre = f"block{bi}/unit_{ui}/bottleneck_v2/"
            depth_in = cur_depth
            cur_depth = depth

            if (_use_pallas and not in_stream
                    and _static_scales is not None
                    and stride == 1 and _db >= 128
                    and bi in _pallas_blocks):
                from human_dynamics_tpu.ops.resnet_int8_pallas import (
                    prepare_pallas_unit,
                )

                pending_params.append(prepare_pallas_unit(
                    qp, _static_scales, pre,
                    has_shortcut=depth != depth_in,
                ))
                pending_specs.append(depth != depth_in)
                continue
            x = flush_chain(x)

            if in_stream:
                s_p = _static_scales[pre + "preact"]
                # preact+quant directly from the int8 stream: ONE fused
                # pass reading 1 byte/el instead of 2.
                pq = jnp.clip(
                    jnp.round(jnp.maximum(
                        x.astype(jnp.float32)
                        * (s_stream * qp[pre + "preact/A"] / s_p)
                        + qp[pre + "preact/B"] / s_p,
                        0,
                    )), 0, 127,
                ).astype(jnp.int8)
            else:
                preact = jnp.maximum(
                    x * qp[pre + "preact/A"].astype(jnp.bfloat16)
                    + qp[pre + "preact/B"].astype(jnp.bfloat16),
                    0,
                )
                if _static_scales is not None:
                    s_p = _static_scales[pre + "preact"]
                    pq = jnp.clip(
                        jnp.round(
                            preact.astype(jnp.float32) / s_p
                        ), 0, 127,
                    ).astype(jnp.int8)
                else:
                    pq, s_p = _quant_act(preact)
                    if _observe is not None:
                        _observe[pre + "preact"] = s_p

            if depth == depth_in:
                sc_raw = (
                    x if stride == 1 else x[:, ::stride, ::stride, :]
                )
                shortcut = (
                    (sc_raw, s_stream) if in_stream else sc_raw
                )
            else:
                y = _conv_s8(pq, qp[pre + "shortcut/wq"], stride)
                shortcut = dequant(
                    y, s_p, qp[pre + "shortcut/scale"],
                    qp[pre + "shortcut/bias"], relu=False,
                )

            y = _conv_s8(pq, qp[pre + "conv1/wq"], 1)
            if _static_scales is not None:
                s_h = _static_scales[pre + "conv1"]
                hq = requant(y, s_p, qp[pre + "conv1/scale"],
                             qp[pre + "conv1/bias"], s_h, relu=True)
            else:
                h = dequant(y, s_p, qp[pre + "conv1/scale"],
                            qp[pre + "conv1/bias"], relu=True)
                hq, s_h = _quant_act(h)
                if _observe is not None:
                    _observe[pre + "conv1"] = s_h
            y = _conv_s8(hq, qp[pre + "conv2/wq"], stride)
            if _static_scales is not None:
                s_h2 = _static_scales[pre + "conv2"]
                hq = requant(y, s_h, qp[pre + "conv2/scale"],
                             qp[pre + "conv2/bias"], s_h2, relu=True)
                s_h = s_h2
            else:
                h = dequant(y, s_h, qp[pre + "conv2/scale"],
                            qp[pre + "conv2/bias"], relu=True)
                hq, s_h = _quant_act(h)
                if _observe is not None:
                    _observe[pre + "conv2"] = s_h
            y = _conv_s8(hq, qp[pre + "conv3/wq"], 1)
            if in_stream:
                # Fused add+requant on (int8 shortcut | f32 shortcut,
                # int32 conv3): one elementwise pass, int8 out.
                s_out = _static_scales[pre + "out"]
                res = y.astype(jnp.float32) * (
                    s_h * qp[pre + "conv3/scale"] / s_out
                ) + qp[pre + "conv3/bias"] / s_out
                if isinstance(shortcut, tuple):  # (int8, scale)
                    sc_q, sc_s = shortcut
                    res = res + sc_q.astype(jnp.float32) * (
                        sc_s / s_out
                    )
                else:
                    res = res + shortcut.astype(jnp.float32) / s_out
                x = jnp.clip(jnp.round(res), -127, 127).astype(
                    jnp.int8
                )
                s_stream = s_out
            else:
                residual = dequant(y, s_h, qp[pre + "conv3/scale"],
                                   qp[pre + "conv3/bias"], relu=False)
                x = shortcut + residual
                if _observe is not None:
                    _observe[pre + "out"] = (
                        jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
                        + 1e-12
                    )

    x = flush_chain(x)  # block4's stride-1 chain ends the trunk
    if s_stream is not None:  # trunk ended in-stream (block4 streamed)
        x = jnp.maximum(
            x.astype(jnp.float32) * (s_stream * qp["postnorm/A"])
            + qp["postnorm/B"],
            0,
        ).astype(jnp.bfloat16)
    else:
        x = jnp.maximum(
            x * qp["postnorm/A"].astype(jnp.bfloat16)
            + qp["postnorm/B"].astype(jnp.bfloat16),
            0,
        )
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
