"""MXU roofline probes: bf16 vs int8, matmul / resnet-stage convs /
full resnet trunk — with tunnel-proof timing.

Timing method (the only one that survives this harness's tunneled
runtime, which result-caches repeated dispatches): chain N
data-dependent iterations inside ONE jitted lax.scan, time two scan
lengths, and difference them to cancel dispatch overhead. See
CLAUDE.md "Timing on this tunnel".

Measured on one v5e (2026-08, recorded in CLAUDE.md):
  matmul 4096^3       bf16 195.8 TFLOP/s   int8 358.4 TOP/s
  conv3x3 56x56x64    bf16  75.8           int8 143.9
  conv3x3 28x28x128   bf16 179.9           int8 366.5
  conv3x3 14x14x256   bf16 180.5           int8 336.0
  conv3x3  7x7x512    bf16 192.1           int8 405.4
  resnet50 fwd B=160  bf16 10.63 ms (15.0k img/s, 123 TFLOP/s eff.)
                      int8 dynamic 11.91 ms — SLOWER (per-conv max
                      reductions block epilogue fusion)
                      int8 STATIC scales 9.99 ms (16.0k img/s) — the
                      fastest encoder; requant fuses into the conv
                      int8 static + Pallas fused units 12.5-13.4 ms —
                      negative, see ops/resnet_int8_pallas.py
                      int8 static + int8 residual stream 10.57 ms —
                      negative, see models/resnet_int8.py
  conv_bwd: per-geometry fwd/dgrad/wgrad table in
  docs/perf_image_training.md (root wgrad 14.6 T/s, block1 23-41,
  blocks 2-4 ~90 T/s).

Usage: python scripts/probe_mxu.py
  [matmul|convs|resnet|resnet_int8|resnet_int8_static|
   resnet_int8_pallas|resnet_int8_stream|conv_bwd]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from human_dynamics_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

rng = np.random.RandomState(0)


def _time_scan(make_body, carry0s, length):
    """Best wall time of scan(body, c0, length) over distinct carries."""
    f = jax.jit(
        lambda c0: jax.lax.scan(make_body(), c0, None, length=length)[0]
    )
    jax.block_until_ready(f(carry0s[0]))
    best = float("inf")
    for c0 in carry0s[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(f(c0))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_iter(make_body, carry0s, short=64, long=512):
    t_s = _time_scan(make_body, carry0s, short)
    t_l = _time_scan(make_body, carry0s, long)
    return (t_l - t_s) / (long - short)


def probe_matmul():
    m = 4096
    for dtype in ("bf16", "int8"):
        if dtype == "bf16":
            b = jnp.asarray(rng.randn(m, m), jnp.bfloat16)

            def make_body():
                def body(x, _):
                    y = jax.lax.dot(
                        x, b, preferred_element_type=jnp.float32)
                    return (y * 1e-3).astype(jnp.bfloat16), ()
                return body

            c0s = [jnp.asarray(rng.randn(m, m), jnp.bfloat16)
                   for _ in range(4)]
        else:
            b = jnp.asarray(rng.randint(-127, 127, (m, m), "int8"))

            def make_body():
                def body(x, _):
                    y = jax.lax.dot(
                        x, b, preferred_element_type=jnp.int32)
                    return jnp.clip(y >> 12, -127, 127).astype(
                        jnp.int8), ()
                return body

            c0s = [jnp.asarray(rng.randint(-127, 127, (m, m), "int8"))
                   for _ in range(4)]
        per = _per_iter(make_body, c0s)
        print(f"matmul {dtype}: {per*1e3:.3f} ms = "
              f"{2*m**3/per/1e12:.1f} T/s", flush=True)


def probe_convs():
    B = 160
    for h, c in [(56, 64), (28, 128), (14, 256), (7, 512)]:
        for dtype in ("bf16", "int8"):
            if dtype == "bf16":
                w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05,
                                jnp.bfloat16)

                def make_body():
                    def body(x, _):
                        y = jax.lax.conv_general_dilated(
                            x, w, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.float32)
                        return (y * 0.05).astype(jnp.bfloat16), ()
                    return body

                c0s = [jnp.asarray(rng.randn(B, h, h, c), jnp.bfloat16)
                       for _ in range(4)]
            else:
                w = jnp.asarray(
                    rng.randint(-127, 127, (3, 3, c, c), "int8"))

                def make_body():
                    def body(x, _):
                        y = jax.lax.conv_general_dilated(
                            x, w, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.int32)
                        return jnp.clip(y >> 10, -127, 127).astype(
                            jnp.int8), ()
                    return body

                c0s = [
                    jnp.asarray(
                        rng.randint(-127, 127, (B, h, h, c), "int8"))
                    for _ in range(4)
                ]
            per = _per_iter(make_body, c0s)
            fl = 2 * B * h * h * c * c * 9
            print(f"conv3x3 {dtype} {h}x{h}x{c}: {per*1e3:.3f} ms = "
                  f"{fl/per/1e12:.1f} T/s", flush=True)


def probe_resnet(int8: bool, static: bool = False,
                 use_pallas: bool = False, int8_stream=False,
                 int8_root: bool = False):
    from human_dynamics_tpu.models.resnet import ResNetV2_50

    B = int(os.environ.get("PROBE_BATCH", "160"))
    model = ResNetV2_50()
    images = jnp.asarray(rng.randn(B, 224, 224, 3) * 0.5, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
    if int8:
        from human_dynamics_tpu.models.resnet_int8 import (
            apply_int8, apply_int8_static, calibrate_int8_scales,
            prepare_int8_params,
        )

        qp = jax.jit(prepare_int8_params)(variables)
        jax.block_until_ready(qp)
        if static:
            scales = jax.jit(
                lambda im: calibrate_int8_scales(qp, im)
            )(images[:16])
            jax.block_until_ready(scales)
            pb = tuple(
                int(c) for c in os.environ.get("PALLAS_BLOCKS", "234")
            )
            fwd = lambda x: apply_int8_static(
                qp, scales, x, use_pallas=use_pallas,
                pallas_blocks=pb, int8_stream=int8_stream,
                int8_root=int8_root,
            )
        else:
            fwd = lambda x: apply_int8(qp, x)
    else:
        from human_dynamics_tpu.utils.precision import tree_bf16

        vars16 = tree_bf16(variables)
        fwd = lambda x: model.apply(
            vars16, x.astype(jnp.bfloat16), train=False)

    def make_body():
        def body(c, _):
            phi = fwd(images + c)
            return (jnp.mean(phi) * 1e-6 + c + 1e-3).astype(
                jnp.float32), ()
        return body

    c0s = [jnp.asarray(i * 1e-4, jnp.float32) for i in range(4)]
    per = _per_iter(make_body, c0s, short=8, long=40)
    tag = ("int8-static" if static else "int8") if int8 else "bf16"
    if use_pallas:
        tag += "-pallas"
    if int8_stream:
        tag += f"-stream{int8_stream if int8_stream is not True else ''}"
    if int8_root:
        tag += "-wfoldroot" if int8_root == "wfold" else "-s2droot"
    print(f"resnet50 fwd {tag}: {per*1e3:.2f} ms/batch{B} = "
          f"{B/per:.0f} img/s = {2*4.1e9*B/per/1e12:.1f} T/s eff.",
          flush=True)


def probe_int8_stages():
    """Per-stage attribution of the static int8 trunk's ~10 ms.

    Times root(+pool), each block, and postnorm+pool in isolation with
    the real quantized params + calibrated scales (same chained-scan
    method). The int8-stream experiment measured NEGATIVE, so the
    131-vs-366 T/s gap must live in specific stages — this finds them.
    """
    from human_dynamics_tpu.models.resnet import ResNetV2_50
    from human_dynamics_tpu.models.resnet_int8 import (
        BLOCKS, _conv_s8, calibrate_int8_scales, prepare_int8_params,
    )

    B = 160
    model = ResNetV2_50()
    images = jnp.asarray(rng.randn(B, 224, 224, 3) * 0.5, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
    qp = jax.jit(prepare_int8_params)(variables)
    scales = jax.jit(
        lambda im: calibrate_int8_scales(qp, im))(images[:16])
    jax.block_until_ready(scales)

    def requant(y, s_x, scale, bias, s_out, relu):
        y = y.astype(jnp.float32) * (s_x * scale / s_out) + bias / s_out
        lo = 0.0 if relu else -127.0
        return jnp.clip(jnp.round(y), lo, 127.0).astype(jnp.int8)

    def run_root(x):
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), qp["root/w"], (2, 2),
            ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + qp["root/b"]
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            "SAME")

    def run_block(x, bi):
        num_units, depth, _db = BLOCKS[bi - 1]
        depth_in = x.shape[-1]
        for ui in range(1, num_units + 1):
            stride = 2 if (ui == num_units and bi != 4) else 1
            pre = f"block{bi}/unit_{ui}/bottleneck_v2/"
            s_p = scales[pre + "preact"]
            preact = jnp.maximum(
                x * qp[pre + "preact/A"].astype(jnp.bfloat16)
                + qp[pre + "preact/B"].astype(jnp.bfloat16), 0)
            pq = jnp.clip(
                jnp.round(preact.astype(jnp.float32) / s_p), 0, 127,
            ).astype(jnp.int8)
            if depth == depth_in:
                shortcut = x if stride == 1 else x[:, ::2, ::2, :]
            else:
                y = _conv_s8(pq, qp[pre + "shortcut/wq"], stride)
                shortcut = (y.astype(jnp.float32)
                            * (s_p * qp[pre + "shortcut/scale"])
                            + qp[pre + "shortcut/bias"]
                            ).astype(jnp.bfloat16)
            y = _conv_s8(pq, qp[pre + "conv1/wq"], 1)
            s_h = scales[pre + "conv1"]
            hq = requant(y, s_p, qp[pre + "conv1/scale"],
                         qp[pre + "conv1/bias"], s_h, relu=True)
            y = _conv_s8(hq, qp[pre + "conv2/wq"], stride)
            s_h2 = scales[pre + "conv2"]
            hq = requant(y, s_h, qp[pre + "conv2/scale"],
                         qp[pre + "conv2/bias"], s_h2, relu=True)
            y = _conv_s8(hq, qp[pre + "conv3/wq"], 1)
            residual = (y.astype(jnp.float32)
                        * (s_h2 * qp[pre + "conv3/scale"])
                        + qp[pre + "conv3/bias"]).astype(jnp.bfloat16)
            x = shortcut + residual
            depth_in = depth
        return x

    def gflop_block(bi, h_in, depth_in):
        num_units, depth, db = BLOCKS[bi - 1]
        fl = 0
        d_in = depth_in
        for ui in range(1, num_units + 1):
            stride = 2 if (ui == num_units and bi != 4) else 1
            h_out = h_in // stride
            if d_in != depth:
                fl += 2 * B * h_out * h_out * d_in * depth  # shortcut
            fl += 2 * B * h_in * h_in * d_in * db          # conv1 1x1
            fl += 2 * B * h_out * h_out * db * db * 9      # conv2 3x3
            fl += 2 * B * h_out * h_out * db * depth       # conv3 1x1
            d_in = depth
            h_in = h_out
        return fl / 1e9

    stages = [("root+pool", lambda x: run_root(x),
               (B, 224, 224, 3), jnp.float32,
               2 * B * 112 * 112 * 147 * 64 / 1e9)]
    h, d = 56, 64
    for bi, (num_units, depth, _db) in enumerate(BLOCKS, start=1):
        stages.append((
            f"block{bi}", lambda x, bi=bi: run_block(x, bi),
            (B, h, h, d), jnp.bfloat16, gflop_block(bi, h, d)))
        h, d = (h // 2 if bi != 4 else h), depth
    stages.append((
        "postnorm+pool",
        lambda x: jnp.mean(jnp.maximum(
            x * qp["postnorm/A"].astype(jnp.bfloat16)
            + qp["postnorm/B"].astype(jnp.bfloat16), 0),
            axis=(1, 2)).astype(jnp.float32),
        (B, 7, 7, 2048), jnp.bfloat16, 0.0))

    total = 0.0
    for name, fn, shape, dt, gf in stages:
        base = jnp.asarray(rng.randn(*shape) * 0.5, dt)

        def make_body(fn=fn, base=base, dt=dt):
            def body(c, _):
                out = fn(base + c.astype(dt))
                return (jnp.mean(out.astype(jnp.float32)) * 1e-6
                        + c + 1e-3).astype(jnp.float32), ()
            return body

        c0s = [jnp.asarray(i * 1e-4, jnp.float32) for i in range(4)]
        per = _per_iter(make_body, c0s, short=8, long=40)
        total += per
        rate = gf / per / 1e3 if gf else 0.0
        print(f"int8-static {name:14s}: {per*1e3:6.3f} ms  "
              f"{gf:7.1f} GFLOP  {rate:6.1f} T/s", flush=True)
    print(f"int8-static stage sum: {total*1e3:.2f} ms "
          f"(whole-trunk measured 9.99)", flush=True)


def probe_block_stream(bi: int = 1):
    """Per-block int8-stream timing for block `bi` in isolation.

    The GLOBAL int8 stream measured negative (10.57 vs 9.99), but the
    byte savings concentrate where spatial maps are large: block1's
    stream elementwise moves ~1.2 GB/step (56^2 maps), blocks 3-4 move
    ~1/8 of that and only pay the extra round/clip VPU work. This times
    one block both ways to decide a per-block stream split.
    """
    from human_dynamics_tpu.models.resnet import ResNetV2_50
    from human_dynamics_tpu.models.resnet_int8 import (
        BLOCKS, _conv_s8, calibrate_int8_scales, prepare_int8_params,
    )

    B = 160
    model = ResNetV2_50()
    images = jnp.asarray(rng.randn(B, 224, 224, 3) * 0.5, jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), images[:1])
    qp = jax.jit(prepare_int8_params)(variables)
    scales = jax.jit(
        lambda im: calibrate_int8_scales(qp, im))(images[:16])
    jax.block_until_ready(scales)

    h_in = {1: 56, 2: 28, 3: 14, 4: 7}[bi]
    d_in = {1: 64, 2: 256, 3: 512, 4: 1024}[bi]
    num_units, depth, _db = BLOCKS[bi - 1]

    def run_stream(xq, s_stream):
        x = xq
        depth_in = d_in
        for ui in range(1, num_units + 1):
            stride = 2 if (ui == num_units and bi != 4) else 1
            pre = f"block{bi}/unit_{ui}/bottleneck_v2/"
            s_p = scales[pre + "preact"]
            pq = jnp.clip(jnp.round(jnp.maximum(
                x.astype(jnp.float32)
                * (s_stream * qp[pre + "preact/A"] / s_p)
                + qp[pre + "preact/B"] / s_p, 0)), 0, 127,
            ).astype(jnp.int8)
            if depth == depth_in:
                sc = (x if stride == 1 else x[:, ::2, ::2, :],
                      s_stream)
            else:
                y = _conv_s8(pq, qp[pre + "shortcut/wq"], stride)
                sc = (y, s_p * qp[pre + "shortcut/scale"],
                      qp[pre + "shortcut/bias"])
            y = _conv_s8(pq, qp[pre + "conv1/wq"], 1)
            s_h = scales[pre + "conv1"]
            y = jnp.clip(jnp.round(jnp.maximum(
                y.astype(jnp.float32)
                * (s_p * qp[pre + "conv1/scale"] / s_h)
                + qp[pre + "conv1/bias"] / s_h, 0)), 0, 127,
            ).astype(jnp.int8)
            y = _conv_s8(y, qp[pre + "conv2/wq"], stride)
            s_h2 = scales[pre + "conv2"]
            y = jnp.clip(jnp.round(jnp.maximum(
                y.astype(jnp.float32)
                * (s_h * qp[pre + "conv2/scale"] / s_h2)
                + qp[pre + "conv2/bias"] / s_h2, 0)), 0, 127,
            ).astype(jnp.int8)
            y = _conv_s8(y, qp[pre + "conv3/wq"], 1)
            s_out = scales[pre + "out"]
            res = y.astype(jnp.float32) * (
                s_h2 * qp[pre + "conv3/scale"] / s_out
            ) + qp[pre + "conv3/bias"] / s_out
            if len(sc) == 2:
                res = res + sc[0].astype(jnp.float32) * (
                    sc[1] / s_out)
            else:
                res = res + (sc[0].astype(jnp.float32) * (
                    sc[1] / s_out) + sc[2] / s_out)
            x = jnp.clip(jnp.round(res), -127, 127).astype(jnp.int8)
            s_stream = s_out
            depth_in = depth
        return x

    base = jnp.asarray(
        rng.randint(-100, 100, (B, h_in, h_in, d_in)), jnp.int8)
    s0 = scales[
        "root/out" if bi == 1
        else f"block{bi-1}/unit_{BLOCKS[bi-2][0]}/bottleneck_v2/out"]

    def make_body():
        def body(c, _):
            # data-dependent input (one cheap pass over the int8 map);
            # same scalar-carry chaining as the int8_stages baseline.
            xin = jnp.clip(
                base.astype(jnp.int32)
                + jnp.round(c).astype(jnp.int32), -127, 127
            ).astype(jnp.int8)
            out = run_stream(xin, s0)
            return (jnp.mean(out.astype(jnp.float32)) * 1e-6
                    + c + 1e-3).astype(jnp.float32), ()
        return body

    c0s = [jnp.asarray(i * 1e-4, jnp.float32) for i in range(4)]
    per = _per_iter(make_body, c0s, short=8, long=40)
    print(f"block{bi} int8-STREAM: {per*1e3:.3f} ms "
          f"(bf16-stream baseline from int8_stages)", flush=True)


def probe_root_train():
    """Training-geometry root probe: fwd+wgrad of the bf16 root conv in
    the 7x7/2 form vs the exact s2d-folded 4x4/1 form (B=160 images =
    B8 T20 image-mode). The image-step decomposition charges root wgrad
    ~1.8 ms at 14.6 T/s (Cin=3 is the worst wgrad geometry in the
    trunk); the s2d form contracts over Cin*K*K=192 with no stride.
    Grad flows through the scatter-built folded weights, so the probe
    matches what a differentiable s2d root module would cost. relu
    wraps the conv so XLA cannot hoist a constant gradient out of the
    timing scan (docs/perf_image_training.md gotcha).
    """
    B = 160
    w0 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    images = jnp.asarray(rng.randn(B, 224, 224, 3) * 0.5, jnp.float32)

    def s2d_weights(w):
        w2 = jnp.zeros((4, 4, 12, 64), w.dtype)
        for ky in range(7):
            dy = (ky - 3) % 2
            ay = (ky - 3 - dy) // 2 + 2
            for kx in range(7):
                dx = (kx - 3) % 2
                ax = (kx - 3 - dx) // 2 + 2
                c2 = (dy * 2 + dx) * 3
                w2 = w2.at[ay, ax, c2:c2 + 3, :].set(w[ky, kx])
        return w2

    def s2d(x):
        b, h, wd, c = x.shape
        x = x.reshape(b, h // 2, 2, wd // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // 2, wd // 2, 4 * c)

    def loss_base(w, x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
            ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(jnp.maximum(y, 0))

    def loss_s2d(w, x):
        y = jax.lax.conv_general_dilated(
            s2d(x.astype(jnp.bfloat16)),
            s2d_weights(w).astype(jnp.bfloat16),
            (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(jnp.maximum(y, 0))

    for tag, loss in (("7x7/2", loss_base), ("s2d 4x4/1", loss_s2d)):
        def make_body(loss=loss):
            def body(c, _):
                g = jax.grad(loss)(w0 + c, images)
                return (jnp.mean(g) * 1e-6 + c + 1e-3).astype(
                    jnp.float32), ()
            return body

        c0s = [jnp.asarray(i * 1e-4, jnp.float32) for i in range(4)]
        per = _per_iter(make_body, c0s, short=8, long=40)
        # 2 passes (fwd + wgrad; no dgrad — x is not differentiated),
        # 2.36e8 FLOPs per image per pass in either geometry.
        flops = 2 * 2.36e8 * B
        print(f"root fwd+wgrad {tag}: {per*1e3:.3f} ms "
              f"({flops/per/1e12:.1f} T/s)", flush=True)


def probe_root_variants():
    """Root-stem variants: the int8_stages probe charges root+pool
    1.85 ms at 20.4 T/s (Cin=3 7x7/2 is the worst MXU geometry in the
    trunk). Space-to-depth with the STRIDE FOLDED IN is exact: 7x7/2 on
    224^2x3 == 4x4/1 on 112^2x12 with rearranged (zero-padded 1/16)
    weights, done once at weight-prep — contraction 147 -> 192 and no
    stride. Variants: bf16 s2d, int8 s2d (images are natively 8-bit so
    a fixed 1/127 scale is lossless-grade), int8 s2d + int8 maxpool
    (max commutes with monotone quantization, halving pool traffic).
    """
    B = 160
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(64) * 0.01, jnp.float32)
    images = jnp.asarray(rng.randn(B, 224, 224, 3) * 0.5, jnp.float32)

    def s2d_weights(w):
        w2 = jnp.zeros((4, 4, 12, 64), w.dtype)
        for ky in range(7):
            dy = (ky - 3) % 2
            ay = (ky - 3 - dy) // 2 + 2
            for kx in range(7):
                dx = (kx - 3) % 2
                ax = (kx - 3 - dx) // 2 + 2
                c2 = (dy * 2 + dx) * 3
                w2 = w2.at[ay, ax, c2:c2 + 3, :].set(w[ky, kx])
        return w2

    w2 = s2d_weights(w)

    def s2d(x):
        b, h, wd, c = x.shape
        x = x.reshape(b, h // 2, 2, wd // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // 2, wd // 2, 4 * c)

    def pool_bf16(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            "SAME")

    def v0_base(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
            ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return pool_bf16(y)

    def v1_s2d_bf16(x):
        y = jax.lax.conv_general_dilated(
            s2d(x.astype(jnp.bfloat16)), w2.astype(jnp.bfloat16),
            (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return pool_bf16(y)

    s_img = 1.0 / 127.0
    s_w2 = jnp.max(jnp.abs(w2), axis=(0, 1, 2)) / 127.0 + 1e-12
    w2q = jnp.clip(jnp.round(w2 / s_w2), -127, 127).astype(jnp.int8)

    def int8_conv(x):
        xq = jnp.clip(jnp.round(s2d(x) / s_img), -127, 127).astype(
            jnp.int8)
        return jax.lax.conv_general_dilated(
            xq, w2q, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def v2_s2d_int8(x):
        y = (int8_conv(x).astype(jnp.float32) * (s_img * s_w2)
             + bias).astype(jnp.bfloat16)
        return pool_bf16(y)

    # per-channel scales break max-commutation ACROSS channels, but
    # maxpool pools each channel independently, so per-channel int8
    # maxpool remains exact; relu-free root keeps negatives -> -127 lo.
    s_root = 8.0 / 127.0  # static headline scale for the pooled stream
    def v3_s2d_int8_pool(x):
        y = int8_conv(x)
        yq = jnp.clip(jnp.round(
            y.astype(jnp.float32) * (s_img * s_w2 / s_root)
            + bias / s_root), -127, 127).astype(jnp.int8)
        p = jax.lax.reduce_window(
            yq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), "SAME")
        return p.astype(jnp.bfloat16) * jnp.bfloat16(s_root)

    # Width-only fold: the input view is a PURE RESHAPE in NHWC (no
    # transpose pass) — built to recover the s2d stem win inside the
    # fused whole-clip program, where v3's s2d transpose measured as an
    # extra unfused HBM pass (CLAUDE.md round-3 ledger).
    def wfold_weights(w):
        w2 = jnp.zeros((7, 4, 6, 64), w.dtype)
        for kx in range(7):
            a, p = (kx + 1) // 2, (kx + 1) % 2
            w2 = w2.at[:, a, p * 3:(p + 1) * 3, :].set(w[:, kx])
        return w2

    wf = wfold_weights(w)
    s_wf = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0 + 1e-12
    wfq = jnp.clip(jnp.round(wf / s_wf), -127, 127).astype(jnp.int8)

    def wfold(x):
        b, h, wd, c = x.shape
        return x.reshape(b, h, wd // 2, 2 * c)

    def int8_conv_wf(x):
        xq = jnp.clip(jnp.round(x / s_img), -127, 127).astype(jnp.int8)
        return jax.lax.conv_general_dilated(
            wfold(xq), wfq, (2, 1), ((3, 3), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def v4_wfold_int8_pool(x):
        y = int8_conv_wf(x)
        yq = jnp.clip(jnp.round(
            y.astype(jnp.float32) * (s_img * s_wf / s_root)
            + bias / s_root), -127, 127).astype(jnp.int8)
        p = jax.lax.reduce_window(
            yq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), "SAME")
        return p.astype(jnp.bfloat16) * jnp.bfloat16(s_root)

    variants = [("v0 7x7/2 bf16 (base)", v0_base),
                ("v1 s2d4x4 bf16", v1_s2d_bf16),
                ("v2 s2d4x4 int8", v2_s2d_int8),
                ("v3 s2d4x4 int8+int8pool", v3_s2d_int8_pool),
                ("v4 wfold7x4 int8+int8pool", v4_wfold_int8_pool)]

    ref = None
    for name, fn in variants:
        out = np.asarray(jax.jit(fn)(images[:2]), np.float32)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        print(f"root {name}: max|diff vs v0| = {err:.4f}", flush=True)

    for name, fn in variants:
        def make_body(fn=fn):
            def body(c, _):
                out = fn(images + c)
                return (jnp.mean(out.astype(jnp.float32)) * 1e-6
                        + c + 1e-3).astype(jnp.float32), ()
            return body

        c0s = [jnp.asarray(i * 1e-4, jnp.float32) for i in range(4)]
        per = _per_iter(make_body, c0s, short=8, long=40)
        print(f"root {name}: {per*1e3:.3f} ms", flush=True)


def probe_conv_bwd():
    """Per-geometry conv fwd vs input-grad vs filter-grad (bf16, B=160).

    The unfrozen image-mode train step is resnet-backward-bound
    (CLAUDE.md: minimal fwd+bwd+Adam 54.8 ms vs ~21 ms ideal 2x-fwd).
    This isolates which conv/mode pair eats the excess: stride-2
    input-grads become lhs-dilated convs, filter-grads become
    big-spatial-reduction convs — both notorious XLA TPU weak spots.
    """
    B = 160
    geoms = [
        # (name, h_in, cin, cout, k, stride)
        ("root7x7/2", 224, 3, 64, 7, 2),
        ("b1 3x3", 56, 64, 64, 3, 1),
        ("b1 1x1 up", 56, 64, 256, 1, 1),
        ("b2 3x3", 28, 128, 128, 3, 1),
        ("b2 3x3/2", 56, 128, 128, 3, 2),
        ("b3 3x3", 14, 256, 256, 3, 1),
        ("b3 3x3/2", 28, 256, 256, 3, 2),
        ("b4 3x3", 7, 512, 512, 3, 1),
        ("b4 1x1 in", 7, 2048, 512, 1, 1),
    ]
    for name, h, cin, cout, k, stride in geoms:
        w0 = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)
        x0s = [jnp.asarray(rng.randn(B, h, h, cin) * 0.5, jnp.bfloat16)
               for _ in range(3)]

        def conv(x, w):
            if stride == 1:
                pad = "SAME"
            else:
                beg = (k - 1) // 2
                pad = ((beg, k - 1 - beg), (beg, k - 1 - beg))
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        h_out = h // stride
        fl = 2 * B * h_out * h_out * cin * cout * k * k

        def make_fwd():
            def body(x, _):
                y = conv(x, w0)
                # Data-dependent next input, same shape as x.
                nxt = (x + jnp.mean(y) * 1e-6).astype(jnp.bfloat16)
                return nxt, ()
            return body

        def make_dgrad():
            # relu makes the cotangent data-dependent — the gradient of
            # a LINEAR conv is constant in x, and XLA hoists it out of
            # the timing scan entirely (first attempt measured 2500+
            # "T/s" on exactly those entries).
            def body(x, _):
                g = jax.grad(
                    lambda xx: jnp.sum(
                        jax.nn.relu(conv(xx, w0)).astype(jnp.float32)
                    )
                )(x)
                nxt = (x + g * 1e-6).astype(jnp.bfloat16)
                return nxt, ()
            return body

        def make_wgrad():
            x_fix = x0s[0]

            def body(w, _):
                g = jax.grad(
                    lambda ww: jnp.sum(
                        jax.nn.relu(conv(x_fix, ww)).astype(
                            jnp.float32))
                )(w)
                nxt = (w + g * 1e-9).astype(jnp.bfloat16)
                return nxt, ()
            return body

        short = int(os.environ.get("PROBE_SHORT", "16"))
        long_ = int(os.environ.get("PROBE_LONG", "96"))
        t_f = _per_iter(make_fwd, x0s, short=short, long=long_)
        t_d = _per_iter(make_dgrad, x0s, short=short, long=long_)
        t_w = _per_iter(
            make_wgrad,
            [w0 + i * 1e-4 for i in range(3)], short=short, long=long_,
        )
        print(
            f"{name:12s} fwd {t_f*1e3:7.3f} ms ({fl/t_f/1e12:5.1f} T/s)"
            f"  dgrad {t_d*1e3:7.3f} ({fl/t_d/1e12:5.1f})"
            f"  wgrad {t_w*1e3:7.3f} ({fl/t_w/1e12:5.1f})",
            flush=True,
        )


def probe_wfold_block1():
    """Does width-folding block1 fix its 47 T/s? MEASURED: no — block1
    is HBM-bound, not lane-bound.

    Hypothesis was: block1's C=64 convs half-fill the 128-lane MXU on
    the OUTPUT side (the int8-stream negative ruled out stream HBM), so
    merging width pairs into channels — (56,56,64) -> (56,28,128), the
    same free NHWC reshape as the wfold root — doubles lane fill at
    the cost of 2x nominal FLOPs (the folded kernels are 50%
    structural zeros: each output phase reads only its own 9 taps).

    v5e results (B=160, int8, paired cin->cout->cin chains, useful
    FLOPs): conv2 3x3 64ch 169 -> 187 T/s folded (+10%); conv1-pair
    1x1 256<->64 39 -> 43 T/s (+8%); conv3-pair 1x1 64<->256 117 ->
    143 T/s (+23%). Every fold helps a little, but the block's
    dominant cost — the 1x1 pair touching the 256-channel stream at
    56x56 (128 MB/read at B=160) — runs at ~320 MB / 0.84 ms ≈ 380
    GB/s: it is BANDWIDTH-bound, and folding moves zero bytes. Ceiling
    analysis: folding all of block1 would save ~0.35 ms of the 10 ms
    trunk (~1% e2e before the usual whole-program scheduling erosion)
    — not worth the weight-layout complexity. Together with the
    int8-root/stream family this closes the encoder-geometry search:
    root fixed (wfold/u8), block1 at its HBM roofline, blocks 2-4 at
    139-274 T/s.
    """
    B = 160
    cases = [
        # (name, h, w, cin, cout, k)          folded doubles cin/cout
        ("conv2 3x3  64->64 ", 56, 56, 64, 64, 3),
        ("conv1 1x1 256->64 ", 56, 56, 256, 64, 1),
        ("conv3 1x1  64->256", 56, 56, 64, 256, 1),
    ]
    for name, h, w, cin, cout, k in cases:
        # cin != cout: chain a cout->cin conv back so the scan carry
        # keeps its shape; FLOPs count both directions.
        useful = 2 * 2 * B * h * w * cin * cout * k * k
        for fold in (1, 2):
            wf, cif, cof = w // fold, cin * fold, cout * fold
            wk = jnp.asarray(
                rng.randint(-127, 127, (k, k, cif, cof), "int8"))
            wk2 = jnp.asarray(
                rng.randint(-127, 127, (k, k, cof, cif), "int8"))

            def make_body(wk=wk, wk2=wk2):
                def conv(x, kern):
                    return jax.lax.conv_general_dilated(
                        x, kern, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)

                def body(x, _):
                    y = jnp.clip(conv(x, wk) >> 10, -127, 127).astype(
                        jnp.int8)
                    z = jnp.clip(conv(y, wk2) >> 10, -127, 127).astype(
                        jnp.int8)
                    return z, ()
                return body

            c0s = [jnp.asarray(
                rng.randint(-127, 127, (B, h, wf, cif), "int8"))
                for _ in range(4)]
            per = _per_iter(make_body, c0s, short=16, long=80)
            tag = "folded  " if fold == 2 else "unfolded"
            print(f"block1 {name} {tag}: {per*1e3:6.3f} ms  "
                  f"{useful/per/1e12:6.1f} T/s useful"
                  + (f"  ({2*useful/per/1e12:.1f} T/s raw)"
                     if fold == 2 else ""), flush=True)


def probe_tail():
    """Attribute the predictor's non-encoder tail (phi -> outputs).

    The bench e2e clip (480 frames, int8-static encoder) spends
    ~26 ms in the trunk and ~7 ms in the window tail. Components,
    bench config (bf16_temporal + Pallas fused SMPL, count bucketed
    to 8 groups = 64 windows of T=20, g=8 kept frames):

      tail_full     — _predict_window_groups exactly as the fused
                      program runs it (in-jit tree_bf16 recast of the
                      temporal/IEF weights every call)
      tail_precast  — same, but the variables passed in are ALREADY
                      bf16, so the in-body recast is an elided no-op:
                      isolates the per-call weight-recast HBM cost
      model_only    — HmmrModel.apply on the gathered (64, 20, 2048)
                      bf16 windows (temporal conv + IEF heads)
      smpl_only     — fused-Pallas compute_smpl on the stacked
                      (3 heads, 512, 8, 85) omegas
    """
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer import HmmrPredictor
    from human_dynamics_tpu.infer.window import WindowSchedule
    from human_dynamics_tpu.models import HmmrModel
    from human_dynamics_tpu.models.omega import compute_smpl, split_omega
    from human_dynamics_tpu.utils.precision import tree_bf16

    n, b, t = 480, 8, 20
    model = HmmrModel(include_resnet=False)
    smpl = synthetic_smpl_model(num_verts=6890, num_kps=25)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t, 2048))
    )
    pred = HmmrPredictor(
        model, variables, smpl, batch_size=b, seq_length=t,
        use_fused_smpl=True, bf16_temporal=True,
    )
    sched = WindowSchedule(
        num_frames=n, batch_size=b, seq_length=t, fov=model.fov
    )
    count = 8   # _bucket(sched.count) for 480 frames
    extra = (count - sched.count) * b * sched.good_frames
    plen = sched.margin + n + sched.num_fill + extra
    ids = jnp.arange(count)
    eps = jnp.float32(1e-24)

    def scan_time(make_body, c0s, short=8, long=40):
        """In-jit chained scan with the variables as a traced arg.

        Warms on c0s[0], times c0s[1:] (distinct carries defeat the
        runtime's repeated-dispatch result cache).
        """
        def run(vs, length):
            f = jax.jit(
                lambda v, c: jax.lax.scan(
                    make_body(v), c, None, length=length)[0],
                static_argnums=(),
            )
            jax.block_until_ready(f(vs, c0s[0]))
            best = float("inf")
            for c in c0s[1:]:
                t0 = time.perf_counter()
                jax.block_until_ready(f(vs, c))
                best = min(best, time.perf_counter() - t0)
            return best

        return lambda vs: (
            (run(vs, long) - run(vs, short)) / (long - short)
        )

    phi0s = [
        jnp.asarray(rng.randn(plen, 2048), jnp.float32) * 0.1
        for _ in range(4)
    ]

    def make_full(vs):
        def body(c, _):
            out = pred._predict_window_groups(vs, c, ids)
            s = sum(jnp.sum(v) for v in out.values())
            return c + eps * s, ()
        return body

    for name, vs in (
        ("tail_full   ", variables),
        ("tail_precast", tree_bf16(variables)),
    ):
        per = scan_time(make_full, phi0s)(vs)
        print(f"{name}: {per*1e3:7.3f} ms/clip-tail", flush=True)

    # Model-only: temporal conv encoder + IEF heads on the windows.
    win0s = [
        jnp.asarray(rng.randn(count * b, t, 2048), jnp.bfloat16) * 0.1
        for _ in range(4)
    ]
    bvars = tree_bf16(variables)

    def make_model(vs):
        def body(c, _):
            out = model.apply(vs, c, train=False)
            s = (jnp.sum(out.omega_pred)
                 + sum(jnp.sum(v) for v in out.omegas_delta.values()))
            return c + s.astype(c.dtype) * jnp.bfloat16(1e-8), ()
        return body

    per = scan_time(make_model, win0s)(bvars)
    print(f"model_only  : {per*1e3:7.3f} ms", flush=True)

    # SMPL-only: stacked decode of all heads' kept frames.
    g = sched.good_frames
    om0s = [
        jnp.asarray(rng.randn(3, count * b, g, 85), jnp.float32) * 0.1
        for _ in range(4)
    ]

    def make_smpl(vs):
        del vs

        def body(c, _):
            cams = jnp.broadcast_to(
                split_omega(c[0])[0][None], c.shape[:-1] + (3,)
            )
            sm = compute_smpl(
                smpl, c, use_optcam=False, cams_override=cams,
                fused=True,
            )
            s = jnp.sum(sm.verts) + jnp.sum(sm.kps) + jnp.sum(sm.joints)
            return c + eps * s, ()
        return body

    per = scan_time(make_smpl, om0s)(jnp.zeros(()))
    print(f"smpl_only   : {per*1e3:7.3f} ms", flush=True)


def probe_e2e(uint8: bool = False):
    """Device-limited e2e clip time: the WHOLE fused predict program
    (bench config: int8-static encoder + bf16 tail + fused SMPL)
    chained inside one lax.scan, two lengths differenced.

    This removes everything the tunnel adds per dispatch (handle
    marshalling, host round trips) and is therefore the number a local
    PCIe/ICI deployment would see. The fp32 carry update
    (frames + eps*s) adds ~0.6 ms/iter of HBM copy the real program
    doesn't have — the result is slightly pessimistic.
    """
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer import HmmrPredictor
    from human_dynamics_tpu.infer.predictor import _bucket
    from human_dynamics_tpu.infer.window import WindowSchedule
    from human_dynamics_tpu.models import HmmrModel

    n = 480
    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=6890, num_kps=25)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 224, 224, 3))
    )
    calib = jnp.asarray(
        rng.uniform(-1, 1, (32, 224, 224, 3)), jnp.float32
    )
    pred = HmmrPredictor(
        model, variables, smpl, batch_size=8, seq_length=20,
        use_fused_smpl=True, bf16_temporal=True,
        int8_encoder=True, int8_calibration=calib,
    )
    sched = WindowSchedule(
        num_frames=n, batch_size=8, seq_length=20, fov=model.fov
    )
    count = _bucket(sched.count)
    chunk = pred.encode_chunk
    n_pad = _bucket(int(np.ceil(n / chunk))) * chunk
    raw = type(pred)._predict_fused.__wrapped__
    eps = jnp.float32(1e-24)

    def make_body(arrs):
        vs, qp = arrs

        def body(c, _):
            out = raw(pred, vs, qp, c, n, count, True)
            s = sum(jnp.sum(v) for v in out.values())
            if c.dtype == jnp.uint8:
                return c ^ (s * 1e6).astype(jnp.int32).astype(
                    jnp.uint8), ()
            return c + eps * s, ()
        return body

    dt = jnp.uint8 if uint8 else jnp.float32
    c0s = [
        (jnp.asarray(
            rng.randint(0, 255, (n_pad, 224, 224, 3)), jnp.uint8)
         if uint8 else
         jnp.asarray(
             rng.uniform(-1, 1, (n_pad, 224, 224, 3)), jnp.float32))
        for _ in range(3)
    ]

    def run(length):
        f = jax.jit(
            lambda a, c: jax.lax.scan(
                make_body(a), c, None, length=length)[0]
        )
        arrs = (pred._fused_vars, pred._int8_qp)
        jax.block_until_ready(f(arrs, c0s[0]))
        best = float("inf")
        for c in c0s[1:]:
            t0 = time.perf_counter()
            jax.block_until_ready(f(arrs, c))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(16) - run(4)) / 12
    print(f"e2e chained ({dt.__name__}): {per*1e3:7.3f} ms/clip = "
          f"{n/per:,.0f} frames/s device-limited", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    {
        "matmul": probe_matmul,
        "convs": probe_convs,
        "resnet": lambda: probe_resnet(False),
        "resnet_int8": lambda: probe_resnet(True),
        "resnet_int8_static": lambda: probe_resnet(True, static=True),
        "resnet_int8_pallas": lambda: probe_resnet(
            True, static=True, use_pallas=True),
        "resnet_int8_stream": lambda: probe_resnet(
            True, static=True, int8_stream=True),
        "resnet_int8_root": lambda: probe_resnet(
            True, static=True, int8_root=True),
        "resnet_int8_root_wfold": lambda: probe_resnet(
            True, static=True, int8_root="wfold"),
        "resnet_int8_root_s1": lambda: probe_resnet(
            True, static=True, int8_root=True, int8_stream=(1,)),
        "resnet_int8_root_s12": lambda: probe_resnet(
            True, static=True, int8_root=True, int8_stream=(1, 2)),
        "int8_stages": probe_int8_stages,
        "root_variants": probe_root_variants,
        "root_train": probe_root_train,
        "block_stream": lambda: probe_block_stream(
            int(os.environ.get("STREAM_BLOCK", "1"))),
        "conv_bwd": probe_conv_bwd,
        "wfold_block1": probe_wfold_block1,
        "tail": probe_tail,
        "e2e": probe_e2e,
        "e2e_u8": lambda: probe_e2e(uint8=True),
    }[which]()
