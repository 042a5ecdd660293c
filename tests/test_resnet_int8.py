"""Int8 quantized resnet path (models/resnet_int8.py): numeric
fidelity vs the fp32 trunk, structural exactness of the BN fold, and
end-to-end predictor integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.models.resnet import ResNetV2_50
from human_dynamics_tpu.models.resnet_int8 import (
    apply_int8,
    prepare_int8_params,
)

RNG = np.random.RandomState(5)


@pytest.fixture(scope="module")
def trunk():
    model = ResNetV2_50()
    x = jnp.asarray(RNG.randn(2, 64, 64, 3).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), x)
    # Non-trivial BN stats so the fold is actually exercised.
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    stats = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            RNG.uniform(0.01, 0.2, v.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables, x


def test_int8_phi_close_to_fp32(trunk):
    model, variables, x = trunk
    want = np.asarray(model.apply(variables, x, train=False))
    qp = prepare_int8_params(variables)
    got = np.asarray(apply_int8(qp, x))
    assert got.shape == want.shape == (2, 2048)
    # Quantization error bound: per-tensor dynamic activations +
    # per-channel weights across 16 units. Cosine similarity is the
    # meaningful metric for a feature vector feeding an IEF regressor.
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1)
    )
    assert np.all(cos > 0.98), cos
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.2, rel


def test_prepare_folds_bn_exactly(trunk):
    """A,B must satisfy BN(y) == y*A + B for the stored stats."""
    _, variables, _ = trunk
    qp = prepare_int8_params(variables)
    name = "block1/unit_1/bottleneck_v2"
    p = variables["params"][name]["preact"]
    st = variables["batch_stats"][name]["preact"]
    y = RNG.randn(7, p["gamma"].shape[0]).astype(np.float32)
    inv = p["gamma"] / np.sqrt(st["moving_variance"] + 1e-5)
    want = (y - st["moving_mean"]) * inv + p["beta"]
    got = y * qp[name + "/preact/A"] + qp[name + "/preact/B"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_weight_quant_roundtrip(trunk):
    """Dequantized weights are within half a quantization step."""
    _, variables, _ = trunk
    qp = prepare_int8_params(variables)
    name = "block2/unit_1/bottleneck_v2"
    w = np.asarray(variables["params"][name]["conv3"]["kernel"])
    wq = np.asarray(qp[name + "/conv3/wq"], np.float32)
    s = np.asarray(qp[name + "/conv3/scale"])
    np.testing.assert_allclose(
        wq * s, w, atol=float(np.max(s)) * 0.51
    )
    assert np.abs(wq).max() <= 127


def test_predictor_int8_end_to_end():
    """int8_encoder=True runs the fused predict path and lands near the
    fp32 result on a tiny image-mode model."""
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer import HmmrPredictor
    from human_dynamics_tpu.models import HmmrModel

    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    images = jnp.asarray(
        RNG.rand(25, 64, 64, 3).astype(np.float32) * 2 - 1
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    kw = dict(batch_size=2, seq_length=20, encode_chunk=16)
    base = HmmrPredictor(model, variables, smpl, **kw)
    # Enabling int8 must warn at runtime that it is a memory (not
    # speed) knob on v5e — the measured-slower caveat lives in code,
    # not just a comment.
    with pytest.warns(RuntimeWarning, match="SLOWER"):
        fast = HmmrPredictor(
            model, variables, smpl, int8_encoder=True, **kw
        )
    want = base.predict_all_images(images)
    got = fast.predict_all_images(images)
    assert set(got) == set(want)
    assert got["omegas"].shape == want["omegas"].shape
    # Same pipeline downstream; omegas differ only by encoder quant.
    assert np.isfinite(got["omegas"]).all()
    diff = np.abs(got["omegas"] - want["omegas"]).max()
    assert diff < 0.5, diff


def test_static_scale_path_matches_dynamic(trunk):
    """Calibrate-then-static must track the dynamic path closely (same
    quant grid when the calibration batch IS the inference batch) and
    stay near fp32."""
    from human_dynamics_tpu.models.resnet_int8 import (
        apply_int8_static, calibrate_int8_scales, merge_calibrations,
    )

    model, variables, x = trunk
    qp = prepare_int8_params(variables)
    scales = calibrate_int8_scales(qp, x)
    # preact/conv1/conv2 per unit + stream scales (root/out, unit outs)
    assert len(scales) == 16 * 3 + 1 + 16

    got = np.asarray(apply_int8_static(qp, scales, x))
    dyn = np.asarray(apply_int8(qp, x))
    want = np.asarray(model.apply(variables, x, train=False))
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1)
    )
    assert np.all(cos > 0.98), cos
    rel = np.linalg.norm(got - dyn) / np.linalg.norm(dyn)
    assert rel < 0.1, rel

    # Margin scales every entry; merge takes the elementwise max.
    s2 = calibrate_int8_scales(qp, x, margin=2.0)
    merged = merge_calibrations(scales, s2)
    k = next(iter(scales))
    np.testing.assert_allclose(
        np.asarray(merged[k]), np.asarray(s2[k])
    )
    got2 = np.asarray(apply_int8_static(qp, merged, x))
    assert np.isfinite(got2).all()


def test_predictor_int8_static_end_to_end():
    """int8_encoder + calibration batch: the static-scale fused path
    runs end-to-end and tracks the dynamic path."""
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer import HmmrPredictor
    from human_dynamics_tpu.models import HmmrModel
    import warnings

    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    images = np.asarray(
        RNG.rand(25, 64, 64, 3).astype(np.float32) * 2 - 1
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    kw = dict(batch_size=2, seq_length=20, encode_chunk=16)
    with warnings.catch_warnings():
        # Calibrated static mode must NOT raise the slower-path warning.
        warnings.simplefilter("error", RuntimeWarning)
        static = HmmrPredictor(
            model, variables, smpl, int8_encoder=True,
            int8_calibration=images[:8], **kw
        )
    with pytest.warns(RuntimeWarning, match="dynamic"):
        dyn = HmmrPredictor(
            model, variables, smpl, int8_encoder=True, **kw
        )
    root = HmmrPredictor(
        model, variables, smpl, int8_encoder=True,
        int8_calibration=images[:8], int8_root=True, **kw
    )
    with pytest.raises(ValueError, match="int8_calibration"):
        HmmrPredictor(
            model, variables, smpl, int8_encoder=True,
            int8_root=True, **kw
        )
    got = static.predict_all_images(images)
    want = dyn.predict_all_images(images)
    got_root = root.predict_all_images(images)
    assert set(got) == set(want)
    assert np.isfinite(got["omegas"]).all()
    diff = np.abs(got["omegas"] - want["omegas"]).max()
    assert diff < 0.5, diff
    assert np.isfinite(got_root["omegas"]).all()
    diff = np.abs(got_root["omegas"] - got["omegas"]).max()
    assert diff < 0.5, diff
    # Byte-direct root: raw uint8 frames and their normalized-float
    # equivalents run the same exact 255-grid math (only the clip's
    # zero padding differs between ingestion dtypes).
    u8 = HmmrPredictor(
        model, variables, smpl, int8_encoder=True,
        int8_calibration=images[:8], int8_root="u8", **kw
    )
    frames_u8 = np.clip(
        np.round((images + 1.0) * 127.5), 0, 255
    ).astype(np.uint8)
    got_u8 = u8.predict_all_images(frames_u8)
    got_u8f = u8.predict_all_images(
        frames_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    )
    assert np.isfinite(got_u8["omegas"]).all()
    diff = np.abs(got_u8["omegas"] - got["omegas"]).max()
    assert diff < 0.5, diff
    np.testing.assert_allclose(
        got_u8["omegas"], got_u8f["omegas"], atol=1e-4
    )


def test_pallas_fused_units_match_static_xla(trunk):
    """use_pallas=True (fused bottleneck-unit kernels, interpret mode on
    CPU) tracks the XLA static path: same quant grid, preact computed in
    f32 instead of bf16, so results agree to quantization-step level."""
    from human_dynamics_tpu.models.resnet_int8 import (
        apply_int8_static, calibrate_int8_scales,
    )

    model, variables, x = trunk
    qp = prepare_int8_params(variables)
    scales = calibrate_int8_scales(qp, x)
    want = np.asarray(apply_int8_static(qp, scales, x))
    got = np.asarray(apply_int8_static(qp, scales, x, use_pallas=True))
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1)
    )
    assert np.all(cos > 0.995), cos
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, rel


def test_pallas_unit_matches_dense_oracle():
    """One fused unit (identity + projection variants) vs a dense
    jnp oracle of the same quantized math — validates the planar 3x3
    decomposition (shifts, masks, H-edge zero pads) exactly."""
    from human_dynamics_tpu.ops.resnet_int8_pallas import (
        fused_bottleneck_unit,
    )

    rng = np.random.RandomState(3)
    n, h, w, cin, cb, cout = 2, 6, 5, 16, 8, 16

    def mk(shape, scale=1.0):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    def mki8(shape):
        return jnp.asarray(
            rng.randint(-127, 128, shape).astype(np.int8)
        )

    w2_taps = mki8((3, 3, cb, cb))
    params = {
        "pA": jnp.abs(mk((1, cin))) + 0.5,
        "pB": mk((1, cin), 0.3),
        "w1": mki8((cin, cb)),
        "q1m": jnp.abs(mk((1, cb), 1e-3)) + 1e-4,
        "q1a": mk((1, cb), 0.3),
        "w2": w2_taps.reshape(9 * cb, cb),
        "q2m": jnp.abs(mk((1, cb), 1e-4)) + 1e-5,
        "q2a": mk((1, cb), 0.3),
        "w3": mki8((cb, cout)),
        "d3m": jnp.abs(mk((1, cout), 1e-4)) + 1e-5,
        "d3a": mk((1, cout), 0.1),
    }
    x = mk((n, h, w, cin), 0.5).astype(jnp.bfloat16)

    def oracle(x, params, has_shortcut):
        xf = x.astype(jnp.float32)
        pq = jnp.clip(jnp.round(jnp.maximum(
            xf * params["pA"][0] + params["pB"][0], 0)), 0, 127
        ).astype(jnp.int8)
        h1 = jax.lax.dot_general(
            pq.reshape(-1, cin), params["w1"],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(n, h, w, cb)
        h1q = jnp.clip(jnp.round(
            h1.astype(jnp.float32) * params["q1m"][0]
            + params["q1a"][0]), 0, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            h1q, w2_taps, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        h2q = jnp.clip(jnp.round(
            acc.astype(jnp.float32) * params["q2m"][0]
            + params["q2a"][0]), 0, 127).astype(jnp.int8)
        y3 = jax.lax.dot_general(
            h2q.reshape(-1, cb), params["w3"],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(n, h, w, cout).astype(jnp.float32)
        res = y3 * params["d3m"][0] + params["d3a"][0]
        if has_shortcut:
            ysc = jax.lax.dot_general(
                pq.reshape(-1, cin), params["wsc"],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(n, h, w, cout).astype(jnp.float32)
            sc = ysc * params["dscm"][0] + params["dsca"][0]
        else:
            sc = xf
        return (sc + res).astype(x.dtype)

    got = fused_bottleneck_unit(
        x, params, h=h, w=w, interpret=True
    )
    want = oracle(x, params, has_shortcut=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-2, rtol=1e-2,
    )

    params_sc = dict(params)
    params_sc["wsc"] = mki8((cin, cout))
    params_sc["dscm"] = jnp.abs(mk((1, cout), 1e-3)) + 1e-4
    params_sc["dsca"] = mk((1, cout), 0.1)
    got_sc = fused_bottleneck_unit(
        x, params_sc, h=h, w=w, has_shortcut=True, interpret=True
    )
    want_sc = oracle(x, params_sc, has_shortcut=True)
    np.testing.assert_allclose(
        np.asarray(got_sc, np.float32),
        np.asarray(want_sc, np.float32),
        atol=1e-2, rtol=1e-2,
    )


def test_int8_stream_mode_accuracy(trunk):
    """int8 residual stream (stream activations quantized between
    units): stays close to the bf16-stream static path and the fp32
    reference."""
    from human_dynamics_tpu.models.resnet_int8 import (
        apply_int8_static, calibrate_int8_scales,
    )

    model, variables, x = trunk
    qp = prepare_int8_params(variables)
    scales = calibrate_int8_scales(qp, x)
    assert "root/out" in scales
    assert any(k.endswith("/out") for k in scales if k != "root/out")

    want = np.asarray(model.apply(variables, x, train=False))
    base = np.asarray(apply_int8_static(qp, scales, x))
    got = np.asarray(
        apply_int8_static(qp, scales, x, int8_stream=True)
    )
    assert np.isfinite(got).all()
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1)
    )
    assert np.all(cos > 0.97), cos
    rel = np.linalg.norm(got - base) / np.linalg.norm(base)
    assert rel < 0.15, rel


def test_s2d_root_weights_exact(trunk):
    """Stride-folded space-to-depth root: 4x4/1 conv on s2d input must
    reproduce the 7x7/2 conv2d_same root exactly (same taps, re-indexed
    — an identity at the arithmetic level, checked in fp32)."""
    from human_dynamics_tpu.models.resnet_int8 import (
        _s2d, _s2d_root_weights,
    )

    w = jnp.asarray(RNG.randn(7, 7, 3, 16).astype(np.float32))
    x = jnp.asarray(
        RNG.randint(-127, 128, (2, 32, 32, 3)).astype(np.float32)
    )
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jax.lax.conv_general_dilated(
        _s2d(x), _s2d_root_weights(w), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3
    )


def test_wfold_root_weights_exact():
    """Width-only stride fold: (7,4)-kernel strides-(2,1) conv on the
    free width-paired reshape must reproduce the 7x7/2 conv2d_same root
    exactly (same taps re-indexed; the height stride stays explicit)."""
    from human_dynamics_tpu.models.resnet_int8 import (
        _wfold, _wfold_root_weights,
    )

    w = jnp.asarray(RNG.randn(7, 7, 3, 16).astype(np.float32))
    x = jnp.asarray(
        RNG.randint(-127, 128, (2, 32, 32, 3)).astype(np.float32)
    )
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jax.lax.conv_general_dilated(
        _wfold(x), _wfold_root_weights(w), (2, 1), ((3, 3), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3
    )


def test_int8_root_and_block_stream_accuracy(trunk):
    """int8 root stem (s2d folded conv + int8 maxpool) and per-block
    stream tuples stay close to the static baseline on [-1,1] input."""
    from human_dynamics_tpu.models.resnet_int8 import (
        apply_int8_static, calibrate_int8_scales,
    )

    model, variables, x = trunk
    x = jnp.clip(x, -1.0, 1.0)  # real inputs are 2*img/255-1
    qp = prepare_int8_params(variables)
    scales = calibrate_int8_scales(qp, x)

    want = np.asarray(model.apply(variables, x, train=False))
    base = np.asarray(apply_int8_static(qp, scales, x))

    for kwargs in (
        {"int8_root": True},
        {"int8_root": "wfold"},
        {"int8_root": "u8"},
        {"int8_root": True, "int8_stream": (1,)},
        {"int8_stream": (1, 2)},
    ):
        got = np.asarray(apply_int8_static(qp, scales, x, **kwargs))
        assert np.isfinite(got).all(), kwargs
        cos = np.sum(got * want, axis=1) / (
            np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1)
        )
        assert np.all(cos > 0.97), (kwargs, cos)
        rel = np.linalg.norm(got - base) / np.linalg.norm(base)
        assert rel < 0.15, (kwargs, rel)


def test_u8_root_affine_correction_exact():
    """Byte-direct root: with q = u - 128 int8, the identity
    conv(x) == s_w * ((2/255) conv_s8(q) + (1/255) ones_conv) must hold
    EXACTLY (up to f32 rounding) for x = 2u/255 - 1, including at
    SAME-padded borders (padded taps contribute 0 to both terms)."""
    from human_dynamics_tpu.models.resnet_int8 import (
        _quant_weight, _wfold, _wfold_root_weights,
    )

    w = jnp.asarray(RNG.randn(7, 7, 3, 16).astype(np.float32) * 0.1)
    wq, s_w = _quant_weight(_wfold_root_weights(w))
    u = RNG.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    q = jnp.asarray((u.astype(np.int32) - 128).astype(np.int8))
    x = jnp.asarray(u.astype(np.float32) * (2.0 / 255.0) - 1.0)

    conv = lambda lhs, rhs, **kw: jax.lax.conv_general_dilated(
        lhs, rhs, (2, 1), ((3, 3), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw
    )
    # Ground truth: f32 conv of the exactly-normalized image against
    # the DEQUANTIZED weights (isolates the affine trick from weight
    # quantization error).
    want = conv(_wfold(x), wq.astype(jnp.float32) * s_w)
    y = conv(_wfold(q), wq, preferred_element_type=jnp.int32)
    ones_conv = conv(
        _wfold(jnp.ones(q.shape, jnp.int8)), wq,
        preferred_element_type=jnp.int32,
    )
    got = s_w * (
        y.astype(jnp.float32) * (2.0 / 255.0)
        + ones_conv.astype(jnp.float32) * (1.0 / 255.0)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
    )


def test_u8_root_uint8_and_float_bit_identical(trunk):
    """The u8 root's two input branches (raw uint8 frames vs the same
    frames normalized to floats) must produce bit-identical phi."""
    from human_dynamics_tpu.models.resnet_int8 import (
        apply_int8_static, calibrate_int8_scales,
    )

    model, variables, _ = trunk
    u = RNG.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    x = jnp.asarray(u.astype(np.float32) * (2.0 / 255.0) - 1.0)
    qp = prepare_int8_params(variables)
    scales = calibrate_int8_scales(qp, x)
    from_u8 = np.asarray(
        apply_int8_static(qp, scales, jnp.asarray(u), int8_root="u8")
    )
    from_f32 = np.asarray(
        apply_int8_static(qp, scales, x, int8_root="u8")
    )
    assert np.isfinite(from_u8).all()
    np.testing.assert_array_equal(from_u8, from_f32)


def test_precast_bf16_temporal_matches_per_call_cast():
    """The serving/bench config (int8_encoder + bf16_temporal) precasts
    the weight tree ONCE at construction (predictor.py precast branch)
    and, with int8, prunes the never-bound resnet subtree from the bf16
    copy. Both are pure residency/traffic optimizations: the in-jit
    tree_bf16 is identity on bf16 leaves, so outputs must be
    bit-identical to the same predictor forced back onto the fp32 tree
    (per-call in-jit cast)."""
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.infer import HmmrPredictor
    from human_dynamics_tpu.models import HmmrModel

    model = HmmrModel(include_resnet=True)
    smpl = synthetic_smpl_model(num_verts=48, num_kps=25)
    images = np.asarray(
        RNG.rand(25, 64, 64, 3).astype(np.float32) * 2 - 1
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3))
    )
    kw = dict(
        batch_size=2, seq_length=20, encode_chunk=16,
        int8_encoder=True, int8_calibration=images[:8],
        bf16_temporal=True,
    )
    fast = HmmrPredictor(model, variables, smpl, **kw)
    # Precast happened and the dead resnet subtree was dropped.
    assert "resnet_v2_50" not in fast._fused_vars["params"]
    leaf = jax.tree_util.tree_leaves(fast._fused_vars)[0]
    assert leaf.dtype == jnp.bfloat16

    slow = HmmrPredictor(model, variables, smpl, **kw)
    slow._fused_vars = variables  # force the per-call-cast fp32 path

    got = fast.predict_all_images(images)
    want = slow.predict_all_images(images)
    assert set(got) == set(want)
    for k in got:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
