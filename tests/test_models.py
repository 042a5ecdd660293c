"""Shape/behavior tests for the neural nets (SURVEY.md §2.1 L3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.models import (
    ResNetV2_50,
    TemporalEncoderFC2GN,
    IefRegressor,
    ief_refine,
    Hallucinator,
    PoseDiscriminator,
    HmmrModel,
)

RNG = np.random.RandomState(0)


def test_resnet_output_shape():
    model = ResNetV2_50()
    x = jnp.asarray(RNG.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    phi = model.apply(variables, x)
    assert phi.shape == (2, 2048)
    assert bool(jnp.isfinite(phi).all())


def test_resnet_param_structure():
    model = ResNetV2_50()
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    # Root conv + 4 blocks with slim-style unit names + postnorm.
    assert "conv1" in params
    assert "block1/unit_1/bottleneck_v2" in params
    assert "block4/unit_3/bottleneck_v2" in params
    assert "postnorm" in params
    # v2 bottleneck: conv1/conv2 have no bias (BN follows), conv3 does.
    unit = params["block1/unit_1/bottleneck_v2"]
    assert "bias" not in unit["conv1"]
    assert "bias" in unit["conv3"]
    # batch stats collection exists for BN moving averages.
    assert "batch_stats" in variables


def test_resnet_remat_matches_plain():
    """remat=True must be a pure performance knob: identical params,
    outputs, and gradients to the plain trunk."""
    x = jnp.asarray(RNG.randn(2, 32, 32, 3).astype(np.float32))
    plain = ResNetV2_50()
    remat = ResNetV2_50(remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        remat.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(variables)

    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, x, train=True)),
        np.asarray(remat.apply(variables, x, train=True)),
        rtol=1e-6,
    )

    def loss(model, v):
        return jnp.sum(model.apply(v, x, train=True) ** 2)

    g_plain = jax.grad(lambda v: loss(plain, v))(variables)["params"]
    g_remat = jax.grad(lambda v: loss(remat, v))(variables)["params"]
    flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(g_remat))
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]), rtol=1e-5,
            atol=1e-6, err_msg=jax.tree_util.keystr(path),
        )


def test_temporal_encoder_receptive_field():
    """fov = 4*num_layers + 1: a single-frame perturbation must not leak
    beyond fov//2 frames (the windowed-inference contract,
    tester.py:260-312)."""
    enc = TemporalEncoderFC2GN(num_layers=3, num_filter=64)
    t = 40
    x = jnp.asarray(RNG.randn(1, t, 64).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)

    y0 = enc.apply(variables, x)
    x2 = x.at[0, 20].add(10.0)
    y1 = enc.apply(variables, x2)

    diff = np.abs(np.asarray(y1 - y0)).max(axis=-1)[0]  # (T,)
    margin = enc.fov // 2  # 6
    # GroupNorm stats are global over T (true of the reference's
    # tf.contrib group_norm too, models.py:153-161), so ~delta/T leakage
    # everywhere is expected; the *structural* conv propagation must stay
    # inside the fov and dominate by a wide margin.
    inside = diff[20 - margin:20 + margin + 1].max()
    outside = np.concatenate([diff[:20 - margin], diff[20 + margin + 1:]])
    assert inside > 1.0
    assert outside.max() < inside * 0.05


def test_temporal_encoder_shape_and_residual_init():
    enc = TemporalEncoderFC2GN(num_layers=3, num_filter=128)
    x = jnp.asarray(RNG.randn(2, 20, 128).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(variables, x)
    assert y.shape == (2, 20, 128)
    # conv2 is small-init (0.001): at init the blocks are near-identity in
    # the residual branch contribution.
    assert float(jnp.abs(y - x).mean()) < 1.0


def test_ief_refine_additive():
    reg = IefRegressor(num_output=85)
    phi = jnp.asarray(RNG.randn(4, 2048).astype(np.float32))
    start = jnp.asarray(RNG.randn(4, 85).astype(np.float32))
    variables = reg.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 2048 + 85))
    )

    def bound(state, train=False):
        return reg.apply(variables, state, train=train)

    out = ief_refine(bound, phi, start, num_stage=3)
    assert out.shape == (4, 85)
    # Small-init last layer: 3 stages of tiny deltas stay near start.
    assert float(jnp.abs(out - start).mean()) < 1.0
    # 0 stages = identity.
    np.testing.assert_allclose(
        np.asarray(ief_refine(bound, phi, start, num_stage=0)),
        np.asarray(start),
    )


def test_hallucinator_residual():
    hal = Hallucinator(features=256)
    phi = jnp.asarray(RNG.randn(3, 7, 256).astype(np.float32))
    variables = hal.init(jax.random.PRNGKey(0), phi)
    out = hal.apply(variables, phi)
    assert out.shape == phi.shape
    # Small-init output layer: near-identity at init.
    assert float(jnp.abs(out - phi).mean()) < 0.5


def test_discriminator_output():
    disc = PoseDiscriminator()
    poses = jnp.asarray(RNG.randn(6, 23, 9).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), poses)
    out = disc.apply(variables, poses)
    assert out.shape == (6, 24)
    # Accepts (N, 23, 3, 3) too.
    out2 = disc.apply(variables, poses.reshape(6, 23, 3, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


@pytest.fixture(scope="module")
def hmmr_and_vars():
    model = HmmrModel(do_hallucinate=True, do_hallucinate_preds=False)
    phi = jnp.zeros((2, 20, 2048))
    variables = model.init(jax.random.PRNGKey(0), phi)
    return model, variables


def test_hmmr_forward_shapes(hmmr_and_vars):
    model, variables = hmmr_and_vars
    phi = jnp.asarray(RNG.randn(2, 20, 2048).astype(np.float32))
    out = model.apply(variables, phi)
    assert out.omega_pred.shape == (2, 20, 85)
    assert set(out.omegas_delta.keys()) == {-5, 5}
    for v in out.omegas_delta.values():
        assert v.shape == (2, 20, 85)
    assert out.omega_hal.shape == (2, 20, 85)
    assert out.omegas_hal_delta == {}
    assert out.movie_strip.shape == (2, 20, 2048)
    assert out.hal_strip.shape == (2, 20, 2048)


def test_hmmr_delta_head_contract(hmmr_and_vars):
    """Delta heads carry cam=[1,0,0] and the present prediction's beta
    (models.py:367-373)."""
    model, variables = hmmr_and_vars
    phi = jnp.asarray(RNG.randn(2, 20, 2048).astype(np.float32))
    out = model.apply(variables, phi)
    for dt, om in out.omegas_delta.items():
        cams = np.asarray(om[..., :3])
        np.testing.assert_allclose(cams[..., 0], 1.0)
        np.testing.assert_allclose(cams[..., 1:], 0.0)
        np.testing.assert_allclose(
            np.asarray(om[..., 75:]), np.asarray(out.omega_pred[..., 75:]),
            atol=1e-6,
        )


def test_hmmr_mean_param_trainable(hmmr_and_vars):
    model, variables = hmmr_and_vars
    assert variables["params"]["mean_param"].shape == (1, 85)
    assert float(variables["params"]["mean_param"][0, 0]) == pytest.approx(0.9)
    assert float(variables["params"]["mean_param"][0, 3]) == pytest.approx(
        np.pi
    )


def test_hmmr_ief_shared_between_branches(hmmr_and_vars):
    """The hallucinator branch must reuse single_view_ief weights: there
    is exactly one single_view_ief param subtree."""
    model, variables = hmmr_and_vars
    params = variables["params"]
    ief_keys = [k for k in params if "single_view_ief" in k]
    assert ief_keys == ["single_view_ief"]
    delta_keys = sorted(k for k in params if "ief_delta" in k)
    assert len(delta_keys) == 2


def test_hmmr_hmr_only_mode():
    model = HmmrModel(
        use_hmr_only=True, do_hallucinate=False, predict_delta=False
    )
    phi = jnp.asarray(RNG.randn(1, 4, 2048).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), phi)
    out = model.apply(variables, phi)
    assert out.omega_pred.shape == (1, 4, 85)
    assert out.omegas_delta == {}
    assert out.omega_hal is None
    # movie strip is phi itself in hmr-only mode.
    np.testing.assert_allclose(
        np.asarray(out.movie_strip), np.asarray(phi)
    )


def test_hmmr_rejects_images_without_resnet():
    model = HmmrModel()
    phi = jnp.zeros((1, 2, 2048))
    variables = model.init(jax.random.PRNGKey(0), phi)
    with pytest.raises(ValueError):
        model.apply(variables, jnp.zeros((1, 2, 8, 8, 3)))


def test_load_mean_omega_h5_and_npz(tmp_path):
    """Mean-omega loading applies the reference's overrides exactly
    (tester.py:118-141): cam=[0.9,0,0], pose[:3]=0 then pose[0]=pi."""
    import h5py

    from human_dynamics_tpu.models.hmmr import (
        load_mean_omega, resolve_mean_omega)

    rng = np.random.RandomState(3)
    pose = rng.randn(72).astype(np.float64)
    shape = rng.randn(10).astype(np.float64)

    h5_path = tmp_path / "neutral_smpl_meanwjoints.h5"
    with h5py.File(h5_path, "w") as f:
        f["pose"] = pose
        f["shape"] = shape
    npz_path = tmp_path / "mean.npz"
    np.savez(npz_path, pose=pose, shape=shape)

    for p in (str(h5_path), str(npz_path)):
        mean = load_mean_omega(p)
        assert mean.shape == (1, 85) and mean.dtype == np.float32
        np.testing.assert_allclose(mean[0, :3], [0.9, 0, 0])
        np.testing.assert_allclose(mean[0, 3:6], [np.pi, 0, 0])
        np.testing.assert_allclose(mean[0, 6:75], pose[3:], rtol=1e-6)
        np.testing.assert_allclose(mean[0, 75:], shape, rtol=1e-6)

    # Missing path falls back to the zeros-variant.
    fallback = resolve_mean_omega(str(tmp_path / "nope.h5"))
    assert fallback[0, 0] == np.float32(0.9) and fallback[0, 3] > 3


def test_hmmr_initializes_mean_param_from_file(tmp_path):
    """Config.smpl_mean_path is actually consumed: a trainer-built model
    starts its trainable mean_param at the file's value."""
    import h5py
    import jax

    from human_dynamics_tpu.models.hmmr import resolve_mean_omega
    from human_dynamics_tpu.models.hmmr import HmmrModel

    rng = np.random.RandomState(4)
    h5_path = tmp_path / "mean.h5"
    with h5py.File(h5_path, "w") as f:
        f["pose"] = rng.randn(72)
        f["shape"] = rng.randn(10)

    mean = resolve_mean_omega(str(h5_path))
    model = HmmrModel(mean_omega_init=mean)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 20, 2048)))
    np.testing.assert_allclose(
        np.asarray(variables["params"]["mean_param"]), mean, rtol=1e-6)


def test_freeze_bn_stats_uses_moving_statistics():
    """freeze_bn_stats=True: train-mode forward equals inference-mode
    forward (moving stats), while the default train path (batch stats)
    differs — the standard frozen-BN fine-tuning recipe."""
    import numpy as _np

    from human_dynamics_tpu.models.hmmr import HmmrModel

    rng = _np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(1, 2, 64, 64, 3).astype(_np.float32) * 2 - 1
    )
    kw = dict(include_resnet=True, do_hallucinate=False,
              predict_delta=False, feature_dim=2048)
    model = HmmrModel(**kw)
    variables = model.init(jax.random.PRNGKey(0), images)
    # Shift the moving stats so batch-vs-moving is distinguishable.
    stats = jax.tree_util.tree_map(
        lambda v: v + 0.3, variables["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    frozen = HmmrModel(freeze_bn_stats=True, **kw)

    def phi(m, train):
        return _np.asarray(m.apply(
            variables, images, train=train,
            method=lambda mm, im, train: mm.encode_images(im, train),
        ))

    eval_ref = phi(model, train=False)
    _np.testing.assert_allclose(
        phi(frozen, train=True), eval_ref, atol=1e-6
    )
    assert _np.abs(phi(model, train=True) - eval_ref).max() > 1e-3
