"""Fused Pallas SMPL kernel vs the XLA-composed reference implementation
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.core import smpl_forward, synthetic_smpl_model
from human_dynamics_tpu.ops import (
    prepare_fused_constants,
    smpl_forward_fused,
)

RNG = np.random.RandomState(13)


@pytest.mark.parametrize("num_verts,block_v", [(512, 256), (700, 256)])
def test_fused_matches_reference(num_verts, block_v):
    """Exact-shape and padded-shape vertex counts."""
    model = synthetic_smpl_model(num_verts=num_verts, num_kps=19)
    consts = prepare_fused_constants(model, block_v=block_v)
    n = 48
    beta = jnp.asarray(RNG.randn(n, 10).astype(np.float32) * 0.3)
    theta = jnp.asarray(RNG.randn(n, 72).astype(np.float32) * 0.3)

    want = smpl_forward(model, beta, theta)
    got = smpl_forward_fused(
        model, beta, theta, constants=consts,
        block_v=block_v, block_n=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.verts), np.asarray(want.verts), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.joints), np.asarray(want.joints), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.j_posed), np.asarray(want.j_posed), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.rots), np.asarray(want.rots), atol=1e-5
    )


def test_fused_handles_ragged_batch():
    """N not a multiple of block_n is padded internally."""
    model = synthetic_smpl_model(num_verts=256, num_kps=19)
    n = 21
    beta = jnp.asarray(RNG.randn(n, 10).astype(np.float32) * 0.3)
    theta = jnp.asarray(RNG.randn(n, 72).astype(np.float32) * 0.3)
    want = smpl_forward(model, beta, theta)
    got = smpl_forward_fused(
        model, beta, theta, block_v=256, block_n=16, interpret=True
    )
    assert got.verts.shape == (n, 256, 3)
    np.testing.assert_allclose(
        np.asarray(got.verts), np.asarray(want.verts), atol=2e-4
    )


def test_rest_joint_contraction():
    """Precontracted beta->rest-joints table equals regressing v_shaped."""
    model = synthetic_smpl_model(num_verts=128, num_kps=19)
    consts = prepare_fused_constants(model, block_v=128)
    beta = jnp.asarray(RNG.randn(4, 10).astype(np.float32) * 0.5)

    v_shaped = (
        jnp.matmul(beta, model.shapedirs).reshape(4, 128, 3)
        + model.v_template
    )
    want = jnp.einsum("nvc,vj->njc", v_shaped, model.j_regressor)
    got = (
        jnp.matmul(beta, consts.shape_j_dirs).reshape(4, 24, 3)
        + consts.j_template
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_constants_cache_across_traces():
    """Regression: the fused-constants cache must hold concrete arrays
    even when first populated inside a jit trace (two predictors with
    different static shapes share one SmplModel)."""
    from human_dynamics_tpu.core import synthetic_smpl_model
    from human_dynamics_tpu.models.omega import compute_smpl

    model = synthetic_smpl_model(num_verts=128, num_kps=19)
    raw = jnp.zeros((2, 4, 85)).at[..., 0].set(1.0)

    @jax.jit
    def f1(raw):
        return compute_smpl(model, raw, fused=True,
                            want_verts=False).joints

    @jax.jit
    def f2(raw):  # different trace, same cached constants
        return compute_smpl(model, raw[:1], fused=True,
                            want_verts=False).joints

    a = f1(raw)
    b = f2(raw)   # leaked tracers would raise UnexpectedTracerError
    assert np.all(np.isfinite(np.asarray(a)))
    assert np.all(np.isfinite(np.asarray(b)))


def test_fused_gradients_match_composed():
    """The fused path's custom VJP must produce the composed path's
    gradients (training with use_fused_smpl)."""
    model = synthetic_smpl_model(num_verts=128, num_kps=19)
    beta = jnp.asarray(RNG.randn(3, 10).astype(np.float32) * 0.3)
    theta = jnp.asarray(RNG.randn(3, 72).astype(np.float32) * 0.3)

    def loss_fused(b, t):
        out = smpl_forward_fused(model, b, t, block_v=128, block_n=16,
                                 want_verts=False)
        return jnp.sum(out.joints ** 2) + jnp.sum(out.rots)

    def loss_ref(b, t):
        out = smpl_forward(model, b, t)
        return jnp.sum(out.joints ** 2) + jnp.sum(out.rots)

    gf = jax.grad(loss_fused, argnums=(0, 1))(beta, theta)
    gr = jax.grad(loss_ref, argnums=(0, 1))(beta, theta)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-3, rtol=1e-3
        )
