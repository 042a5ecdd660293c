"""Halo-exchange sequence parallelism: the time-sharded temporal encoder
must exactly reproduce the unsharded full-clip forward (SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_dynamics_tpu.models.temporal import TemporalEncoderFC2GN
from human_dynamics_tpu.parallel import make_mesh
from human_dynamics_tpu.parallel.halo import movie_strip_sharded

RNG = np.random.RandomState(17)


@pytest.fixture(scope="module")
def encoder_and_vars():
    enc = TemporalEncoderFC2GN(num_layers=3, num_filter=64)
    x = jnp.zeros((1, 16, 64))
    variables = enc.init(jax.random.PRNGKey(0), x)
    return enc, variables


@pytest.mark.parametrize("n", [64, 100, 37])
def test_sharded_matches_unsharded(encoder_and_vars, n):
    """Exact match incl. clips that don't divide the mesh (mask path)."""
    enc, variables = encoder_and_vars
    phi = jnp.asarray(RNG.randn(n, 64).astype(np.float32))

    want = enc.apply(variables, phi[None])[0]

    mesh = make_mesh(8, axis_name="time")
    got = movie_strip_sharded(
        variables, phi, mesh, num_layers=3, axis_name="time"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5
    )


def test_sharded_long_clip(encoder_and_vars):
    """A clip far longer than any window runs in one call."""
    enc, variables = encoder_and_vars
    n = 1024
    phi = jnp.asarray(RNG.randn(n, 64).astype(np.float32))
    mesh = make_mesh(8, axis_name="time")
    got = movie_strip_sharded(variables, phi, mesh, num_layers=3,
                              axis_name="time")
    want = enc.apply(variables, phi[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_sharded_single_device(encoder_and_vars):
    enc, variables = encoder_and_vars
    phi = jnp.asarray(RNG.randn(24, 64).astype(np.float32))
    mesh = make_mesh(1, axis_name="time")
    got = movie_strip_sharded(variables, phi, mesh, num_layers=3,
                              axis_name="time")
    want = enc.apply(variables, phi[None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
