"""Iterative-error-feedback (IEF) Omega regressor, flax.

Parity targets:
- encoder_fc3_dropout (/root/reference/src/models.py:80-116): the 3-layer
  MLP (fc1024 -> drop .5 -> fc1024 -> drop .5 -> fc{out}, small-xavier
  last layer), weights shared across all IEF stages (slim AUTO_REUSE).
- hmr_ief (/root/reference/src/models.py:380-415): 3 additive refinement
  stages from a starting Omega.

The stage loop is unrolled (3 static iterations of a shared-weight MLP) —
XLA fuses it into three dependent matmul chains; a scan would add nothing
at num_stage=3.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

SMALL_XAVIER_01 = nn.initializers.variance_scaling(
    scale=0.01, mode="fan_avg", distribution="uniform"
)
XAVIER = nn.initializers.variance_scaling(
    scale=1.0, mode="fan_avg", distribution="uniform"
)


class IefRegressor(nn.Module):
    """The shared 3-layer IEF MLP (one stage)."""

    num_output: int = 85
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, state: jax.Array, train: bool = False
    ) -> jax.Array:
        """state (N, phi_dim + num_output) -> delta_theta (N, num_output)."""
        net = nn.relu(nn.Dense(1024, kernel_init=XAVIER, name="fc1")(state))
        net = nn.Dropout(self.dropout_rate, deterministic=not train)(net)
        net = nn.relu(nn.Dense(1024, kernel_init=XAVIER, name="fc2")(net))
        net = nn.Dropout(self.dropout_rate, deterministic=not train)(net)
        return nn.Dense(
            self.num_output, kernel_init=SMALL_XAVIER_01, name="fc3"
        )(net)


def ief_refine(
    regressor,
    phi: jax.Array,
    omega_start: jax.Array,
    num_stage: int = 3,
    train: bool = False,
) -> jax.Array:
    """Run num_stage additive IEF refinements (hmr_ief).

    Args:
        regressor: a bound/callable IefRegressor (weights shared across
            stages, mirroring slim AUTO_REUSE at models.py:400-413).
        phi: (N, D) image/movie-strip features.
        omega_start: (N, num_output) starting parameters.

    Returns:
        (N, num_output) refined parameters.
    """
    theta = omega_start
    for _ in range(num_stage):
        state = jnp.concatenate([phi, theta], axis=1)
        theta = theta + regressor(state, train=train)
    return theta
