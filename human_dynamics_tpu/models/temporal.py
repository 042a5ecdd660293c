"""AZ_FC2GN temporal "movie strip" encoder, flax.

Parity target: az_fc2_groupnorm / az_fc_block2
(/root/reference/src/models.py:121-228). Each of num_layers residual
blocks is GN -> relu -> conv[3x1] -> GN -> relu -> conv[3x1, small-init]
-> +skip, applied to (B, T, 2048) features. The reference realizes the
temporal conv as a 2-D conv on an NT1C tensor; here it is a true 1-D conv
over T (identical math, one less dummy axis for XLA to see through).

Receptive field: fov = 4 * num_layers + 1 (= 13 at num_layers = 3;
trainer_sequence_fc.py:84).

GroupNorm: tf.contrib.layers.group_norm defaults — 32 groups over the
channel axis, stats over (T, within-group channels), epsilon 1e-6 — which
is exactly flax nn.GroupNorm(num_groups=32) on (B, T, C).
"""

from __future__ import annotations

import flax.linen as nn
import jax

SMALL_XAVIER_001 = nn.initializers.variance_scaling(
    scale=0.001, mode="fan_avg", distribution="uniform"
)


class TemporalBlockFC2GN(nn.Module):
    """One pre-norm residual temporal conv block (az_fc_block2)."""

    num_filter: int = 2048
    kernel_width: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        net = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn1")(x)
        net = nn.relu(net)
        net = nn.Conv(
            self.num_filter, (self.kernel_width,), padding="SAME",
            name="conv1",
        )(net)
        net = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn2")(net)
        net = nn.relu(net)
        net = nn.Conv(
            self.num_filter, (self.kernel_width,), padding="SAME",
            kernel_init=SMALL_XAVIER_001, name="conv2",
        )(net)
        return net + x


class TemporalEncoderFC2GN(nn.Module):
    """Stack of num_layers temporal blocks (az_fc2_groupnorm)."""

    num_layers: int = 3
    num_filter: int = 2048
    kernel_width: int = 3

    @property
    def fov(self) -> int:
        return 4 * self.num_layers + 1

    @nn.compact
    def __call__(self, phi: jax.Array) -> jax.Array:
        """phi (B, T, C) -> movie strip (B, T, C)."""
        net = phi
        for i in range(self.num_layers):
            net = TemporalBlockFC2GN(
                num_filter=self.num_filter,
                kernel_width=self.kernel_width,
                name=f"block_{i}",
            )(net)
        return net
