"""Single-frame movie-strip hallucinator, flax.

Parity target: fc2_res (/root/reference/src/models.py:270-296): two
relu fc2048 layers + small-init fc2048 added to the input as a residual.
Converts a single frame's phi into a pseudo movie strip; trained to match
the real temporal encoder output (trainer_sequence_fc.py:843-846).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from human_dynamics_tpu.models.temporal import SMALL_XAVIER_001
from human_dynamics_tpu.models.ief import XAVIER


class Hallucinator(nn.Module):
    features: int = 2048

    @nn.compact
    def __call__(self, phi: jax.Array) -> jax.Array:
        """phi (..., 2048) -> hallucinated movie strip (..., 2048)."""
        net = nn.relu(nn.Dense(self.features, kernel_init=XAVIER, name="fc1")(phi))
        net = nn.relu(nn.Dense(self.features, kernel_init=XAVIER, name="fc2")(net))
        net = nn.Dense(
            self.features, kernel_init=SMALL_XAVIER_001, name="fc3"
        )(net)
        return net + phi
