"""LSGAN pose-prior discriminator, flax.

Parity target: PoseDiscriminator (/root/reference/src/discriminators.py).
Input is per-joint rotation matrices for the 23 non-global joints,
(N, 23, 9). Two shared 1x1 "convs" (= per-joint Dense layers) to 32
channels, then 23 per-joint linear heads plus an all-joint
fc1024-fc1024-fc1 head; output (N, 24) logits.

The reference's 1x1 convs over an (N, 23, 1, 9) tensor are exactly
per-joint Dense layers on (N, 23, 9) — implemented that way here, which
XLA maps to two batched matmuls. The 23 separate per-joint heads
(discriminators.py:43-52) are one einsum against a (23, 32) weight block.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from human_dynamics_tpu.models.ief import XAVIER


class PoseDiscriminator(nn.Module):
    num_joints: int = 23
    hidden: int = 32
    nz_feat: int = 1024

    @nn.compact
    def __call__(self, poses_rot: jax.Array) -> jax.Array:
        """poses_rot (N, 23, 9) [or (N, 23, 3, 3)] -> logits (N, 24)."""
        n = poses_rot.shape[0]
        x = poses_rot.reshape(n, self.num_joints, 9)
        x = nn.relu(nn.Dense(self.hidden, kernel_init=XAVIER, name="D_conv1")(x))
        x = nn.relu(nn.Dense(self.hidden, kernel_init=XAVIER, name="D_conv2")(x))

        # 23 independent per-joint linear heads: weight (23, 32), bias (23).
        w = self.param(
            "per_joint_w", XAVIER, (self.num_joints, self.hidden)
        )
        b = self.param(
            "per_joint_b", nn.initializers.zeros, (self.num_joints,)
        )
        theta_out = jnp.einsum("njh,jh->nj", x, w) + b  # (N, 23)

        # Joint-correlation head on the flattened features.
        flat = x.reshape(n, self.num_joints * self.hidden)
        h = nn.relu(nn.Dense(self.nz_feat, kernel_init=XAVIER,
                             name="D_alljoints_fc1")(flat))
        h = nn.relu(nn.Dense(self.nz_feat, kernel_init=XAVIER,
                             name="D_alljoints_fc2")(h))
        all_out = nn.Dense(1, kernel_init=XAVIER, name="D_alljoints_out")(h)

        return jnp.concatenate([theta_out, all_out], axis=1)  # (N, 24)
