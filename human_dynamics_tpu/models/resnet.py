"""ResNet-50 v2 (pre-activation) per-frame feature encoder, flax.

Structural parity target: TF-slim ``resnet_v2_50`` as used by the
reference's encoder_resnet (/root/reference/src/models.py:50-77):
``num_classes=None`` -> global-average-pooled 2048-D feature ("phi").

Slim-compatibility notes (they matter for loading converted TF
checkpoints — SURVEY.md §7 hard part 1):

- Pre-activation ("v2") bottleneck: preact BN+relu feeds both the residual
  branch and (for projection shortcuts) the shortcut conv; identity
  shortcuts bypass the preact and subsample the raw input.
- Slim applies the stride on the *last* unit of each block (v2
  convention), not the first.
- Slim's ``conv2d_same`` with stride>1 pads (k-1)//2 on *both* sides then
  convolves VALID — this differs from TF/XLA 'SAME' (which pads
  asymmetrically); we replicate the symmetric padding exactly.
- Root conv (7x7/2) has no norm/activation (preact architecture); the
  trunk ends with a final BN+relu ("postnorm") before pooling.
- BatchNorm: epsilon 1e-5, scale=True, moving-average decay 0.997 (slim
  resnet_arg_scope). Inference uses the stored moving statistics;
  train-mode BN normalizes with batch statistics and advances the
  moving averages when applied with ``mutable=["batch_stats"]`` (the
  reference runs slim's UPDATE_OPS with e_loss,
  trainer_sequence_fc.py:747-750).

Module names are chosen so flattened flax param paths map 1:1 onto slim
variable names for the checkpoint converter
(resnet_v2_50/block{i}/unit_{j}/bottleneck_v2/{conv1,conv2,conv3,shortcut}).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SlimBatchNorm(nn.Module):
    """BatchNorm matching slim's resnet arg_scope (eps 1e-5, scale on,
    moving-average decay 0.997).

    In train mode the moving averages are updated iff the caller opted
    in with ``mutable=["batch_stats"]`` — the reference executes slim's
    UPDATE_OPS together with e_loss (trainer_sequence_fc.py:747-750),
    so a training forward must advance the running statistics or
    inference-mode BN diverges from the activations it normalizes (the
    image-mode synthetic gauntlet catches exactly this). Callers that
    apply train-mode BN without mutability (parity probes, grad checks)
    still get pure batch-stat normalization with no update.
    """

    epsilon: float = 1e-5
    momentum: float = 0.997

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        moving_mean = self.variable(
            "batch_stats", "moving_mean", lambda: jnp.zeros((c,))
        )
        moving_var = self.variable(
            "batch_stats", "moving_variance", lambda: jnp.ones((c,))
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                # Accumulate in the stored dtype (fp32 master copies —
                # the trainer keeps batch_stats out of its bf16 cast so
                # the 0.003-scale increments don't quantize away).
                m = self.momentum
                moving_mean.value = (
                    m * moving_mean.value
                    + (1.0 - m) * mean.astype(moving_mean.value.dtype)
                )
                moving_var.value = (
                    m * moving_var.value
                    + (1.0 - m) * var.astype(moving_var.value.dtype)
                )
        else:
            mean, var = moving_mean.value, moving_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * gamma
        return x * inv + (beta - mean * inv)


def _conv_same(
    x: jax.Array,
    features: int,
    kernel: int,
    stride: int,
    name: str,
    use_bias: bool = True,
) -> jax.Array:
    """slim ``conv2d_same``: explicit symmetric pad + VALID for stride>1."""
    if stride == 1:
        return nn.Conv(
            features, (kernel, kernel), strides=1, padding="SAME",
            use_bias=use_bias, name=name,
        )(x)
    pad_beg = (kernel - 1) // 2
    pad_end = kernel - 1 - pad_beg
    return nn.Conv(
        features, (kernel, kernel), strides=stride,
        padding=((pad_beg, pad_end), (pad_beg, pad_end)),
        use_bias=use_bias, name=name,
    )(x)


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck unit (slim resnet_v2.bottleneck)."""

    depth: int
    depth_bottleneck: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        depth_in = x.shape[-1]
        preact = nn.relu(SlimBatchNorm(name="preact")(x, train))

        if self.depth == depth_in:
            # subsample(inputs, stride): strided identity on the RAW input.
            shortcut = x if self.stride == 1 else x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=self.stride, padding="VALID",
                use_bias=True, name="shortcut",
            )(preact)

        residual = nn.Conv(
            self.depth_bottleneck, (1, 1), strides=1, padding="VALID",
            use_bias=False, name="conv1",
        )(preact)
        residual = nn.relu(SlimBatchNorm(name="conv1_bn")(residual, train))
        residual = _conv_same(
            residual, self.depth_bottleneck, 3, self.stride,
            name="conv2", use_bias=False,
        )
        residual = nn.relu(SlimBatchNorm(name="conv2_bn")(residual, train))
        residual = nn.Conv(
            self.depth, (1, 1), strides=1, padding="VALID",
            use_bias=True, name="conv3",
        )(residual)
        return shortcut + residual


class ResNetV2_50(nn.Module):
    """resnet_v2_50 trunk -> global-average-pooled 2048-D phi.

    Input: (N, H, W, 3) images in [-1, 1] (the reference normalizes images
    to [-1, 1] before the encoder, data_utils.py:370-378).
    Output: (N, 2048) float features.
    """

    # (num_units, depth, depth_bottleneck) per block; stride 2 applied on
    # the last unit of blocks 1-3 (slim resnet_v2_50 line-up).
    blocks: Sequence[Tuple[int, int, int]] = (
        (3, 256, 64),
        (4, 512, 128),
        (6, 1024, 256),
        (3, 2048, 512),
    )
    # Rematerialize each bottleneck unit on the backward pass: store only
    # unit inputs, recompute the in-unit activations. Trades ~1/3 more
    # conv FLOPs for not round-tripping every activation through HBM —
    # opt-in for unfrozen image-mode training (Config.remat_resnet).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Root: conv2d_same 7x7/2, no BN/relu (preact net), then 3x3/2 pool.
        net = _conv_same(x, 64, 7, 2, name="conv1", use_bias=True)
        net = nn.max_pool(
            net, (3, 3), strides=(2, 2), padding="SAME"
        )
        unit_cls = (
            nn.remat(BottleneckV2, static_argnums=(2,))
            if self.remat else BottleneckV2
        )
        for bi, (num_units, depth, depth_bottleneck) in enumerate(
            self.blocks, start=1
        ):
            last_block = bi == len(self.blocks)
            for ui in range(1, num_units + 1):
                stride = 2 if (ui == num_units and not last_block) else 1
                net = unit_cls(
                    depth=depth,
                    depth_bottleneck=depth_bottleneck,
                    stride=stride,
                    name=f"block{bi}/unit_{ui}/bottleneck_v2",
                )(net, train)
        net = nn.relu(SlimBatchNorm(name="postnorm")(net, train))
        # Global average pool (slim global_pool=True, then squeeze).
        return jnp.mean(net, axis=(1, 2))
