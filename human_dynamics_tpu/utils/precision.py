"""Shared mixed-precision helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_bf16(tree):
    """Cast every fp32 array leaf of a pytree to bf16.

    Non-fp32 leaves (int8 quantized weights, bool masks, int step
    counters, batch-stat ints) pass through untouched. This is THE
    cast used by every mixed-precision path (bf16 encoder / temporal
    inference, bf16 training fwd/bwd) — change cast policy here, not
    at the call sites.
    """
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x,
        tree,
    )
