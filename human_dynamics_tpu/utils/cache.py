"""Persistent XLA compilation cache.

First compiles of the big fused programs take minutes (TPU toolchain +
remote compile helpers); the persistent cache makes every subsequent
process start warm. Called by all CLI entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/hd_tpu_jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass  # cache is an optimization, never a requirement
