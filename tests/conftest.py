"""Test configuration: force CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4, item 5).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so we must use jax.config.update before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
