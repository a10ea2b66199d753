"""Test environment: force CPU with 8 virtual devices so sharding paths run
without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize registers a TPU PJRT plugin and *overrides*
``JAX_PLATFORMS`` via ``jax.config`` — so plain env vars aren't enough; we
must call ``jax.config.update`` before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
