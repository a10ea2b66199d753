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

# Run the whole suite under strict backward-pass type checking (custom-VJP
# cotangents must carry the same varying-manual-axes as their primals).
# This image's jax defaults the checks OFF, but the driver's multi-chip
# gate runs with them ON — round 1 shipped a sharded_lookup VJP that was
# green locally and red under the gate; never again.
jax.config.update("jax_disable_bwd_checks", False)
