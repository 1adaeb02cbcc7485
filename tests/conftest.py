"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' TPU plugin and
overrides jax_platforms via jax.config.update at interpreter start, so
setting the JAX_PLATFORMS env var is not enough — we must update the
config after importing jax (before any backend is initialized)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
