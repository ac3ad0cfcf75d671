"""Test environment: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths run without TPU hardware (SURVEY.md §4: simulated
mesh via xla_force_host_platform_device_count).

Note: under this image's axon TPU plugin the JAX_PLATFORMS env var alone does
not stick; jax.config.update is authoritative and also skips the slow TPU
tunnel handshake.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
