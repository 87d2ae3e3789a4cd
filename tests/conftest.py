"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
XLA's host-platform device virtualization instead (SURVEY.md §4).
Must set env vars before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the TPU plugin on this host pre-sets jax_platforms to "axon,cpu",
# overriding the JAX_PLATFORMS env var — force CPU via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
