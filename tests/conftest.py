"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
XLA's host-platform device virtualization instead (SURVEY.md §4).
Must set env vars before jax is imported anywhere.

Exception: ``pytest -m tpu tests/test_tpu_kernels.py`` keeps the real
TPU backend and runs each Pallas kernel compiled-vs-interpret on it
(Mosaic lowering smoke — interpret mode alone cannot catch lowering
bugs). Those tests self-skip when no TPU is attached.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

_TPU_MODE = any("tpu" in a for a in sys.argv if not a.startswith("--co"))

if not _TPU_MODE:
    # NOTE: the TPU plugin on this host pre-sets jax_platforms to
    # "axon,cpu", overriding the JAX_PLATFORMS env var — force CPU via
    # the config API.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.tpu tests unless running in TPU mode."""
    import pytest

    if _TPU_MODE:
        return
    skip = pytest.mark.skip(reason="TPU mode only (run: pytest -m tpu "
                                   "tests/test_tpu_kernels.py)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
