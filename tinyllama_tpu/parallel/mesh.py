"""Device mesh construction.

The reference has no multi-device anything (SURVEY.md §2 C26: OpenMP
threads are its only parallelism). Here scale-out is first-class: a 2-D
``(data, model)`` jax.sharding.Mesh over ICI, with XLA collectives
(psum/all-gather/reduce-scatter) inserted by GSPMD from the named shardings
in parallel/sharding.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DCN_AXIS = "dcn"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(tp: int = 1, dp: int = 1, dcn: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh named ("data", "model"), or — with
    ``dcn > 1`` — a 3-axis ("dcn", "data", "model") mesh whose outermost
    axis crosses hosts.

    Device order follows jax.devices(), which enumerates ICI-adjacent
    devices contiguously within a host and host-major across hosts — so
    the model axis (all-reduce heavy) stays on neighboring chips over
    ICI, and only the dcn axis (data-parallel replicas, no per-token
    collectives) crosses the slower host network.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = tp * dp * dcn
    if need > len(devices):
        raise ValueError(f"mesh {dcn}x{dp}x{tp} needs {need} devices, "
                         f"have {len(devices)}")
    if dcn > 1:
        arr = np.array(devices[:need]).reshape(dcn, dp, tp)
        return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.array(devices[:need]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh):
    """The mesh axes a leading batch dimension shards over: data within
    a host plus the cross-host dcn axis when present."""
    return (
        (DCN_AXIS, DATA_AXIS) if DCN_AXIS in mesh.axis_names else DATA_AXIS
    )


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for multi-host execution (DCN).

    With no arguments JAX auto-detects the environment (TPU pod
    metadata); explicit arguments support manual launches, e.g. the
    2-process CPU smoke test (tools/multihost_smoke.py). Call before
    any other JAX API. The reference has no multi-process anything
    (SURVEY.md §5: distributed communication backend — none).
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
