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

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh named ("data", "model").

    Device order follows jax.devices(), which enumerates ICI-adjacent
    devices contiguously — keeping the model axis (all-reduce heavy) on
    neighboring chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = tp * dp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
