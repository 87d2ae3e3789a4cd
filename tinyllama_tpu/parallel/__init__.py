from tinyllama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from tinyllama_tpu.parallel.sharding import cache_sharding, param_sharding

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "cache_sharding",
    "make_mesh",
    "param_sharding",
]
