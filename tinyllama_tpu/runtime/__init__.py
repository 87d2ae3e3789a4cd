from tinyllama_tpu.runtime.engine import Engine, GenStats
from tinyllama_tpu.runtime.kvcache import KVCache, init_cache

__all__ = ["Engine", "GenStats", "KVCache", "init_cache"]
