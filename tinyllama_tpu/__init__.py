"""tinyllama-tpu: a TPU-native quantized LLM inference engine.

Brand-new framework with the capability set of iangitonga/tinyllama.cpp
(CPU/C++ reference at /root/reference), re-designed for TPU:
JAX/XLA for the compiled compute path, Pallas for the hot kernels,
jax.sharding.Mesh + collectives for multi-chip scale.
"""

from tinyllama_tpu.config import (
    DtypePolicy,
    GenerationConfig,
    LLAMA_3_8B,
    LLAMA_3_70B,
    MODEL_REGISTRY,
    ModelConfig,
    POLICIES,
    TINYLLAMA_1_1B,
    tiny_test_config,
)
from tinyllama_tpu.quant.codec import QTensor, dequantize, quantize

__version__ = "0.1.0"

__all__ = [
    "DtypePolicy",
    "GenerationConfig",
    "LLAMA_3_8B",
    "LLAMA_3_70B",
    "MODEL_REGISTRY",
    "ModelConfig",
    "POLICIES",
    "QTensor",
    "TINYLLAMA_1_1B",
    "dequantize",
    "quantize",
    "tiny_test_config",
]
