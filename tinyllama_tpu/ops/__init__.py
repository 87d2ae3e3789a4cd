from tinyllama_tpu.ops.attention import gqa_attention
from tinyllama_tpu.ops.linear import embedding_lookup, linear
from tinyllama_tpu.ops.norms import rms_norm
from tinyllama_tpu.ops.rope import apply_rope, rope_table

__all__ = [
    "apply_rope",
    "embedding_lookup",
    "gqa_attention",
    "linear",
    "rms_norm",
    "rope_table",
]
