from tinyllama_tpu.quant.codec import (
    BLOCK_SIZE,
    QTensor,
    dequantize,
    quantize,
    quantize_q4,
    quantize_q8,
)

__all__ = [
    "BLOCK_SIZE",
    "QTensor",
    "dequantize",
    "quantize",
    "quantize_q4",
    "quantize_q8",
]
