"""Linear layers over dense or block-quantized weights.

Capability parity with gten's matmul_2d + the SIMD dequant-dot kernels
(/root/reference/gten/ops.h:613-670, 224-479), re-designed for TPU: the
weight stays packed in HBM (int8 / packed-int4 planes + per-block scales)
and is dequantized on the fly feeding the MXU. Two execution paths:

* ``use_pallas=False`` (default off-TPU): pure-jnp dequant + matmul. XLA
  fuses the int->float convert and scale multiply into the matmul operand;
  correct everywhere (CPU tests), not bandwidth-optimal.
* ``use_pallas=True``: fused Pallas kernel (ops/pallas/qmatmul.py) that
  streams packed weights HBM->VMEM and dequantizes in the kernel epilogue.

Weights are stored [d_out, d_in] (reference/HF layout, ops.h:651 comment:
"weights stored (d_out, d_in) so every dot is contiguous") so the same
QTensor serves both paths.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from tinyllama_tpu.quant.codec import QTensor, dequantize

Weight = Union[jnp.ndarray, QTensor]


def cpu_safe_operand(x: jnp.ndarray) -> jnp.ndarray:
    """XLA:CPU's thunk runtime has no bf16/f16 GEMM with an f32 output
    (B > 1 batches raise UNIMPLEMENTED DotThunk; B = 1 takes a GEMV path
    that works). On CPU, upcast sub-f32 dot operands to f32 — bit-equal
    there, since the CPU backend evaluates sub-f32 dots in f32 anyway.
    On TPU this must never fire: bf16 operands are MXU-native and the
    upcast would double the HBM traffic of every dot."""
    if jax.default_backend() != "tpu" and x.dtype in (
        jnp.bfloat16, jnp.float16
    ):
        return x.astype(jnp.float32)
    return x


def matmul_precision(dtype) -> jax.lax.Precision:
    """f32 operands must use HIGHEST on TPU: the DEFAULT precision lowers
    f32 matmuls to bf16 MXU passes, whose rounding depends on the operand
    shapes — which would break the prefill≡decode invariant at f32. f16
    operands too: bf16 has 3 fewer mantissa bits, so DEFAULT would round
    the inputs (the reference's fp16 mode computes fp16 dots in full f32,
    ops.h:140-174 — parity needs exact-input matmuls). bf16 operands are
    already exact-input/f32-accumulate at DEFAULT."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype in (jnp.float32, jnp.float16)
        else jax.lax.Precision.DEFAULT
    )


def _dequant_matmul(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    """jnp fallback: dequantize (XLA fuses into the dot operand) + matmul.
    Handles both storage layouts; f32 accumulator output."""
    wd = dequantize(w, dtype=x.dtype)
    sub = "...k,kn->...n" if w.layout == "kn" else "...k,nk->...n"
    return jnp.einsum(
        sub, cpu_safe_operand(x), cpu_safe_operand(wd),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    )


def _slice_layer(w: QTensor, layer) -> QTensor:
    return QTensor(w.data[layer], w.scales[layer], w.kind, w.layout)


def linear(
    x: jnp.ndarray, w: Weight, use_pallas: bool = False, layer=None,
    aq8: bool = False,
) -> jnp.ndarray:
    """x [..., d_in] @ w[d_out, d_in]^T -> [..., d_out] in x.dtype.

    `layer` (traced scalar) selects one layer of a layer-stacked quantized
    weight; the Pallas path indexes it inside the kernel's DMA descriptors
    so the stacked array is never sliced/copied in HBM.
    """
    if isinstance(w, QTensor):
        if use_pallas:
            from tinyllama_tpu.ops.pallas.qmatmul import qmatmul

            return qmatmul(x, w, layer=layer, aq8=aq8)
        if layer is not None:
            w = _slice_layer(w, layer)
        return _dequant_matmul(x, w).astype(x.dtype)
    return jnp.einsum(
        "...k,nk->...n",
        cpu_safe_operand(x),
        cpu_safe_operand(w.astype(x.dtype)),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    ).astype(x.dtype)


def linear_f32_out(
    x: jnp.ndarray, w: Weight, use_pallas: bool = False, aq8: bool = False
) -> jnp.ndarray:
    """Like `linear` but keeps the f32 accumulator as the result dtype.

    Used for the lm_head (logits are always f32 in the reference,
    gten/modules.cpp:65-81) without paying an f32-operand matmul: sub-f32
    activations stay in their dtype on the MXU and accumulate in f32.
    """
    if isinstance(w, QTensor):
        if use_pallas:
            from tinyllama_tpu.ops.pallas.qmatmul import qmatmul

            return qmatmul(x, w, out_dtype=jnp.float32, aq8=aq8)
        return _dequant_matmul(x, w)
    return jnp.einsum(
        "...k,nk->...n",
        cpu_safe_operand(x),
        cpu_safe_operand(w.astype(x.dtype)),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    )


def embedding_lookup(tokens: jnp.ndarray, table: Weight, dtype) -> jnp.ndarray:
    """Token embedding: indexed row gather from a dense or quantized table.

    Parity with ops::token_embed (ops.h:514-564); for quantized tables the
    reference dequantizes looked-up rows — here we gather the packed rows
    and scales first, then dequantize only the gathered rows.
    """
    if isinstance(table, QTensor):
        assert table.layout == "nk", "embedding tables must be row-major"
        rows = QTensor(
            data=table.data[tokens], scales=table.scales[tokens], kind=table.kind
        )
        return dequantize(rows, dtype=dtype)
    return table[tokens].astype(dtype)
