"""Fused dequantize + matmul Pallas kernel (the MXU hot path).

TPU-native replacement for the reference's SIMD dequant dot-product loops
(/root/reference/gten/ops.h:224-479: vec_dot_product_q8 / _q8_q4 with AVX
`_mm_madd_epi16`, dispatched from the OpenMP matmul ops.h:613-670). On TPU
the weight matrix stays packed in HBM (int8, or group-planar packed int4 +
f32-of-f16 block scales), tiles stream HBM->VMEM through Pallas's pipeline,
and dequantization happens in-register feeding the MXU — the full f32/bf16
weight matrix never exists anywhere.

Design notes:
  * grid (M/BM, N/BN, K/BK), K innermost; the f32 output block lives in
    VMEM across the K loop as the accumulator.
  * q4 K-tiles equal one packing group (quant/codec.py q4_group_size), so a
    packed tile [BN, BK//2] unpacks to [BN, BK] with two vector ops and a
    concat — no lane interleaving, both nibble planes + scales are
    tile-local.
  * per-block scales expand [BN, BK//32] -> [BN, BK] with jnp.repeat
    (lane-dim broadcast+reshape). Dequant computes int->f32 * scale in f32
    then rounds to the compute dtype, exactly matching the jnp fallback
    (quant/codec.py dequantize), so kernel and fallback are bit-identical.
  * ragged N (e.g. n_vocab=32003) relies on Pallas's masked boundary
    blocks: garbage in out-of-range *columns* only ever affects dropped
    outputs because K (the contraction) is never ragged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyllama_tpu.quant.codec import BLOCK_SIZE, Q4_OFFSET, QTensor, q4_group_size


def _expand_scales(scales_full: jnp.ndarray, k, bk: int) -> jnp.ndarray:
    """[BN, K//32] f32 (full row) -> [BN, BK] f32: the K-tile k's scales,
    each repeated 32x.

    jnp.repeat lowers to scatter and sub-128-lane dynamic slices don't
    vectorize — neither is Mosaic-friendly. Instead select-and-expand in
    one MXU matmul with a k-dependent 0/1 matrix:
    out[n, j] = sum_b s[n, b] * (b == k*BK/32 + j//32) = s[n, k*BK/32+j//32]
    — exact (one nonzero per column)."""
    nblk_total = scales_full.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (nblk_total, bk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nblk_total, bk), 1)
    expand = (row == k * (bk // BLOCK_SIZE) + col // BLOCK_SIZE)
    # HIGHEST: at DEFAULT the MXU truncates the f32 scales to bf16
    return jnp.dot(
        scales_full, expand.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, *, kind: str, compute_dtype):
    # s_ref holds the n-tile's scales for ALL of K (Mosaic wants >=128 or
    # full-dim last block dims; K//32 tiles are too narrow) — slice by k.
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[:]
    if kind == "q8":
        vals = w.astype(jnp.float32)
        bk = w.shape[1]
    else:  # q4 group-planar: one packing group per K-tile
        # packed bytes are stored int8 (Mosaic has no uint8 casts) and
        # widened to i32 before the shift (no i8 vector shifts either);
        # arithmetic shift + mask recovers both nibbles regardless of sign
        w32 = w.astype(jnp.int32)
        hi = ((w32 >> 4) & 0x0F).astype(jnp.float32)
        lo = (w32 & 0x0F).astype(jnp.float32)
        vals = jnp.concatenate([hi, lo], axis=1) - float(Q4_OFFSET)
        bk = w.shape[1] * 2

    w_deq = (vals * _expand_scales(s_ref[:], k, bk)).astype(compute_dtype)
    o_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_deq,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pick_bk(K: int, kind: str) -> int:
    if kind == "q4":
        return q4_group_size(K)  # tile == packing group
    for bk in (512, 256, 128, 64, 32):
        if K % bk == 0:
            return bk
    raise ValueError(f"K={K} not tileable")


@functools.partial(
    jax.jit, static_argnames=("kind", "out_dtype", "bm", "bn", "interpret")
)
def _qmatmul_2d(
    x: jnp.ndarray,  # [M, K] compute dtype
    data: jnp.ndarray,  # [N, K] int8 | [N, K//2] uint8
    scales: jnp.ndarray,  # [N, K//32] f32
    kind: str,
    out_dtype,
    bm: int,
    bn: int,
    interpret: bool,
) -> jnp.ndarray:
    M, K = x.shape
    N = data.shape[0]
    bk = _pick_bk(K, kind)
    bk_packed = bk // 2 if kind == "q4" else bk

    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk)
    kernel = functools.partial(_qmm_kernel, kind=kind, compute_dtype=x.dtype)

    flops = 2 * M * N * K
    bytes_accessed = (
        x.size * x.dtype.itemsize
        + data.size
        + scales.size * 4
        + M * N * 4
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk_packed), lambda m, n, k: (n, k),
                         memory_space=pltpu.VMEM),
            # full-K scales per n-tile (sliced by k inside the kernel)
            pl.BlockSpec((bn, K // BLOCK_SIZE), lambda m, n, k: (n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, data, scales)
    return out.astype(out_dtype)


def qmatmul(
    x: jnp.ndarray,
    w: QTensor,
    out_dtype=None,
    bm: int | None = None,
    bn: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [..., K] @ dequant(w)[N, K]^T -> [..., N].

    out_dtype defaults to x.dtype (linear) — pass jnp.float32 for logits.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype
    *lead, K = x.shape
    M = 1
    for s in lead:
        M *= s
    x2 = x.reshape(M, K)

    if bm is None:
        bm = 8 if M <= 8 else (128 if M <= 128 else 256)
    pad_m = (-M) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))

    out = _qmatmul_2d(
        x2, w.data, w.scales, w.kind, out_dtype, bm, bn, interpret
    )
    if pad_m:
        out = out[:M]
    N = w.data.shape[0]
    return out.reshape(*lead, N)
