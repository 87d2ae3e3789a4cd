"""Fused dequantize + matmul Pallas kernel (the MXU hot path).

TPU-native replacement for the reference's SIMD dequant dot-product loops
(/root/reference/gten/ops.h:224-479: vec_dot_product_q8 / _q8_q4 with AVX
`_mm_madd_epi16`, dispatched from the OpenMP matmul ops.h:613-670). On TPU
the weight matrix stays packed in HBM (int8, or nibble-packed int4, plus
f32-of-f16 block scales), tiles stream HBM->VMEM through Pallas's
pipeline, and dequantization happens in-register feeding the MXU — the
full f32/bf16 weight matrix never exists anywhere.

Layout: weights use the QTensor "kn" (K-major) layout (quant/codec.py) —
data [K, N] (q8) / [K//2, N] (q4), scales [K//32, N] — so with N in the
lane dimension every dequant step is a *sublane* operation:

  * scale expansion [BK//32, BN] -> [BK, BN] is a sublane broadcast +
    reshape (each scale row covers its 32 following K-rows) — no lane
    shuffles, no gather, no matmul (an earlier [N, K]-layout kernel spent
    ~30x the decode-matmul FLOPs expanding scales via a one-hot MXU dot),
  * q4 nibble unpacking is arithmetic shift + mask + a sublane concat
    within KN_GROUP groups (codec._pack_q4_kn's planar layout),
  * the MXU dot is a plain [BM, BK] x [BK, BN] f32-accumulating matmul.

Grid is (M/BM, N/BN, K/BK) with K innermost; the f32 output block lives in
VMEM across the K loop as the accumulator. Ragged N (e.g. n_vocab=32003)
relies on Pallas's masked boundary blocks: garbage in out-of-range
*columns* only ever affects dropped outputs because K (the contraction)
is never ragged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyllama_tpu.quant.codec import BLOCK_SIZE, KN_GROUP, Q4_OFFSET, QTensor


def _qmm_kernel(*refs, kind: str, compute_dtype):
    # with layer indexing the scalar-prefetch ref is prepended; it is only
    # consumed by the BlockSpec index maps
    x_ref, w_ref, s_ref, o_ref = refs[-4:]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[:]
    bn = w.shape[-1]
    if kind == "q8":
        bk = w.shape[0]
        vals = w.astype(jnp.float32)
    else:  # q4: [BK//2, BN] planar nibble groups of KN_GROUP K-rows
        bk = w.shape[0] * 2
        # packed bytes are stored int8 (Mosaic has no uint8 casts) and
        # widened to i32 before the shift (no i8 vector shifts either);
        # arithmetic shift + mask recovers both nibbles regardless of sign
        w32 = w.astype(jnp.int32).reshape(bk // KN_GROUP, KN_GROUP // 2, bn)
        hi = (w32 >> 4) & 0x0F
        lo = w32 & 0x0F
        vals = (
            jnp.concatenate([hi, lo], axis=1)
            .reshape(bk, bn)
            .astype(jnp.float32)
            - float(Q4_OFFSET)
        )

    # [BK//32, BN] -> [BK, BN]: broadcast each scale row over its 32 K-rows
    s = s_ref[:]
    sexp = jnp.broadcast_to(
        s[:, None, :], (bk // BLOCK_SIZE, BLOCK_SIZE, bn)
    ).reshape(bk, bn)

    w_deq = (vals * sexp).astype(compute_dtype)
    o_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_deq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


#: VMEM budget for one weight-data tile (double-buffered by the pipeline).
_DATA_TILE_BYTES = 512 * 1024


def _pick_bn(N: int) -> int:
    """Lane-dim tile: full N (rounded to the 128-lane quantum) up to 2048.
    Wide tiles make every DMA row a >=2KB contiguous run — the difference
    between ~300 GB/s and near-peak HBM streaming on v5e."""
    return min(2048, (N + 127) // 128 * 128)


def _pick_bk(K: int, bn: int, kind: str) -> int:
    """Largest multiple of 64 dividing K whose packed data tile fits the
    VMEM budget."""
    denom = 2 if kind == "q4" else 1
    best = 0
    for bk in range(64, K + 1, 64):
        if K % bk == 0 and (bk // denom) * bn <= _DATA_TILE_BYTES:
            best = bk
    if not best:
        raise ValueError(f"K={K} not tileable (needs K % 64 == 0)")
    return best


@functools.partial(
    jax.jit, static_argnames=("kind", "out_dtype", "bm", "bn", "interpret")
)
def _qmatmul_2d(
    x: jnp.ndarray,  # [M, K] compute dtype
    data: jnp.ndarray,  # [K, N] int8 | [K//2, N] int8 (q4 planar)
    scales: jnp.ndarray,  # [K//32, N] f32
    layer: jnp.ndarray | None,  # [1] int32 iff data/scales carry [L, ..]
    kind: str,
    out_dtype,
    bm: int,
    bn: int,
    interpret: bool,
) -> jnp.ndarray:
    """One quantized matmul. When `layer` is given, data/scales keep their
    stacked leading layer axis and the kernel DMAs the selected layer's
    tiles straight from HBM via a scalar-prefetch index map — under a
    lax.scan over layers this avoids XLA materializing a full HBM copy of
    every weight (a dynamic-slice feeding a custom-call cannot fuse, which
    would triple the decode step's weight traffic)."""
    M, K = x.shape
    N = data.shape[-1]
    bn = bn or _pick_bn(N)
    bk = _pick_bk(K, bn, kind)
    bk_rows = bk // 2 if kind == "q4" else bk

    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk)
    kernel = functools.partial(_qmm_kernel, kind=kind, compute_dtype=x.dtype)

    flops = 2 * M * N * K
    bytes_accessed = (
        x.size * x.dtype.itemsize
        + (data.size + scales.size * 4) // (data.shape[0] if layer is not None else 1)
        + M * N * 4
    )
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
    )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    out_shape = jax.ShapeDtypeStruct((M, N), jnp.float32)

    if layer is None:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk_rows, bn), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // BLOCK_SIZE, bn), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(x, data, scales)
        return out.astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k, li: (m, k)),
            pl.BlockSpec((None, bk_rows, bn), lambda m, n, k, li: (li[0], k, n)),
            pl.BlockSpec((None, bk // BLOCK_SIZE, bn),
                         lambda m, n, k, li: (li[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, li: (m, n)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )(layer, x, data, scales)
    return out.astype(out_dtype)


def qmatmul(
    x: jnp.ndarray,
    w: QTensor,
    out_dtype=None,
    layer: jnp.ndarray | None = None,
    bm: int | None = None,
    bn: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [..., K] @ dequant(w) -> [..., N] for a "kn"-layout QTensor.

    When `layer` (scalar int32) is given, w is layer-stacked ([L, ...])
    and the kernel reads only layer `layer`'s tiles from HBM.
    out_dtype defaults to x.dtype (linear) — pass jnp.float32 for logits.
    """
    assert w.layout == "kn", "qmatmul requires the K-major kernel layout"
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

    li = None if layer is None else jnp.reshape(layer, (1,)).astype(jnp.int32)
    out = _qmatmul_2d(
        x2, w.data, w.scales, li, w.kind, out_dtype, bm, bn, interpret
    )
    if pad_m:
        out = out[:M]
    N = w.data.shape[-1]
    return out.reshape(*lead, N)
