"""Fused dequantize + matmul Pallas kernels (the MXU hot path).

TPU-native replacement for the reference's SIMD dequant dot-product loops
(/root/reference/gten/ops.h:224-479: vec_dot_product_q8 / _q8_q4 with AVX
`_mm_madd_epi16`, dispatched from the OpenMP matmul ops.h:613-670). On TPU
the weight matrix stays packed in HBM (int8, or nibble-packed int4, plus
f32-of-f16 block scales), tiles stream HBM->VMEM through Pallas's
pipeline, and dequantization happens in-register feeding the MXU — the
full f32/bf16 weight matrix never exists anywhere.

Layout: weights use the QTensor "kn" (K-major) layout (quant/codec.py) —
data [K, N] (q8) / [K//2, N] (q4), scales [K//32, N] — so with N in the
lane dimension every dequant step is a *sublane* operation: nibble planes
are static row slices, scale rows broadcast along lanes. No lane
shuffles, no gathers anywhere.

Two kernel bodies, chosen by the M-tile:

* decode (bm <= 8, the latency path): per 32-block *integer-valued* dots
  with the block scale applied to the [bm, bn] partial product AFTER the
  MXU — at bm=8 that is 32x fewer scale multiplies than dequantizing
  [bk, bn] weights, so the VPU stops being the bottleneck and the kernel
  tracks the HBM streaming rate. The q4 +7 offset never touches the
  weights either: sum_k x*(v-7)*s == sum_blocks s*(x.v) - 7*sum_blocks
  s*blocksum(x), and the correction term rides a tiny [bm, K/32] MXU dot.
  This mirrors the reference's block-int accumulation structure
  (ops.h:249-287) and is *more* precise than bf16-dequantized weights.
* prefill (bm large, the throughput path): dequantize the [bk, bn] tile
  once into bf16 and run one big MXU dot — per-output scaling would cost
  bm/16 VPU ops per weight there, dequant amortizes over all bm rows.

Grid is (M/BM, N/BN, K/BK) with K innermost; the f32 output block lives
in VMEM across the K loop as the accumulator. When `layer` is given the
weights keep their stacked [L, ...] leading axis and the layer is picked
inside the BlockSpec index maps via scalar prefetch — under a lax.scan
over layers this avoids XLA materializing an HBM copy of every layer's
weights per step (a dynamic-slice feeding a custom-call cannot fuse).
Ragged N (e.g. n_vocab=32003) relies on Pallas's masked boundary blocks:
garbage in out-of-range *columns* only affects dropped outputs because K
(the contraction) is never ragged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyllama_tpu.quant.codec import (
    BLOCK_SIZE, KN_GROUP, Q4G_BLOCK, Q4_OFFSET, QTensor,
)

#: decode-variant M-tile bound: at bm <= _SMALL_M post-dot scaling is
#: cheaper than weight dequantization.
_SMALL_M = 8


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _load_scales(s_ref) -> jnp.ndarray:
    """Scale tile -> f32. fp16-stored scales arrive as int16 bit patterns
    (Mosaic rejects f16 refs outright on this stack; the bitcast at the
    call boundary is free) and are reconstructed with integer ops —
    deltas are non-negative by construction (absmax/qmax), so the sign
    bit is always clear; subnormals decode via their exact 2^-24 ulp."""
    s = s_ref[:]
    if s.dtype == jnp.int16:
        v = s.astype(jnp.int32) & 0xFFFF
        exp = v >> 10
        mant = v & 0x3FF
        bits = ((exp + 112) << 23) | (mant << 13)
        val = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return jnp.where(
            exp == 0, mant.astype(jnp.float32) * jnp.float32(2.0 ** -24), val
        )
    return s.astype(jnp.float32)


def _qmm_kernel_smallm(*refs, kind: str, compute_dtype, aq8: bool):
    """Decode variant: integer block dots, scales applied post-MXU.

    With `aq8`, activations quantize to per-32-block int8 in-register
    (delta = absmax/127, exactly the reference's q8 activation scheme,
    ops.h:73-96) and the dots run int8 x int8 -> int32 on the MXU at 2x
    the bf16 weight-load rate — the decode floor drops to the HBM
    streaming rate of the packed weights.
    """
    x_ref, w_ref, s_ref, o_ref = refs[-4:]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]
    s = _load_scales(s_ref)  # [BK//32, BN] f32 (stored f16, exact)
    bn = s.shape[-1]
    acc = jnp.zeros(o_ref.shape, jnp.float32)

    def block_x(sl):
        """-> (x block ready for the dot, its per-row scale or None,
        its per-row block sum for the q4 offset correction)."""
        xb = x[:, sl]
        if not aq8:
            return xb, None, jnp.sum(
                xb.astype(jnp.float32), axis=1, keepdims=True
            )
        xf = xb.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        inv = jnp.where(absmax > 0.0, 127.0 / absmax, 0.0)
        xq = jnp.round(xf * inv).astype(jnp.int8)
        rowsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        return xq, absmax * (1.0 / 127.0), rowsum

    def scaled(pb, sx):
        return pb.astype(jnp.float32) * sx if aq8 else pb

    idot = (((1,), (0,)), ((), ()))

    if kind == "q4g":
        # group-128-scale format (codec.quantize_q4g, pack group 256):
        # each nibble plane holds 128 consecutive K-rows under ONE
        # scale, so every plane is a single depth-128 integer dot at
        # full MXU depth utilization (vs 4 depth-32 passes per 128 rows
        # for q4 — kbench: blockdot overhead over the stream floor
        # halves). Offsets fold into the x window sums as usual:
        #   hi: sum x*(v-7)*s == s/16 * (x.hi16) + s*sum(x)
        #   lo: sum x*(v-7)*s == s * (x.lo) - 7*s*sum(x)
        assert not aq8, "q4g has no aq8 variant (aq8 is a measured dead end)"
        p = w_ref[:]  # int8 [BK//2, BN]
        pg = 256 if (p.shape[0] * 2) % 256 == 0 else 128
        gb = pg // 2  # byte rows per pack group == rows per plane
        m_hi = jnp.asarray(-16, jnp.int8)  # 0xF0 as signed int8
        m_lo = jnp.asarray(0x0F, jnp.int8)
        s16 = s * (1.0 / 16.0)
        for g in range(p.shape[0] // gb):
            rows = p[g * gb:(g + 1) * gb]
            hi16 = (rows & m_hi).astype(compute_dtype)  # 16*(v_hi - 8)
            lo = (rows & m_lo).astype(compute_dtype)    # v_lo
            xh = x[:, g * pg: g * pg + gb]
            xl = x[:, g * pg + gb:(g + 1) * pg]
            sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
            suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
            ph = _dot(xh, hi16, ((1,), (0,)))
            plo = _dot(xl, lo, ((1,), (0,)))
            # duplicated [BK//32, BN] scales: row 4b is block b's scale;
            # group g spans blocks 2g/2g+1 (pg=256) or shares block g
            sh = (pg // BLOCK_SIZE) * g
            sl = sh + 4 if pg == 256 else sh
            acc += ph * s16[sh].reshape(1, bn) + sumh * s[sh].reshape(1, bn)
            acc += (plo - 7.0 * suml) * s[sl].reshape(1, bn)
        o_ref[:] += acc
        return

    if kind == "q8":
        w = w_ref[:]  # [BK, BN] i8
        nblk = w.shape[0] // BLOCK_SIZE
        for b in range(nblk):
            wb = w[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
            xb, sx, _ = block_x(slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE))
            if aq8:
                pb = jax.lax.dot_general(
                    xb, wb, idot, preferred_element_type=jnp.int32
                )
            else:
                pb = _dot(xb, wb.astype(compute_dtype), ((1,), (0,)))
            acc += scaled(pb, sx) * s[b].reshape(1, bn)
    else:  # q4 planar nibble groups of KN_GROUP K-rows, biased-hi packed
        # (codec._pack_q4_kn stores bytes XOR 0x80): byte & 0xF0 read as
        # SIGNED int8 is 16*(v_hi-8) and byte & 0x0F is v_lo — unpacking
        # is one int8 AND per plane, no i32 cast, no shift. The x16 and
        # the offsets fold into post-dot scale algebra:
        #   hi: sum x*(v-7)*s == s/16 * (x.hi16) + s*blocksum(x)
        #   lo: sum x*(v-7)*s == s * (x.lo) - 7*s*blocksum(x)
        p = w_ref[:]  # int8 [BK//2, BN]
        idt = jnp.int8 if aq8 else compute_dtype
        half = KN_GROUP // 2  # rows per nibble plane == one 32-block
        m_hi = jnp.asarray(-16, jnp.int8)  # 0xF0 as signed int8
        m_lo = jnp.asarray(0x0F, jnp.int8)
        s16 = s * (1.0 / 16.0)
        for g in range(p.shape[0] // half):
            rows = p[g * half:(g + 1) * half]
            hi16 = (rows & m_hi).astype(idt)  # == 16*(v_hi - 8)
            lo = (rows & m_lo).astype(idt)    # == v_lo
            xh, sxh, sumh = block_x(
                slice(g * KN_GROUP, g * KN_GROUP + half)
            )
            xl, sxl, suml = block_x(
                slice(g * KN_GROUP + half, (g + 1) * KN_GROUP)
            )
            if aq8:
                ph = jax.lax.dot_general(
                    xh, hi16, idot, preferred_element_type=jnp.int32
                )
                plo = jax.lax.dot_general(
                    xl, lo, idot, preferred_element_type=jnp.int32
                )
                # ph/16 + rowsum == dot(x, v_hi-7); both exact (< 2^24)
                ph = (
                    ph.astype(jnp.float32) * (1.0 / 16.0)
                    + sumh.astype(jnp.float32)
                ) * sxh
                plo = (plo - Q4_OFFSET * suml).astype(jnp.float32) * sxl
                acc += ph * s[2 * g].reshape(1, bn)
                acc += plo * s[2 * g + 1].reshape(1, bn)
            else:
                ph = _dot(xh, hi16, ((1,), (0,)))
                plo = _dot(xl, lo, ((1,), (0,)))
                acc += ph * s16[2 * g].reshape(1, bn)
                acc += sumh * s[2 * g].reshape(1, bn)
                acc += (plo - float(Q4_OFFSET) * suml) * s[
                    2 * g + 1
                ].reshape(1, bn)

    o_ref[:] += acc


def _dequant_tile(w, s, kind: str, compute_dtype):
    """Dequantize one loaded weight tile (packed values `w`, f32 block
    scales `s` [BK//32, BN]) into a [BK, BN] compute-dtype tile — the
    body of the throughput (bigm) matmul variant, shared by the fused
    decode-layer kernels at serving M (8 < M <= 32)."""
    bn = w.shape[-1]
    if kind == "q4g":
        bk = w.shape[0] * 2
        pg = 256 if bk % 256 == 0 else 128
        gb = pg // 2
        # one scale per 128-row block, stored duplicated at [BK//32, BN]
        # (row 4b is block b's scale); pack group g's hi plane is block
        # 2g, its lo plane block 2g+1 (pg=256) or both block g (pg=128)
        sg = s.reshape(bk // pg, pg // BLOCK_SIZE, 1, bn)
        s_hi = sg[:, 0]  # [BK//pg, 1, BN]
        s_lo = sg[:, 4] if pg == 256 else sg[:, 0]
        g8 = w.reshape(bk // pg, gb, bn)
        hi = (g8 & jnp.asarray(-16, jnp.int8)).astype(jnp.float32) * (
            s_hi * (1.0 / 16.0)
        ) + s_hi
        lo = (g8 & jnp.asarray(0x0F, jnp.int8)).astype(jnp.float32) * (
            s_lo
        ) - 7.0 * s_lo
        return (
            jnp.concatenate([hi, lo], axis=1)
            .reshape(bk, bn)
            .astype(compute_dtype)
        )
    if kind == "q8":
        bk = w.shape[0]
        # [BK//32, BN] scales broadcast over each 32-row block (sublanes)
        s3 = s.reshape(bk // BLOCK_SIZE, 1, bn)
        return (
            (w.astype(jnp.float32)
             .reshape(bk // BLOCK_SIZE, BLOCK_SIZE, bn) * s3)
            .reshape(bk, bn)
            .astype(compute_dtype)
        )
    bk = w.shape[0] * 2
    # biased-hi packing (codec._pack_q4_kn): AND-only int8 unpack.
    # The offsets and the /16 fold into per-plane FMAs against
    # prescaled block scales (dequant here is VPU-bound — every op
    # per element is ~2% of the matmul):
    #   hi plane (block 2g):  (hi16/16 + 1) * s  ==  hi16*(s/16) + s
    #   lo plane (block 2g+1): (lo - 7) * s      ==  lo*s - 7s
    s2 = s.reshape(bk // KN_GROUP, 2, 1, bn)
    s_hi = s2[:, 0]  # [BK//64, 1, BN] blocks covering the hi planes
    s_lo = s2[:, 1]
    g8 = w.reshape(bk // KN_GROUP, KN_GROUP // 2, bn)
    hi = (g8 & jnp.asarray(-16, jnp.int8)).astype(jnp.float32) * (
        s_hi * (1.0 / 16.0)
    ) + s_hi
    lo = (g8 & jnp.asarray(0x0F, jnp.int8)).astype(jnp.float32) * (
        s_lo
    ) - 7.0 * s_lo
    return (
        jnp.concatenate([hi, lo], axis=1)
        .reshape(bk, bn)
        .astype(compute_dtype)
    )


def _qmm_kernel_bigm(*refs, kind: str, compute_dtype):
    """Prefill variant: dequantize the tile once, one big MXU dot.

    The f32 accumulator lives in VMEM scratch across the K loop and the
    output block is written once, in the OUTPUT dtype, at the last K
    step — emitting f32 and casting outside costs a full [M, N] HBM
    round-trip per matmul (~2.7 ms per 2048-token prefill)."""
    x_ref, w_ref, s_ref, o_ref, acc_ref = refs[-5:]
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_deq = _dequant_tile(w_ref[:], _load_scales(s_ref), kind,
                          compute_dtype)
    acc_ref[:] += _dot(x_ref[:], w_deq, ((1,), (0,)))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


#: VMEM budget for one weight-data tile (double-buffered by the pipeline).
_DATA_TILE_BYTES = 1024 * 1024


def _pick_bn(N: int) -> int:
    """Lane-dim tile: prefer the largest 128-multiple <= 2048 that divides
    N exactly — even tiles measurably beat a wider tile with a ragged
    (masked) remainder: a half-empty boundary block still costs a full
    grid step and its thin DMA rows stream poorly (wqkv N=2560 decode:
    bn=1280 is ~25% faster than bn=2048+mask). Ragged N falls back to
    2048-wide tiles with Pallas's masked boundary blocks (lm_head's
    n_vocab=32003 has no useful divisor; at 16 tiles the one ragged
    block is ~2% of the stream)."""
    if N >= 2048 and N % 2048 == 0:
        return 2048
    for bn in range(2048, 383, -128):
        if N % bn == 0:
            return bn
    return min(2048, (N + 127) // 128 * 128)


def _pick_bk(K: int, bn: int, kind: str) -> int:
    """Largest K-tile whose packed data tile fits the VMEM budget.

    Legal tiles are multiples of 256 (x-tile lanes need a 128 quantum and
    the [bk//32, bn] scales tile an 8-sublane quantum) or the whole K
    (full-array block dims are always legal)."""
    denom = 2 if kind in ("q4", "q4g") else 1
    group = Q4G_BLOCK if kind == "q4g" else KN_GROUP
    best = 0
    for bk in range(256, K + 1, 256):
        if K % bk == 0 and (bk // denom) * bn <= _DATA_TILE_BYTES:
            best = bk
    if not best:
        if K % group == 0 and (K // denom) * bn <= _DATA_TILE_BYTES:
            return K  # small K: single full-dim tile
        raise ValueError(f"K={K} not tileable (needs K % {group} == 0)")
    return best


@functools.partial(
    jax.jit,
    static_argnames=("kind", "out_dtype", "bm", "bn", "aq8", "interpret"),
)
def _qmatmul_2d(
    x: jnp.ndarray,  # [M, K] compute dtype
    data: jnp.ndarray,  # [K, N] int8 | [K//2, N] int8 (q4 planar)
    scales: jnp.ndarray,  # [K//32, N] f16/f32
    layer: jnp.ndarray | None,  # [1] int32 iff data/scales carry [L, ..]
    kind: str,
    out_dtype,
    bm: int,
    bn: int,
    aq8: bool,
    interpret: bool,
) -> jnp.ndarray:
    M, K = x.shape
    N = data.shape[-1]
    if scales.dtype == jnp.float16:
        # Mosaic rejects f16 operands; ship the bit pattern instead
        scales = jax.lax.bitcast_convert_type(scales, jnp.int16)
    bn = bn or _pick_bn(N)
    bk = _pick_bk(K, bn, kind)
    bk_rows = bk // 2 if kind in ("q4", "q4g") else bk
    small_m = bm <= _SMALL_M

    # Scoped-VMEM stack guard: f32 acc scratch + double-buffered out/x/
    # w/s tiles must fit the 16 MB limit. The per-step linear path never
    # trips this, but a whole-window f32-out matmul (teacher-forced
    # logits over all positions, tools/eval_ppl.py) at bm=512, bn=2048
    # lands at 16.25 MB — halve bm until the stack fits.
    def _stack_bytes(bm_):
        out_b = 4 if jnp.dtype(out_dtype).itemsize == 4 else 2
        return (
            (0 if bm_ <= _SMALL_M else bm_ * bn * 4)  # acc scratch
            + 2 * bm_ * bn * out_b                    # out tiles
            + 2 * bm_ * bk * x.dtype.itemsize         # x tiles
            + 2 * bk_rows * bn                        # weight tiles
            + 2 * (bk // BLOCK_SIZE) * bn * 2         # scale tiles
        )

    while bm > _SMALL_M and _stack_bytes(bm) > (15 << 20):
        bm //= 2

    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk)
    if small_m:
        kernel = functools.partial(
            _qmm_kernel_smallm, kind=kind, compute_dtype=x.dtype, aq8=aq8
        )
        scratch = []
        out_elt = jnp.float32  # [<=8, N] cast outside is free
    else:
        kernel = functools.partial(
            _qmm_kernel_bigm, kind=kind, compute_dtype=x.dtype
        )
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
        out_elt = out_dtype  # written once from the f32 scratch acc

    flops = 2 * M * N * K
    bytes_accessed = (
        x.size * x.dtype.itemsize
        + (data.size + scales.size * scales.dtype.itemsize)
        // (data.shape[0] if layer is not None else 1)
        + M * N * 4
    )
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
    )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    out_shape = jax.ShapeDtypeStruct((M, N), out_elt)

    operands = [x]
    if layer is None:
        in_specs = [
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
        ]
        in_specs += [
            pl.BlockSpec((bk_rows, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((bk // BLOCK_SIZE, bn), lambda m, n, k: (k, n)),
        ]
        operands += [data, scales]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
        return out.astype(out_dtype)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda m, n, k, li: (m, k)),
    ]
    in_specs += [
        pl.BlockSpec((None, bk_rows, bn), lambda m, n, k, li: (li[0], k, n)),
        pl.BlockSpec((None, bk // BLOCK_SIZE, bn),
                     lambda m, n, k, li: (li[0], k, n)),
    ]
    operands += [data, scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, li: (m, n)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )(layer, *operands)
    return out.astype(out_dtype)


def qmatmul(
    x: jnp.ndarray,
    w: QTensor,
    out_dtype=None,
    layer: jnp.ndarray | None = None,
    bm: int | None = None,
    bn: int | None = None,
    aq8: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [..., K] @ dequant(w) -> [..., N] for a "kn"-layout QTensor.

    When `layer` (scalar int32) is given, w is layer-stacked ([L, ...])
    and the kernel reads only layer `layer`'s tiles from HBM. With `aq8`
    the decode variant quantizes activations to block-int8 and runs int8
    MXU dots (the reference's q8-activation mode, tinyllama.cpp:258-265).
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
        # smallest sublane multiple covering M, capped: no padded rows for
        # short prefills (M is already a power-of-two bucket upstream)
        bm = _SMALL_M if M <= _SMALL_M else min(512, (M + 7) // 8 * 8)
    pad_m = (-M) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))

    li = None if layer is None else jnp.reshape(layer, (1,)).astype(jnp.int32)
    out = _qmatmul_2d(
        x2, w.data, w.scales, li, w.kind, out_dtype, bm, bn, aq8, interpret
    )
    if pad_m:
        out = out[:M]
    N = w.data.shape[-1]
    return out.reshape(*lead, N)
