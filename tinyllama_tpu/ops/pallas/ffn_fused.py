"""Fused decode FFN: gate/up matmuls + SwiGLU + down matmul, one kernel.

The reference runs SwiGLU as four separate ops over activation buffers
(gten/modules.cpp:238-247: gate matmul, up matmul, silu_inplace,
mul_inplace, down matmul). The unfused TPU port costs two Pallas launches
plus XLA glue per layer; at decode (weight-bound, ~40 us of tile
streaming) the fixed per-call overhead and glue are a measurable slice
of every token. This kernel runs the whole FFN as ONE pallas_call using
a segmented grid:

  phase GU  (t < N_GU): for each gate/up column tile, accumulate the
      q4/q8 blockdot over K-tiles of the normed input; when an (i)th
      up-tile finishes, write silu(gate_i) * up_i into the hidden-state
      scratch (the [bm, F] intermediate never touches HBM).
  phase DOWN (t >= N_GU): accumulate the down matmul over K-tiles whose
      x operand is the scratch itself.

Operands inactive in a phase keep a clamped (repeated) block index, so
their DMAs are skipped — the multi-phase grid streams exactly the same
weight bytes as the two separate calls, minus one launch/prologue and
all the intermediate HBM round-trips.

Decode-only (bm <= 8; the prefill path keeps the big-M tile-dequant
kernels) and shape-gated: F % bn == 0, D <= 2048. Falls back to the
separate calls otherwise (ops/linear.py path in models/llama.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: fused decode-layer kernels cover latency (blockdot, M <= 8) and
#: serving (tile-dequant, M <= 32) batch shapes; beyond that the
#: separate prefill kernels win
_FUSED_M = 32

from tinyllama_tpu.ops.pallas.qmatmul import (
    _SMALL_M, _load_scales, _pick_bk, _pick_bn,
)
from tinyllama_tpu.quant.codec import BLOCK_SIZE, KN_GROUP, Q4_OFFSET, QTensor


def _rms_normed(xf: jnp.ndarray, w: jnp.ndarray, eps: float,
                inside: bool) -> jnp.ndarray:
    """In-kernel f32 rms_norm matching ops/norms.py exactly (both eps
    conventions: gten adds eps outside the sqrt, HF inside)."""
    ms = jnp.mean(xf * xf, axis=1, keepdims=True)
    if inside:
        nrm = xf * jax.lax.rsqrt(ms + eps)
    else:
        nrm = xf / (jnp.sqrt(ms) + eps)
    return nrm * w


def _block_dot_q(x, w_raw, s, kind: str, compute_dtype):
    """The small-M integer blockdot of qmatmul's decode variant, over
    already-loaded tile VALUES: x [bm, bk], w_raw (packed) [..], s f32
    [bk//32, bn] -> [bm, bn] f32 partial."""
    bn = s.shape[-1]
    acc = None

    def add(a):
        nonlocal acc
        acc = a if acc is None else acc + a

    dims = (((1,), (0,)), ((), ()))
    if kind == "q4g":
        # group-128-scale format (codec.quantize_q4g, pack group 256):
        # each nibble plane holds 128 consecutive K-rows under one
        # scale — one full-depth-128 integer dot per plane (see
        # ops/pallas/qmatmul.py _qmm_kernel_smallm). kn scales arrive
        # duplicated 4x at [bk//32, bn] (row 4b = block b's scale).
        pg2 = 256 if (w_raw.shape[0] * 2) % 256 == 0 else 128
        gb = pg2 // 2
        m_hi = jnp.asarray(-16, jnp.int8)
        m_lo = jnp.asarray(0x0F, jnp.int8)
        s16 = s * (1.0 / 16.0)
        for g in range(w_raw.shape[0] // gb):
            rows = w_raw[g * gb:(g + 1) * gb]
            hi16 = (rows & m_hi).astype(compute_dtype)  # 16*(v_hi-8)
            lo = (rows & m_lo).astype(compute_dtype)
            xh = x[:, g * pg2: g * pg2 + gb]
            xl = x[:, g * pg2 + gb:(g + 1) * pg2]
            sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
            suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
            ph = jax.lax.dot_general(
                xh, hi16, dims, preferred_element_type=jnp.float32,
            )
            plo = jax.lax.dot_general(
                xl, lo, dims, preferred_element_type=jnp.float32,
            )
            sh = (pg2 // BLOCK_SIZE) * g
            sl = sh + 4 if pg2 == 256 else sh
            add(ph * s16[sh].reshape(1, bn) + sumh * s[sh].reshape(1, bn))
            add((plo - 7.0 * suml) * s[sl].reshape(1, bn))
    elif kind == "q8":
        nblk = w_raw.shape[0] // BLOCK_SIZE
        for b in range(nblk):
            wb = w_raw[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
            xb = x[:, b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
            pb = jax.lax.dot_general(
                xb, wb.astype(compute_dtype), dims,
                preferred_element_type=jnp.float32,
            )
            add(pb * s[b].reshape(1, bn))
    else:
        # biased-hi q4 packing (quant/codec.py _pack_q4_kn): AND-only
        # int8 unpack; x16/offset algebra folds into the block scales
        # (see ops/pallas/qmatmul.py _qmm_kernel_smallm)
        half = KN_GROUP // 2
        m_hi = jnp.asarray(-16, jnp.int8)
        m_lo = jnp.asarray(0x0F, jnp.int8)
        s16 = s * (1.0 / 16.0)
        for g in range(w_raw.shape[0] // half):
            rows = w_raw[g * half:(g + 1) * half]
            hi16 = (rows & m_hi).astype(compute_dtype)  # 16*(v_hi-8)
            lo = (rows & m_lo).astype(compute_dtype)
            xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
            xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
            sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
            suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
            ph = jax.lax.dot_general(
                xh, hi16, dims, preferred_element_type=jnp.float32,
            )
            plo = jax.lax.dot_general(
                xl, lo, dims, preferred_element_type=jnp.float32,
            ) - float(Q4_OFFSET) * suml
            add(ph * s16[2 * g].reshape(1, bn))
            add(sumh * s[2 * g].reshape(1, bn))
            add(plo * s[2 * g + 1].reshape(1, bn))
    return acc


def _tile_dot_q(x, w_raw, s, kind: str, compute_dtype):
    """Throughput body for the fused kernels at serving M (8 < M <= 32):
    dequantize the tile once (qmatmul._dequant_tile — the bigm variant's
    body) and run one MXU dot. Measured at M=32 gate-up shapes the
    dequant body is ~1.4x faster than the integer blockdot whose
    post-dot scale cost grows with M (31 vs 43 us/call)."""
    from tinyllama_tpu.ops.pallas.qmatmul import _dequant_tile

    return jax.lax.dot_general(
        x, _dequant_tile(w_raw, s, kind, compute_dtype),
        dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pick_dot_q(bm: int):
    """Dot body by M-tile: integer blockdot at latency M, tile dequant
    at serving M (same crossover as qmatmul's _SMALL_M)."""
    return _block_dot_q if bm <= _SMALL_M else _tile_dot_q


def _ffn_fused_kernel(
    *refs,
    kind: str, compute_dtype, n_i: int, n_k: int, n_kd: int,
    bk_gu: int, bk_d: int, bn_gu: int, F: int,
    eps: float = 0.0, inside: bool = False,
    dot_q=_block_dot_q,
):
    """Two layouts (fuse_norm selected by ref count):

    plain: li, x(normed), gu, gus, wd, wds -> o | gacc, uacc, act
    normed+residual: li, x(UNNORMED), nw, gu, gus, wd, wds -> o
        | gacc, uacc, act, nx — rms_norm lands in the nx scratch on the
        first step and the down accumulator is seeded with x (residual).
    """
    if len(refs) == 10:
        li_ref, x_ref, gu_ref, gus_ref, wd_ref, wds_ref, o_ref = refs[:7]
        gacc, uacc, act = refs[7:]
        nw_ref = nx = None
    else:
        (li_ref, x_ref, nw_ref, gu_ref, gus_ref, wd_ref, wds_ref,
         o_ref) = refs[:8]
        gacc, uacc, act, nx = refs[8:]
    t = pl.program_id(0)
    N_GU = n_i * 2 * n_k
    sub = t % (2 * n_k)
    k = t % n_k
    i = t // (2 * n_k)

    in_gu = t < N_GU
    is_gate = in_gu & (sub < n_k)
    is_up = in_gu & (sub >= n_k)

    if nx is not None:
        @pl.when(t == 0)
        def _():
            nx[:] = _rms_normed(x_ref[:].astype(jnp.float32), nw_ref[:],
                                eps, inside)

    def x_slice(k0, bk):
        if nx is None:
            return x_ref[:, pl.ds(k0, bk)]
        return nx[:, pl.ds(k0, bk)].astype(compute_dtype)

    @pl.when(is_gate)
    def _():
        @pl.when(k == 0)
        def _():
            gacc[:] = jnp.zeros_like(gacc)

        x = x_slice(k * bk_gu, bk_gu)
        s = _load_scales(gus_ref)
        gacc[:] += dot_q(x, gu_ref[:], s, kind, compute_dtype)

    @pl.when(is_up)
    def _():
        @pl.when(k == 0)
        def _():
            uacc[:] = jnp.zeros_like(uacc)

        x = x_slice(k * bk_gu, bk_gu)
        s = _load_scales(gus_ref)
        uacc[:] += dot_q(x, gu_ref[:], s, kind, compute_dtype)

        @pl.when(k == n_k - 1)
        def _():
            g = gacc[:]
            silu = g / (1.0 + jnp.exp(-g))
            act[:, pl.ds(i * bn_gu, bn_gu)] = silu * uacc[:]

    @pl.when(~in_gu)
    def _():
        kd = t - N_GU

        @pl.when(kd == 0)
        def _():
            if nx is None:
                o_ref[:] = jnp.zeros_like(o_ref)
            else:
                # the residual seeds the down accumulator: out = x + ffn
                o_ref[:] = x_ref[:].astype(jnp.float32)

        xk = act[:, pl.ds(kd * bk_d, bk_d)].astype(compute_dtype)
        s = _load_scales(wds_ref)
        o_ref[:] += dot_q(xk, wd_ref[:], s, kind, compute_dtype)


def ffn_fused_eligible(cfg, wgu, wdown, M: int) -> bool:
    if not (isinstance(wgu, QTensor) and isinstance(wdown, QTensor)):
        return False
    if wgu.layout != "kn" or wdown.layout != "kn":
        return False
    if M > _FUSED_M or cfg.n_embd > 2048:
        return False
    bn_gu = _pick_bn(cfg.n_ffn)
    return cfg.n_ffn % bn_gu == 0 and 2 * cfg.n_ffn % bn_gu == 0


@functools.partial(
    jax.jit, static_argnames=("kind", "D", "F", "bm", "interpret")
)
def _ffn_fused(
    x,  # [bm, D] compute dtype (normed hidden)
    gu_data, gu_scales,  # stacked [L, ...]
    wd_data, wd_scales,
    li,  # [1] int32
    kind: str, D: int, F: int, bm: int, interpret: bool,
):
    compute_dtype = x.dtype
    bn_gu = _pick_bn(F)
    n_i = F // bn_gu
    bk_gu = _pick_bk(D, bn_gu, kind)
    n_k = D // bk_gu
    bk_d = _pick_bk(F, D, kind)
    n_kd = F // bk_d
    N_GU = n_i * 2 * n_k
    n_steps = N_GU + n_kd
    denom = 2 if kind in ("q4", "q4g") else 1

    def gu_map(t, li):
        tt = jnp.minimum(t, N_GU - 1)
        i = tt // (2 * n_k)
        which = (tt % (2 * n_k)) // n_k
        k = tt % n_k
        return (li[0], k, which * n_i + i)

    def wd_map(t, li):
        kd = jnp.clip(t - N_GU, 0, n_kd - 1)
        return (li[0], kd, 0)

    kernel = functools.partial(
        _ffn_fused_kernel, kind=kind, compute_dtype=compute_dtype, n_i=n_i,
        n_k=n_k, n_kd=n_kd, bk_gu=bk_gu, bk_d=bk_d, bn_gu=bn_gu, F=F,
        dot_q=_pick_dot_q(bm),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda t, li: (0, 0)),
            pl.BlockSpec((None, bk_gu // denom, bn_gu), gu_map),
            pl.BlockSpec((None, bk_gu // BLOCK_SIZE, bn_gu), gu_map),
            pl.BlockSpec((None, bk_d // denom, D), wd_map),
            pl.BlockSpec((None, bk_d // BLOCK_SIZE, D), wd_map),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda t, li: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn_gu), jnp.float32),  # gate accumulator
            pltpu.VMEM((bm, bn_gu), jnp.float32),  # up accumulator
            pltpu.VMEM((bm, F), jnp.float32),  # silu(gate)*up hidden
        ],
    )
    bytes_w = (
        (gu_data.size + wd_data.size) // gu_data.shape[0]
        + (gu_scales.size + wd_scales.size) * 2 // gu_scales.shape[0]
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (2 * F * D + F * D),
            bytes_accessed=bytes_w,
            transcendentals=bm * F,
        ),
        interpret=interpret,
    )(li, x, gu_data, gu_scales, wd_data, wd_scales)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "D", "F", "bm", "eps", "inside", "interpret"),
)
def _ffn_fused_normed(
    x,  # [bm, D] UNNORMED hidden, compute dtype
    nw,  # [L, 1, D] f32 ffn_norm weight (layer-indexed via li)
    gu_data, gu_scales,
    wd_data, wd_scales,
    li,
    kind: str, D: int, F: int, bm: int, eps: float, inside: bool,
    interpret: bool,
):
    """Normed+residual variant: returns x + down(silu(gate(n)) * up(n))
    where n = rms_norm(x), all in ONE segmented-grid call."""
    compute_dtype = x.dtype
    bn_gu = _pick_bn(F)
    n_i = F // bn_gu
    bk_gu = _pick_bk(D, bn_gu, kind)
    n_k = D // bk_gu
    bk_d = _pick_bk(F, D, kind)
    n_kd = F // bk_d
    N_GU = n_i * 2 * n_k
    n_steps = N_GU + n_kd
    denom = 2 if kind in ("q4", "q4g") else 1

    def gu_map(t, li):
        tt = jnp.minimum(t, N_GU - 1)
        i = tt // (2 * n_k)
        which = (tt % (2 * n_k)) // n_k
        k = tt % n_k
        return (li[0], k, which * n_i + i)

    def wd_map(t, li):
        kd = jnp.clip(t - N_GU, 0, n_kd - 1)
        return (li[0], kd, 0)

    kernel = functools.partial(
        _ffn_fused_kernel, kind=kind, compute_dtype=compute_dtype, n_i=n_i,
        n_k=n_k, n_kd=n_kd, bk_gu=bk_gu, bk_d=bk_d, bn_gu=bn_gu, F=F,
        eps=eps, inside=inside, dot_q=_pick_dot_q(bm),
    )
    # stacked [L, 1, D] norm weights are layer-indexed in-kernel via a
    # None leading block dim (see decode_fused._norm_qkv — Mosaic needs
    # the block's last two dims to equal the array's). Clamp for a
    # single-row nw with nonzero li: an out-of-bounds block index is a
    # device fault when compiled.
    nw_rows = nw.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda t, li: (0, 0)),
            pl.BlockSpec(
                (None, 1, D),
                lambda t, li: (jnp.minimum(li[0], nw_rows - 1), 0, 0),
            ),
            pl.BlockSpec((None, bk_gu // denom, bn_gu), gu_map),
            pl.BlockSpec((None, bk_gu // BLOCK_SIZE, bn_gu), gu_map),
            pl.BlockSpec((None, bk_d // denom, D), wd_map),
            pl.BlockSpec((None, bk_d // BLOCK_SIZE, D), wd_map),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda t, li: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn_gu), jnp.float32),  # gate accumulator
            pltpu.VMEM((bm, bn_gu), jnp.float32),  # up accumulator
            pltpu.VMEM((bm, F), jnp.float32),  # silu(gate)*up hidden
            pltpu.VMEM((bm, D), jnp.float32),  # normed input
        ],
    )
    bytes_w = (
        (gu_data.size + wd_data.size) // gu_data.shape[0]
        + (gu_scales.size + wd_scales.size) * 2 // gu_scales.shape[0]
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (2 * F * D + F * D),
            bytes_accessed=bytes_w,
            transcendentals=bm * F,
        ),
        interpret=interpret,
    )(li, x, nw, gu_data, gu_scales, wd_data, wd_scales)


def ffn_fused(
    h: jnp.ndarray,  # [B, T, D] normed input, compute dtype
    wgu: QTensor,  # stacked [L, ...] kn
    wdown: QTensor,
    li: jnp.ndarray,
    cfg,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused SwiGLU FFN for decode; returns [B, T, D] in h.dtype.

    Caller must have checked ffn_fused_eligible."""
    B, T, D = h.shape
    M = B * T
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x2 = h.reshape(M, D)
    bm = _SMALL_M if M <= _SMALL_M else -(-M // 8) * 8
    if M < bm:
        x2 = jnp.pad(x2, ((0, bm - M), (0, 0)))
    out = _ffn_fused(
        x2, wgu.data, wgu.scales, wdown.data, wdown.scales,
        jnp.reshape(li, (1,)).astype(jnp.int32),
        wgu.kind, D, cfg.n_ffn, bm, interpret,
    )
    return out[:M].reshape(B, T, D).astype(h.dtype)


def ffn_fused_normed(
    x: jnp.ndarray,  # [B, T, D] UNNORMED block state, compute dtype
    norm_w: jnp.ndarray,  # [L, D] stacked (or [D] single-layer) f32
    wgu: QTensor,
    wdown: QTensor,
    li: jnp.ndarray,
    cfg,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x + FFN(rms_norm(x)) in one call; returns [B, T, D] in x.dtype.

    Caller must have checked ffn_fused_eligible. A stacked [L, D] norm_w
    is layer-indexed inside the kernel via the prefetched scalar."""
    B, T, D = x.shape
    M = B * T
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x2 = x.reshape(M, D)
    bm = _SMALL_M if M <= _SMALL_M else -(-M // 8) * 8
    if M < bm:
        x2 = jnp.pad(x2, ((0, bm - M), (0, 0)))
    nw = norm_w.astype(jnp.float32)
    nw = nw.reshape(-1, 1, D)  # [L, 1, D]; single-layer [D] -> [1, 1, D]
    out = _ffn_fused_normed(
        x2, nw,
        wgu.data, wgu.scales, wdown.data, wdown.scales,
        jnp.reshape(li, (1,)).astype(jnp.int32),
        wgu.kind, D, cfg.n_ffn, bm, float(cfg.norm_eps),
        bool(cfg.norm_eps_inside_sqrt), interpret,
    )
    return out[:M].reshape(B, T, D).astype(x.dtype)
