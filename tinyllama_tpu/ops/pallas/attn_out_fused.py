"""Fused decode attention + output projection + residual (B=1).

The b=1 decode hot loop's attention kernel does ~1 us of real work
(fill-pruned tiles over a mostly-empty cache) but pays the full
per-pallas_call fixed cost (~3 us/layer: prologue, scalar-prefetch DMA,
scratch init, output write), and its [H, d] result round-trips HBM just
to be reshaped into the wo matmul's [1, H*d] row. This kernel runs both
phases on one segmented grid:

* phase A (grid steps t < n_s): the heads-merged online-softmax walk
  over the stacked KV cache (same recurrence as
  flash_prefill._decode_heads_kernel), accumulating into VMEM scratch.
* phase B (t >= n_s): the wo integer blockdot + residual, reading the
  attention result STRAIGHT FROM SCRATCH. No relayout is needed: wo's
  "kn" packing groups (quant/codec.py KN_GROUP = 64) tile the K axis in
  runs of 64 = whole multiples of d_head, so K-block b of wo contracts
  exactly against the static scratch slice
  ``attn[(32*b)//d, (32*b)%d : (32*b)%d + 32]`` — an m=1 row dot per
  32-block, the same count of MXU passes as the unfused m<=8 kernel.

The reference's counterpart is its single C++ pass per layer
(/root/reference/gten/ops.h:930-1133 qkv_attn + out-proj matmul); this
matches that granularity on TPU for the attention half of the block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyllama_tpu.ops.pallas.flash_prefill import _tile
from tinyllama_tpu.ops.pallas.qmatmul import _load_scales, _pick_bk, _pick_bn
from tinyllama_tpu.ops.pallas.softmax_update import (
    NEG_INF,
    online_update_batch,
)
from tinyllama_tpu.quant.codec import BLOCK_SIZE, KN_GROUP, Q4_OFFSET, QTensor


def _wo_tile_dot(attn_bf, wd, s, kind: str, compute_dtype, k0: int):
    """One wo K-tile's contribution: [1, bn] f32.

    attn_bf: [H, d] compute-dtype attention result (VMEM scratch).
    wd: the weight tile ([bk, bn] int8 q8 | [bk//2, bn] biased-hi q4).
    k0: this tile's first K row (static per grid step via the loop
    below being traced once — passed as the tile index times bk).
    """
    bn = s.shape[-1]
    d = attn_bf.shape[-1]

    def xrow(k_start: int, width: int):
        r, c = (k_start // d), (k_start % d)
        return attn_bf[r:r + 1, c:c + width]

    acc = jnp.zeros((1, bn), jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    if kind == "q4g":
        # group-128-scale format (codec.quantize_q4g, pack group 256):
        # one scale per 128-row nibble plane (kn scales duplicated 4x;
        # row 4b = block b's). The x operand here is the row-structured
        # [H, d] attention scratch, so each plane's dot splits into
        # d-wide row-aligned sub-dots (depth 64 at d=64 — still 2x
        # deeper than q4's depth-32 blockdots).
        from tinyllama_tpu.quant.codec import BLOCK_SIZE as _BS

        pg = 256 if (wd.shape[0] * 2) % 256 == 0 else 128
        gb = pg // 2
        step = min(gb, d)
        m_hi = jnp.asarray(-16, jnp.int8)
        m_lo = jnp.asarray(0x0F, jnp.int8)
        s16 = s * (1.0 / 16.0)
        for g in range(wd.shape[0] // gb):
            rows = wd[g * gb:(g + 1) * gb]
            hi16 = (rows & m_hi).astype(compute_dtype)  # 16*(v_hi-8)
            lo = (rows & m_lo).astype(compute_dtype)
            ph = jnp.zeros((1, bn), jnp.float32)
            plo = jnp.zeros((1, bn), jnp.float32)
            sumh = jnp.zeros((1, 1), jnp.float32)
            suml = jnp.zeros((1, 1), jnp.float32)
            for c in range(0, gb, step):
                xh = xrow(k0 + g * pg + c, step)
                xl = xrow(k0 + g * pg + gb + c, step)
                sumh += jnp.sum(xh.astype(jnp.float32), axis=1,
                                keepdims=True)
                suml += jnp.sum(xl.astype(jnp.float32), axis=1,
                                keepdims=True)
                ph += jax.lax.dot_general(
                    xh, hi16[c:c + step], dims,
                    preferred_element_type=jnp.float32,
                )
                plo += jax.lax.dot_general(
                    xl, lo[c:c + step], dims,
                    preferred_element_type=jnp.float32,
                )
            sh = (pg // _BS) * g
            sl = sh + 4 if pg == 256 else sh
            acc += ph * s16[sh].reshape(1, bn)
            acc += sumh * s[sh].reshape(1, bn)
            acc += (plo - 7.0 * suml) * s[sl].reshape(1, bn)
    elif kind == "q8":
        nblk = wd.shape[0] // BLOCK_SIZE
        for b in range(nblk):
            wb = wd[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
            xb = xrow(k0 + b * BLOCK_SIZE, BLOCK_SIZE)
            pb = jax.lax.dot_general(
                xb, wb.astype(compute_dtype), dims,
                preferred_element_type=jnp.float32,
            )
            acc += pb * s[b].reshape(1, bn)
    else:
        half = KN_GROUP // 2
        m_hi = jnp.asarray(-16, jnp.int8)
        m_lo = jnp.asarray(0x0F, jnp.int8)
        s16 = s * (1.0 / 16.0)
        for g in range(wd.shape[0] // half):
            rows = wd[g * half:(g + 1) * half]
            hi16 = (rows & m_hi).astype(compute_dtype)  # 16*(v_hi-8)
            lo = (rows & m_lo).astype(compute_dtype)
            xh = xrow(k0 + g * KN_GROUP, half)
            xl = xrow(k0 + g * KN_GROUP + half, half)
            sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
            suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
            ph = jax.lax.dot_general(
                xh, hi16, dims, preferred_element_type=jnp.float32,
            )
            plo = jax.lax.dot_general(
                xl, lo, dims, preferred_element_type=jnp.float32,
            ) - float(Q4_OFFSET) * suml
            acc += ph * s16[2 * g].reshape(1, bn)
            acc += sumh * s[2 * g].reshape(1, bn)
            acc += plo * s[2 * g + 1].reshape(1, bn)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("kind", "interpret", "bound"),
)
def _run_attn_out(
    qg, ck, cv, ck_s, cv_s, wd, ws, res, li, pos, kind, interpret,
    bound=None,
):
    Kh, G, d = qg.shape
    H = Kh * G
    S = ck.shape[3]
    D = H * d
    N = wd.shape[-1]
    compute_dtype = qg.dtype
    quant_kv = ck_s is not None
    if ws.dtype == jnp.float16:
        ws = jax.lax.bitcast_convert_type(ws, jnp.int16)

    from tinyllama_tpu.ops.pallas.flash_prefill import _bound_tiles

    bs = _tile(S, 512)  # measured best vs 256/1024 at b1 decode fills
    n_s = _bound_tiles(S, bs, bound)
    bn = _pick_bn(N)
    bk = _pick_bk(D, bn, kind)
    bk_rows = bk // 2 if kind in ("q4", "q4g") else bk
    n_k = D // bk
    n_n = pl.cdiv(N, bn)
    grid = (n_n, n_s + n_k)

    def kernel(li_ref, pos_ref, q_ref, k_ref, v_ref, *rest):
        if quant_kv:
            ks_ref, vs_ref = rest[:2]
            rest = rest[2:]
        else:
            ks_ref = vs_ref = None
        wd_ref, ws_ref, r_ref, o_ref, m_ref, l_ref, acc_ref, attn_bf = rest
        n = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((n == 0) & (t == 0))
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when((n == 0) & (t < n_s) & (t * bs <= pos_ref[0]))
        def _():
            key_pos = t * bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, bs), 1
            )
            ok = key_pos <= pos_ref[0]
            # phased: all Kh score dots, then the VPU updates, then all
            # pv dots (softmax_update.online_update_batch — independent
            # dots pipeline instead of serializing on issue latency)
            online_update_batch(
                [(
                    q_ref[h].astype(compute_dtype), k_ref[h], v_ref[h],
                    None if ks_ref is None else ks_ref[pl.ds(h, 1), :],
                    None if vs_ref is None else vs_ref[pl.ds(h, 1), :],
                    ok, slice(h * G, (h + 1) * G),
                ) for h in range(Kh)],
                m_ref, l_ref, acc_ref, compute_dtype,
            )

        @pl.when((n == 0) & (t == n_s - 1))
        def _():
            denom = l_ref[:, :1]
            denom = jnp.where(denom > 0.0, denom, 1.0)
            attn_bf[:] = (acc_ref[:] / denom).astype(attn_bf.dtype)

        @pl.when(t >= n_s)
        def _():
            k_i = t - n_s

            @pl.when(k_i == 0)
            def _():
                o_ref[:] = r_ref[:].astype(jnp.float32)

            s = _load_scales(ws_ref)
            # unrolled static switch on the wo tile index: each branch
            # reads the scratch rows belonging to that tile's K range
            for ki in range(n_k):
                @pl.when(k_i == ki)
                def _(ki=ki):
                    part = _wo_tile_dot(
                        attn_bf[:], wd_ref[:], s, kind, compute_dtype,
                        ki * bk,
                    )
                    o_ref[0:1, :] += part

    def s_eff(t, pos):
        return jnp.minimum(t, pos[0] // bs)

    kv_spec = pl.BlockSpec(
        (None, None, Kh, bs, d),
        lambda n, t, li, pos: (li[0], 0, 0, s_eff(t, pos), 0),
    )
    in_specs = [
        pl.BlockSpec((Kh, G, d), lambda n, t, li, pos: (0, 0, 0)),
        kv_spec, kv_spec,
    ]
    operands = [qg, ck, cv]
    if quant_kv:
        scale_spec = pl.BlockSpec(
            (None, None, Kh, bs),
            lambda n, t, li, pos: (li[0], 0, 0, s_eff(t, pos)),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ck_s, cv_s]

    def k_eff(t):
        return jnp.clip(t - n_s, 0, n_k - 1)

    in_specs += [
        pl.BlockSpec((None, bk_rows, bn),
                     lambda n, t, li, pos: (li[0], k_eff(t), n)),
        pl.BlockSpec((None, bk // BLOCK_SIZE, bn),
                     lambda n, t, li, pos: (li[0], k_eff(t), n)),
        pl.BlockSpec((8, bn), lambda n, t, li, pos: (0, n)),
    ]
    operands += [wd, ws, res]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, bn), lambda n, t, li, pos: (0, n)),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, d), jnp.float32),
            pltpu.VMEM((H, d), compute_dtype),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * H * S * d + 2 * D * N,
            bytes_accessed=(
                2 * Kh * S * d * ck.dtype.itemsize
                + (wd.size + 2 * ws.size) // wd.shape[0]
            ),
            transcendentals=H * S,
        ),
        interpret=interpret,
    )(li, pos, *operands)


def fused_attn_out(
    q: jnp.ndarray,  # [1, 1, H, d] activation dtype
    cache,  # KVCache [L, 1, Kh, S, d]; the new k/v already written
    li: jnp.ndarray,  # scalar int32
    pos: jnp.ndarray,  # [1] int32
    residual: jnp.ndarray,  # [1, 1, D] the block input x
    wo: QTensor,  # layer-stacked kn
    interpret: bool | None = None,
    ctx_bound: int | None = None,  # host-static: every pos < ctx_bound
) -> jnp.ndarray:
    """residual + attention(q, cache) @ dequant(wo), one pallas_call.

    B == 1, T == 1 decode only (the latency path); requires d_head a
    multiple of 32 so wo's 32-blocks stay within one head row of the
    attention scratch (KN_GROUP == 64 guarantees the q4 planes do).
    Returns [1, 1, D] in residual.dtype.
    """
    B, T, H, d = q.shape
    assert B == 1 and T == 1, "fused_attn_out is the b1 decode path"
    assert d % 32 == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Kh = cache.k.shape[2]
    qg = q.reshape(Kh, H // Kh, d)
    D = residual.shape[-1]
    res = jnp.pad(residual.reshape(1, D), ((0, 7), (0, 0)))
    out = _run_attn_out(
        qg, cache.k, cache.v, cache.k_scale, cache.v_scale,
        wo.data, wo.scales, res,
        jnp.reshape(li, (1,)).astype(jnp.int32),
        pos.astype(jnp.int32), wo.kind, interpret, ctx_bound,
    )
    return out[0:1].reshape(1, 1, D).astype(residual.dtype)
