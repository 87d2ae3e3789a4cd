"""Blockwise (flash) causal GQA prefill attention over the stacked cache.

The reference materializes dense ctx x ctx attention scores per head in a
preallocated buffer (SURVEY.md C14/C16; /root/reference/gten/modules.cpp:
180 `qk_acv {n_heads, max_ctx, max_ctx}`) — quadratic memory by design.
This kernel never materializes them: S is tiled with the standard online-
softmax recurrence (running row max m, normalizer l, output accumulator),
so prefill memory is O(tile) regardless of context length.

The KV cache stays stacked
[L, B, Kh, S, d] (the new tokens' k/v already written), the layer rides a
scalar-prefetch index map, int8-KV scales fold into scores / softmax
weights as lane-aligned [1, BS] multiplies. The GQA group dimension is
flattened into the query rows (row r of a (b, kh) step is query token
r // G, group member r % G), which keeps every matmul 2-D and the causal
mask a pure iota comparison.

Grid: (B, Kh, TG/BTG, S/BS) with S innermost; S-tiles strictly above the
causal diagonal skip their compute (their DMAs still run — pruning those
needs a data-dependent grid, only worth it at much longer context).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_attn_kernel(
    li_ref, pos_ref, q_ref, k_ref, v_ref, *rest,
    compute_dtype, G: int, bs: int, n_s: int,
):
    """TRANSPOSED-scores flash step: scores live [BS, BTG] (keys on
    sublanes, queries on lanes), computed as dot(k, q). The per-query
    running max and normalizer sum then reduce along SUBLANES — the
    lane-orientation of the classic [BTG, BS] layout made those two
    reductions ~55% of the whole kernel (kbench --bench flash: full
    591 us vs flipped 376 us at T=2048; the exp itself is ~free,
    contrary to the round-3 "exp-bound" reading). The accumulator stays
    flipped too ([d, BTG]) so the alpha rescale is a sublane broadcast;
    the caller untransposes the [B, Kh, d, TG] output once outside.
    Int8-KV scales arrive PRE-STACKED as a [.., S, 2] operand (kvs_ref,
    [bs, 2] tiles — a [1, bs] lane vector cannot legally turn into
    [bs, 1] in-kernel, and diag-matmul / in-kernel transpose tricks
    measure at ~0.2 us/tile-step, kbench flipT vs flipTpre)."""
    if len(rest) == 5:
        kvs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        kvs_ref = None
        o_ref, acc_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    t = pl.program_id(2)
    s = pl.program_id(3)
    d, BTG = o_ref.shape

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    row0 = t * BTG
    # the tile's last query row bounds its causal reach
    t_max = pos_ref[b] + (row0 + BTG - 1) // G

    @pl.when(s * bs <= t_max)
    def _():
        if kvs_ref is None:
            k = k_ref[:].astype(compute_dtype)
            v = v_ref[:].astype(compute_dtype)
        else:
            k = (k_ref[:].astype(jnp.float32) * kvs_ref[:, :1]).astype(
                compute_dtype)
            v = (v_ref[:].astype(jnp.float32) * kvs_ref[:, 1:2]).astype(
                compute_dtype)
        scores = jax.lax.dot_general(
            k, q_ref[:].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 / (d ** 0.5))  # [BS, BTG]

        # absolute positions: keys on sublanes, queries on lanes
        s_abs = s * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
        t_abs = pos_ref[b] + (
            row0 + jax.lax.broadcasted_iota(jnp.int32, (1, BTG), 1)
        ) // G
        scores = jnp.where(s_abs <= t_abs, scores, NEG_INF)

        m_prev = m_ref[:1]  # [1, BTG]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        # (measured: computing exp on bf16 values changes nothing here —
        # Mosaic upcasts transcendentals to f32 internally)
        p = jnp.exp(scores - m_new)
        l_ref[:1] = l_ref[:1] * alpha + jnp.sum(p, axis=0, keepdims=True)
        m_ref[:1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            v, p.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, BTG]

    @pl.when(s == n_s - 1)
    def _():
        denom = l_ref[:1]
        denom = jnp.where(denom > 0.0, denom, 1.0)
        o_ref[:] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _tile(n: int, cap: int) -> int:
    t = min(n, cap)
    while n % t:
        t //= 2
    return max(t, 1)


@functools.partial(jax.jit, static_argnames=("G", "interpret"))
def _run_flash_prefill(qg, ck, cv, ck_s, cv_s, li, pos, G, interpret):
    B, Kh, TG, d = qg.shape
    S = ck.shape[3]
    compute_dtype = qg.dtype
    quant = ck_s is not None

    btg = _tile(TG, 512)
    bs = _tile(S, 512)
    n_s = S // bs
    grid = (B, Kh, TG // btg, S // bs)

    def _s_eff(b, t, s, pos):
        # clamp key tiles past the causal frontier to the last visible
        # tile: repeated block indices skip their DMA in the Pallas
        # pipeline, and the kernel's `s * bs <= t_max` gate skips their
        # compute — so cost tracks the *filled* context, not max_ctx
        # (decode at position p reads ceil((p+1)/BS) tiles, not S/BS)
        t_max = pos[b] + ((t + 1) * btg - 1) // G
        return jnp.minimum(s, t_max // bs)

    in_specs = [
        pl.BlockSpec((None, None, btg, d),
                     lambda b, h, t, s, li, pos: (b, h, t, 0)),
        pl.BlockSpec((None, None, None, bs, d),
                     lambda b, h, t, s, li, pos:
                     (li[0], b, h, _s_eff(b, t, s, pos), 0)),
        pl.BlockSpec((None, None, None, bs, d),
                     lambda b, h, t, s, li, pos:
                     (li[0], b, h, _s_eff(b, t, s, pos), 0)),
    ]
    operands = [qg, ck, cv]
    if quant:
        # pre-stacked sublane-oriented scales for the flipped kernel:
        # layer li's [B, Kh, S] planes stacked to [B, Kh, S, 2] (a
        # ~S*Kh*8-byte XLA op per layer; the [bs, 2] tile is one
        # contiguous 4 KB DMA)
        kvs = jnp.stack(
            [ck_s[li[0]], cv_s[li[0]]], axis=-1
        ).astype(jnp.float32)
        in_specs += [pl.BlockSpec(
            (None, None, bs, 2),
            lambda b, h, t, s, li, pos: (b, h, _s_eff(b, t, s, pos), 0),
        )]
        operands += [kvs]

    kernel = functools.partial(
        _flash_attn_kernel, compute_dtype=compute_dtype, G=G, bs=bs, n_s=n_s
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, None, d, btg),
                               lambda b, h, t, s, li, pos: (b, h, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((d, btg), jnp.float32),
            pltpu.VMEM((8, btg), jnp.float32),
            pltpu.VMEM((8, btg), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kh, d, TG), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Kh * TG * S * d,
            bytes_accessed=2 * B * Kh * S * d * ck.dtype.itemsize,
            transcendentals=B * Kh * TG * S,
        ),
        interpret=interpret,
    )(li, pos, *operands)


def _decode_heads_kernel(
    li_ref, pos_ref, q_ref, k_ref, v_ref, *rest,
    compute_dtype, Kh: int, G: int, bs: int, n_s: int,
):
    """T=1 decode attention with ALL kv heads in one block.

    The generic kernel (`_flash_attn_kernel`) puts Kh on the grid, which
    at decode means Kh x n_s grid steps of tiny work per (b, layer) —
    per-grid-step overhead (~0.3 us) dominates the actual DMA/compute at
    any fill. Here the k/v blocks carry the whole [Kh, bs, d] slab and a
    static in-kernel head loop does Kh small dots per key tile, so the
    grid is (B, S/bs): 4x fewer steps at TinyLlama's Kh=4.
    """
    from tinyllama_tpu.ops.pallas.softmax_update import (
        online_update_batch,
    )

    if len(rest) == 6:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs <= pos_ref[b])
    def _():
        key_pos = s * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        ok = key_pos <= pos_ref[b]
        # phased Kh-batch: independent score/pv dots pipeline on the
        # MXU (softmax_update.online_update_batch)
        online_update_batch(
            [(
                q_ref[h].astype(compute_dtype), k_ref[h], v_ref[h],
                None if ks_ref is None else ks_ref[pl.ds(h, 1), :],
                None if vs_ref is None else vs_ref[pl.ds(h, 1), :],
                ok, slice(h * G, (h + 1) * G),
            ) for h in range(Kh)],
            m_ref, l_ref, acc_ref, compute_dtype,
        )

    @pl.when(s == n_s - 1)
    def _():
        denom = l_ref[:, :1]
        denom = jnp.where(denom > 0.0, denom, 1.0)
        out = (acc_ref[:] / denom).astype(o_ref.dtype)
        for h in range(Kh):
            o_ref[h] = out[h * G:(h + 1) * G]


def _bound_bs(S: int, bound: int | None) -> int:
    """Key-tile width for the bounded batched-decode walks: the Pallas
    pipeline always DMAs whole [.., bs, d] tiles (the fill-clamp only
    *repeats* indices), so at serving fills far below max_ctx a 512-wide
    tile streams mostly dead rows per batch row per layer (measured
    ~40 us/layer of the B=16 step). Track the bound: <= 4-5 pool tiles
    keeps machinery flat while tile waste stays <= bound/4. b1's
    unbounded walk keeps the measured-best 512."""
    cap = 512 if bound is None else max(128, min(512, bound // 4))
    return _tile(S, cap)


def _bound_tiles(S: int, bs: int, bound: int | None) -> int:
    """Key-walk grid length: tiles covering `bound` positions (or all of
    S). The clamped index maps already *skip the DMA* of past-fill grid
    steps, but each step still costs ~0.3 us of grid machinery — at
    serving fills far below max_ctx that empty machinery dominates
    decode attention (measured 65% of a B=32 step with a 2048-wide
    walk over ~100-token fills). `bound` is a host-static promise that
    every attended position is < bound, so the walk can stop there."""
    n_s = S // bs
    if bound is None:
        return n_s
    assert bound >= 1
    return max(1, min(n_s, -(-bound // bs)))


@functools.partial(jax.jit, static_argnames=("interpret", "bound"))
def _run_decode_heads(qg, ck, cv, ck_s, cv_s, li, pos, interpret,
                      bound=None):
    B, Kh, G, d = qg.shape
    S = ck.shape[3]
    compute_dtype = qg.dtype
    quant = ck_s is not None

    bs = _bound_bs(S, bound) if B > 1 else _tile(S, 512)
    n_s = _bound_tiles(S, bs, bound)
    grid = (B, n_s)

    def _s_eff(b, s, pos):
        # clamp past-fill tiles to the last visible one: the repeated
        # block index skips the DMA, the kernel gate skips the compute
        return jnp.minimum(s, pos[b] // bs)

    kv_spec = pl.BlockSpec(
        (None, None, Kh, bs, d),
        lambda b, s, li, pos: (li[0], b, 0, _s_eff(b, s, pos), 0),
    )
    in_specs = [
        pl.BlockSpec((None, Kh, G, d), lambda b, s, li, pos: (b, 0, 0, 0)),
        kv_spec, kv_spec,
    ]
    operands = [qg, ck, cv]
    if quant:
        scale_spec = pl.BlockSpec(
            (None, None, Kh, bs),
            lambda b, s, li, pos: (li[0], b, 0, _s_eff(b, s, pos)),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ck_s, cv_s]

    kernel = functools.partial(
        _decode_heads_kernel, compute_dtype=compute_dtype, Kh=Kh, G=G,
        bs=bs, n_s=n_s,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, Kh, G, d),
                               lambda b, s, li, pos: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Kh * G, 128), jnp.float32),
            pltpu.VMEM((Kh * G, 128), jnp.float32),
            pltpu.VMEM((Kh * G, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kh, G, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Kh * G * S * d,
            bytes_accessed=2 * B * Kh * S * d * ck.dtype.itemsize,
            transcendentals=B * Kh * G * S,
        ),
        interpret=interpret,
    )(li, pos, *operands)


def flash_decode_heads_attention(
    q: jnp.ndarray,  # [B, 1, H, d] activation dtype
    cache,  # KVCache ([L, B, Kh, S, d]); the new k/v already written
    li: jnp.ndarray,  # scalar int32 layer index
    pos: jnp.ndarray,  # [B] int32 position of the new token
    interpret: bool | None = None,
    ctx_bound: int | None = None,  # host-static: every pos < ctx_bound
) -> jnp.ndarray:
    """Single-token GQA attention over the stacked cache with all kv
    heads resident in each grid step (see _decode_heads_kernel).
    Returns [B, 1, H, d] in q.dtype."""
    B, T, H, d = q.shape
    assert T == 1, "flash_decode_heads_attention is the T=1 decode path"
    Kh = cache.k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qg = q.reshape(B, Kh, H // Kh, d)
    out = _run_decode_heads(
        qg, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.reshape(li, (1,)).astype(jnp.int32), pos.astype(jnp.int32),
        interpret, ctx_bound,
    )
    return out.reshape(B, 1, H, d).astype(q.dtype)


def _flash_staged_kernel(
    li_ref, npool_ref, ntail_ref, q_ref, k_ref, v_ref, sk_ref, sv_ref,
    *rest, compute_dtype, Kh: int, G: int, bs: int, R: int,
):
    """Pool-tile walk + one staged-tail step over the monolithic cache,
    R batch rows per grid step.

    Grid (B/R, n_s + 1) with ALL kv heads and R batch rows resident per
    step (cache rows are batch-contiguous, so the R-row slab is ONE
    block/DMA — unlike the paged kernel's per-row page specs): steps
    s < n_s walk the rows' cache tiles up to the slowest row's pool
    fill (clamped past it, skipping the DMA), step s == n_s attends the
    chunk-local staging tail (runtime/staging.py) and writes the R
    outputs. Grid machinery (~0.3 us/step) dominates the tiny per-row
    work at decode, so fewer, fatter steps win. T == 1 decode only:
    every query row of a step shares one position, so masks are
    row-independent.
    """
    from tinyllama_tpu.ops.pallas.softmax_update import (
        online_update_batch,
    )

    if len(rest) == 8:
        (ks_ref, vs_ref, sks_ref, svs_ref,
         o_ref, m_ref, l_ref, acc_ref) = rest
    else:
        ks_ref = vs_ref = sks_ref = svs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_steps = pl.num_programs(1)  # n_s + 1

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s < n_steps - 1)
    def _():
        # phased batch (softmax_update.online_update_batch): all score
        # dots, then the VPU state updates, then all pv dots — the
        # interleaved per-(r, h) form serialized on each tiny dot's MXU
        # issue latency (+16% serving throughput when the paged twin
        # switched). The old per-row `s * bs < n_pool` compute gate
        # folds into the ok mask exactly.
        items = []
        for r in range(R):
            n_pool = npool_ref[b * R + r]
            key_pos = s * bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, bs), 1
            )
            ok = key_pos < n_pool
            for h in range(Kh):
                items.append((
                    q_ref[r, h].astype(compute_dtype),
                    k_ref[r, h], v_ref[r, h],
                    None if ks_ref is None
                    else ks_ref[r, pl.ds(h, 1), :],
                    None if vs_ref is None
                    else vs_ref[r, pl.ds(h, 1), :],
                    ok, slice((r * Kh + h) * G, (r * Kh + h + 1) * G),
                ))
        online_update_batch(items, m_ref, l_ref, acc_ref, compute_dtype)

    @pl.when(s == n_steps - 1)
    def _():
        Cs = sk_ref.shape[2]
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, Cs), 1)
        items = []
        for r in range(R):
            ok = slot < ntail_ref[b * R + r]
            for h in range(Kh):
                items.append((
                    q_ref[r, h].astype(compute_dtype),
                    sk_ref[r, h], sv_ref[r, h],
                    None if sks_ref is None
                    else sks_ref[r, pl.ds(h, 1), :],
                    None if svs_ref is None
                    else svs_ref[r, pl.ds(h, 1), :],
                    ok, slice((r * Kh + h) * G, (r * Kh + h + 1) * G),
                ))
        online_update_batch(items, m_ref, l_ref, acc_ref, compute_dtype)
        denom = l_ref[:, :1]
        denom = jnp.where(denom > 0.0, denom, 1.0)
        o_ref[:] = (acc_ref[:] / denom).reshape(o_ref.shape).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit,
                   static_argnames=("interpret", "bound", "rows"))
def _run_staged(qg, ck, cv, sk, sv, ck_s, cv_s, sk_s, sv_s, li, npool,
                ntail, interpret, bound=None, rows=1):
    B, Kh, G, d = qg.shape
    S = ck.shape[3]
    Cs = sk.shape[3]
    compute_dtype = qg.dtype
    quant = ck_s is not None
    R = rows
    assert B % R == 0, (B, R)

    bs = _bound_bs(S, bound)
    n_s = _bound_tiles(S, bs, bound)
    grid = (B // R, n_s + 1)

    def _s_eff(b, s, npool):
        # clamp past-fill (and the tail step's) tile index to the last
        # tile any of the step's R rows can see: the repeated block
        # index skips its DMA entirely (faster rows mask in-kernel)
        hi = npool[b * R]
        for r in range(1, R):
            hi = jnp.maximum(hi, npool[b * R + r])
        return jnp.minimum(s, jnp.maximum(hi - 1, 0) // bs)

    pool_spec = pl.BlockSpec(
        (None, R, Kh, bs, d),
        lambda b, s, li, npool, ntail:
        (li[0], b, 0, _s_eff(b, s, npool), 0),
    )
    tail_spec = pl.BlockSpec(
        (None, R, Kh, Cs, d),
        lambda b, s, li, npool, ntail: (li[0], b, 0, 0, 0),
    )
    in_specs = [
        pl.BlockSpec((R, Kh, G, d),
                     lambda b, s, li, npool, ntail: (b, 0, 0, 0)),
        pool_spec, pool_spec, tail_spec, tail_spec,
    ]
    operands = [qg, ck, cv, sk, sv]
    if quant:
        scale_spec = pl.BlockSpec(
            (None, R, Kh, bs),
            lambda b, s, li, npool, ntail:
            (li[0], b, 0, _s_eff(b, s, npool)),
        )
        tail_scale_spec = pl.BlockSpec(
            (None, R, Kh, Cs),
            lambda b, s, li, npool, ntail: (li[0], b, 0, 0),
        )
        in_specs += [scale_spec, scale_spec, tail_scale_spec,
                     tail_scale_spec]
        operands += [ck_s, cv_s, sk_s, sv_s]

    kernel = functools.partial(
        _flash_staged_kernel, compute_dtype=compute_dtype, Kh=Kh, G=G,
        bs=bs, R=R,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (R, Kh, G, d),
            lambda b, s, li, npool, ntail: (b, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((R * Kh * G, 128), jnp.float32),
            pltpu.VMEM((R * Kh * G, 128), jnp.float32),
            pltpu.VMEM((R * Kh * G, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kh, G, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Kh * G * (S + Cs) * d,
            bytes_accessed=2 * B * Kh * (S + Cs) * d * ck.dtype.itemsize,
            transcendentals=B * Kh * G * (S + Cs),
        ),
        interpret=interpret,
    )(li, npool, ntail, *operands)


def flash_staged_attention(
    q: jnp.ndarray,  # [B, 1, H, d] activation dtype
    st,  # runtime.staging.StagedKVCache over a monolithic KVCache
    li: jnp.ndarray,  # scalar int32 layer index
    pos: jnp.ndarray,  # [B] int32 position of the new token
    interpret: bool | None = None,
    ctx_bound: int | None = None,  # host-static: every pos < ctx_bound
) -> jnp.ndarray:
    """Single-token GQA attention over the stacked cache + the chunk's
    staged tail (the new token's k/v already staged at slot pos - base).
    Returns [B, 1, H, d]."""
    B, T, H, d = q.shape
    assert T == 1, "flash_staged_attention is the T=1 decode path"
    pool = st.pool
    Kh = pool.k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qg = q.reshape(B, Kh, H // Kh, d)
    # batch rows per grid step: the per-row work is tiny, so grid
    # machinery dominates — merge as many rows as divide B (capped:
    # the body unrolls R * Kh head updates)
    rows = next(r for r in (4, 2, 1) if B % r == 0)
    out = _run_staged(
        qg, pool.k, pool.v, st.sk, st.sv,
        pool.k_scale, pool.v_scale, st.sk_scale, st.sv_scale,
        jnp.reshape(li, (1,)).astype(jnp.int32),
        st.base.astype(jnp.int32),
        (pos - st.base + 1).astype(jnp.int32),
        interpret, ctx_bound, rows,
    )
    return out.reshape(B, 1, H, d).astype(q.dtype)


def flash_prefill_attention(
    q: jnp.ndarray,  # [B, T, H, d] activation dtype
    cache,  # KVCache ([L, B, Kh, S, d]); new k/v already written
    li: jnp.ndarray,  # scalar int32 layer index
    pos: jnp.ndarray,  # [B] int32 position of tokens[:, 0]
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Causal GQA attention for T new tokens against layer `li`.

    Returns [B, T, H, d] in q.dtype.
    """
    B, T, H, d = q.shape
    Kh = cache.k.shape[2]
    G = H // Kh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # flatten (token, group) into query rows: row r -> token r // G
    qg = (
        q.reshape(B, T, Kh, G, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, Kh, T * G, d)
    )
    out = _run_flash_prefill(
        qg, cache.k, cache.v, cache.k_scale, cache.v_scale,
        jnp.reshape(li, (1,)).astype(jnp.int32), pos.astype(jnp.int32),
        G, interpret,
    )
    # kernel output is flipped [B, Kh, d, TG] (see _flash_attn_kernel);
    # one XLA transpose per layer restores [B, T, H, d]
    return (
        out.reshape(B, Kh, d, T, G)
        .transpose(0, 3, 1, 4, 2)
        .reshape(B, T, H, d)
        .astype(q.dtype)
    )
