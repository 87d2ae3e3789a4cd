"""Paged flash-decode attention: one new token against a paged KV cache.

The paged counterpart of the monolithic flash kernel (reference decode
attention: /root/reference/gten/ops.h:930-1133, which re-reads its whole
dense score buffer per step). Here the cache lives in a shared page pool
(runtime/paged.py: k/v [L, n_pages, Kh, P, d]) and the kernel walks a
sequence's pages through its page table:

* grid (B, J): one step per (sequence, page), ALL kv-heads per step —
  one strided DMA brings the page's whole [Kh, P, d] slab (a single
  contiguous run in the pool layout) and the kernel loops the Kh heads'
  dots in-register; vs a per-(b, head, page) grid this cuts grid steps
  and DMA count by Kh, which dominates at decode where each page's dots
  are latency-bound. The page's physical id comes from the scalar-
  prefetched table inside the BlockSpec index map —
  `table[b, min(j, last_page(b))]`. Past the fill the index repeats the
  last page, so Pallas skips the DMA: decode-attention HBM traffic
  tracks each sequence's *fill*, not max_ctx.
* online softmax across pages: running (max, denom, weighted-V) state in
  VMEM scratch, initialized at j == 0, output written at the last page.
* int8 pages dequantize by folding per-position k-scales into the scores
  and v-scales into the softmax weights (lane-broadcast multiplies), as
  in the monolithic flash kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_paged_kernel(
    li_ref, pos_ref, tbl_ref,  # scalar prefetch
    q_ref, k_ref, v_ref, *rest,
    compute_dtype,
):
    if len(rest) == 6:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_pages = pl.num_programs(1)
    Kh, G, d = q_ref.shape
    P = k_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[b]
    last_page = pos // P

    # beyond-fill pages skip the ENTIRE body (their DMA was already
    # skipped by the repeated block index): at B x J grid steps the
    # masked-but-executed dots would otherwise dominate low-fill decode
    @pl.when(j <= last_page)
    def _():
        from tinyllama_tpu.ops.pallas.softmax_update import (
            online_update_batch,
        )

        key_pos = j * P + jax.lax.broadcasted_iota(jnp.int32, (G, P), 1)
        ok = key_pos <= pos
        # phased Kh-batch: one page DMA, the heads' independent
        # score/pv dots pipeline back to back instead of serializing
        # on each tiny dot's issue latency
        online_update_batch(
            [(
                q_ref[h].astype(compute_dtype), k_ref[h], v_ref[h],
                None if ks_ref is None else ks_ref[pl.ds(h, 1), :],
                None if vs_ref is None else vs_ref[pl.ds(h, 1), :],
                ok, slice(h * G, (h + 1) * G),
            ) for h in range(Kh)],
            m_ref, l_ref, acc_ref, compute_dtype,
        )

    @pl.when(j == n_pages - 1)
    def _():
        denom = l_ref[:, :1]
        denom = jnp.where(denom > 0.0, denom, 1.0)
        o_ref[:] = (acc_ref[:] / denom).reshape(o_ref.shape).astype(
            o_ref.dtype
        )


def _bound_pages(J: int, P: int, bound: int | None) -> int:
    """Page-walk grid length: pages covering `bound` positions (or the
    whole table width). Past-fill steps already skip their DMA via the
    clamped index maps, but still cost ~0.3 us of grid machinery each —
    a max_ctx-wide walk at serving fills is mostly empty steps (see
    flash_prefill._bound_tiles). `bound` is a host-static promise that
    every attended position is < bound."""
    if bound is None:
        return J
    assert bound >= 1
    return max(1, min(J, -(-bound // P)))


@functools.partial(jax.jit, static_argnames=("interpret", "bound"))
def _flash_paged(q, ck, cv, ck_s, cv_s, li, pos, table, interpret,
                 bound=None):
    B, Kh, G, d = q.shape
    P = ck.shape[3]
    J = _bound_pages(table.shape[1], P, bound)
    compute_dtype = q.dtype
    quant = ck_s is not None

    def page(b, j, pos_ref, tbl_ref):
        return tbl_ref[b, jnp.minimum(j, pos_ref[b] // P)]

    grid = (B, J)
    in_specs = [
        pl.BlockSpec((None, Kh, G, d), lambda b, j, li, pos, tbl: (b, 0, 0, 0)),
        pl.BlockSpec(
            (None, None, Kh, P, d),
            lambda b, j, li, pos, tbl: (li[0], page(b, j, pos, tbl), 0, 0, 0),
        ),
        pl.BlockSpec(
            (None, None, Kh, P, d),
            lambda b, j, li, pos, tbl: (li[0], page(b, j, pos, tbl), 0, 0, 0),
        ),
    ]
    operands = [q, ck, cv]
    if quant:
        scale_spec = pl.BlockSpec(
            (None, None, Kh, P),
            lambda b, j, li, pos, tbl: (li[0], page(b, j, pos, tbl), 0, 0),
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ck_s, cv_s]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, Kh, G, d),
                               lambda b, j, li, pos, tbl: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Kh * G, 128), jnp.float32),  # running max
            pltpu.VMEM((Kh * G, 128), jnp.float32),  # running denom
            pltpu.VMEM((Kh * G, d), jnp.float32),  # weighted-V accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_paged_kernel, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kh, G, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Kh * G * J * P * d,
            bytes_accessed=2 * B * Kh * J * P * d * ck.dtype.itemsize,
            transcendentals=B * Kh * G * J * P,
        ),
        interpret=interpret,
    )(li, pos, table, *operands)
    return out


def _flash_paged_staged_kernel(
    li_ref, npool_ref, ntail_ref, tbl_ref,  # scalar prefetch
    q_ref, *rest,
    compute_dtype, R: int, quant: bool,
):
    """Pool-page walk + one staged-tail step, R batch rows per grid step.

    Grid (B/R, J + 1): steps j < J walk R sequences' pool pages (each
    row's page rides its own operand spec, clamped past the row's pool
    fill so its DMA skips independently), step j == J attends the
    chunk-local staging tail (runtime/staging.py — one contiguous
    [R, Kh, Cs, d] block) and writes the R rows' outputs. Merging rows
    amortizes the ~0.3 us/step grid machinery that dominates this
    kernel at decode shapes (the per-row work is a handful of [G, P]
    ops) and keeps R page DMAs in flight per step.
    """
    from tinyllama_tpu.ops.pallas.softmax_update import (
        online_update_batch,
    )

    k_refs, v_refs = rest[:R], rest[R : 2 * R]
    sk_ref, sv_ref = rest[2 * R : 2 * R + 2]
    rest = rest[2 * R + 2 :]
    if quant:
        ks_refs, vs_refs = rest[:R], rest[R : 2 * R]
        sks_ref, svs_ref = rest[2 * R : 2 * R + 2]
        rest = rest[2 * R + 2 :]
    else:
        ks_refs = vs_refs = [None] * R
        sks_ref = svs_ref = None
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_steps = pl.num_programs(1)  # J + 1
    _, Kh, G, d = q_ref.shape
    P = k_refs[0].shape[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < n_steps - 1)
    def _():
        # ALL (row, head) updates of the step batched into the phased
        # form (softmax_update.online_update_batch): runs of
        # data-independent score/pv dots pipeline on the MXU instead of
        # serializing 16 tiny interleaved chains. The old per-row
        # `j * P < n_pool` compute gate folds into the ok mask (all-
        # masked rows update m/l/acc to themselves exactly).
        items = []
        for r in range(R):
            n_pool = npool_ref[b * R + r]
            key_pos = j * P + jax.lax.broadcasted_iota(
                jnp.int32, (G, P), 1
            )
            ok = key_pos < n_pool
            for h in range(Kh):  # one page DMA, Kh heads' dots
                items.append((
                    q_ref[r, h].astype(compute_dtype),
                    k_refs[r][h], v_refs[r][h],
                    None if ks_refs[r] is None
                    else ks_refs[r][pl.ds(h, 1), :],
                    None if vs_refs[r] is None
                    else vs_refs[r][pl.ds(h, 1), :],
                    ok, slice((r * Kh + h) * G, (r * Kh + h + 1) * G),
                ))
        online_update_batch(items, m_ref, l_ref, acc_ref, compute_dtype)

    @pl.when(j == n_steps - 1)
    def _():
        Cs = sk_ref.shape[2]
        slot = jax.lax.broadcasted_iota(jnp.int32, (G, Cs), 1)
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
def _flash_paged_staged(
    q, ck, cv, sk, sv, ck_s, cv_s, sk_s, sv_s, li, npool, ntail, table,
    interpret, bound=None, rows=1,
):
    B, Kh, G, d = q.shape
    P = ck.shape[3]
    J = _bound_pages(table.shape[1], P, bound)
    compute_dtype = q.dtype
    quant = ck_s is not None
    Cs = sk.shape[3]
    R = rows
    assert B % R == 0, (B, R)

    def page(row, j, npool, tbl):
        # clamp past-fill (and the tail step's) page index to the last
        # pool page: the repeated block index skips its DMA entirely
        return tbl[row, jnp.minimum(j, jnp.maximum(npool[row] - 1, 0) // P)]

    grid = (B // R, J + 1)

    def pool_spec(r, scales):
        shape = (None, None, Kh, P) if scales else (None, None, Kh, P, d)

        def idx(b, j, li, npool, ntail, tbl, r=r):
            i = (li[0], page(b * R + r, j, npool, tbl), 0, 0)
            return i if scales else i + (0,)

        return pl.BlockSpec(shape, idx)

    # the staging tail is batch-contiguous: R rows ride ONE block/DMA
    tail_spec = pl.BlockSpec(
        (None, R, Kh, Cs, d),
        lambda b, j, li, npool, ntail, tbl: (li[0], b, 0, 0, 0),
    )
    in_specs = [
        pl.BlockSpec((R, Kh, G, d),
                     lambda b, j, li, npool, ntail, tbl: (b, 0, 0, 0)),
        *[pool_spec(r, False) for r in range(R)],  # k pages
        *[pool_spec(r, False) for r in range(R)],  # v pages
        tail_spec, tail_spec,
    ]
    operands = [q] + [ck] * R + [cv] * R + [sk, sv]
    if quant:
        tail_scale_spec = pl.BlockSpec(
            (None, R, Kh, Cs),
            lambda b, j, li, npool, ntail, tbl: (li[0], b, 0, 0),
        )
        in_specs += [
            *[pool_spec(r, True) for r in range(R)],
            *[pool_spec(r, True) for r in range(R)],
            tail_scale_spec, tail_scale_spec,
        ]
        operands += [ck_s] * R + [cv_s] * R + [sk_s, sv_s]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (R, Kh, G, d),
            lambda b, j, li, npool, ntail, tbl: (b, 0, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((R * Kh * G, 128), jnp.float32),  # running max
            pltpu.VMEM((R * Kh * G, 128), jnp.float32),  # running denom
            pltpu.VMEM((R * Kh * G, d), jnp.float32),  # weighted-V acc
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _flash_paged_staged_kernel, compute_dtype=compute_dtype,
            R=R, quant=quant,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kh, G, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Kh * G * (J * P + Cs) * d,
            bytes_accessed=2 * B * Kh * (J * P + Cs) * d * ck.dtype.itemsize,
            transcendentals=B * Kh * G * (J * P + Cs),
        ),
        interpret=interpret,
    )(li, npool, ntail, table, *operands)


def flash_paged_staged_attention(
    q: jnp.ndarray,  # [B, 1, H, d] activation dtype
    st,  # runtime.staging.StagedKVCache over a PagedKVCache
    li: jnp.ndarray,  # scalar int32 layer index
    pos: jnp.ndarray,  # [B] int32 position of the new token
    interpret: bool | None = None,
    ctx_bound: int | None = None,  # host-static: every pos < ctx_bound
) -> jnp.ndarray:
    """Single-token GQA attention over pool pages + the chunk's staged
    tail (the new token's k/v already staged at slot pos - base)."""
    B, T, H, d = q.shape
    assert T == 1, "flash_paged_staged_attention is the T=1 decode path"
    pool = st.pool
    Kh = pool.k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qg = q.reshape(B, Kh, H // Kh, d)
    li = jnp.reshape(li, (1,)).astype(jnp.int32)
    npool = st.base.astype(jnp.int32)
    ntail = (pos - st.base + 1).astype(jnp.int32)
    # batch rows per grid step: the per-row work is tiny, so grid
    # machinery dominates — merge as many rows as divide B (capped:
    # the body unrolls R * Kh head updates)
    rows = next(r for r in (4, 2, 1) if B % r == 0)
    out = _flash_paged_staged(
        qg, pool.k, pool.v, st.sk, st.sv,
        pool.k_scale, pool.v_scale, st.sk_scale, st.sv_scale,
        li, npool, ntail, pool.table.astype(jnp.int32), interpret,
        ctx_bound, rows,
    )
    return out.reshape(B, 1, H, d).astype(q.dtype)


def flash_paged_attention(
    q: jnp.ndarray,  # [B, 1, H, d] activation dtype
    cache,  # PagedKVCache
    li: jnp.ndarray,  # scalar int32 layer index
    pos: jnp.ndarray,  # [B] int32 position of the new token
    interpret: bool | None = None,
    ctx_bound: int | None = None,  # host-static: every pos < ctx_bound
) -> jnp.ndarray:
    """Single-token GQA attention over the paged cache (the new token's
    k/v must already be written at `pos`). Returns [B, 1, H, d]."""
    B, T, H, d = q.shape
    assert T == 1, "flash_paged_attention is the T=1 decode path"
    Kh = cache.k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qg = q.reshape(B, Kh, H // Kh, d)
    li = jnp.reshape(li, (1,)).astype(jnp.int32)
    out = _flash_paged(
        qg, cache.k, cache.v, cache.k_scale, cache.v_scale, li,
        pos.astype(jnp.int32), cache.table.astype(jnp.int32), interpret,
        ctx_bound,
    )
    return out.reshape(B, 1, H, d).astype(q.dtype)
