"""Shared online-softmax block update for the staged flash kernels.

One step of the standard flash-attention recurrence (running row max m,
normalizer l, weighted-V accumulator) over one key block, with optional
int8-KV per-position scales folded into the scores (k) and the softmax
weights (v). Used by the staged-tail decode kernels in flash_prefill.py
and flash_paged.py, whose bodies visit two kinds of key blocks (pool
pages/tiles and the chunk-local staging tail) with the same recurrence.

Reference counterpart: the dense qk_masked_softmax + qkv_matmul pair
(/root/reference/gten/ops.h:930-1089), which materializes every score.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def online_update_batch(items, m_ref, l_ref, acc_ref, compute_dtype):
    """A batch of independent online_update's, restructured into three
    phases: ALL score dots, then the VPU softmax-state updates, then
    ALL weighted-V dots. The interleaved per-update form serializes on
    each tiny dot's MXU issue latency (~0.27 us per [G, P] update,
    measured as the floor of the B=32 serving attention step); phasing
    hands the compiler runs of data-independent dots to pipeline.

    items: [(q [R,d], k [BK,d], v [BK,d], ks_row, vs_row, ok, rows)] —
    the `rows` scratch slices must be pairwise disjoint.
    """
    scores = []
    for q, k, v, ks_row, vs_row, ok, rows in items:
        d = q.shape[-1]
        s = jax.lax.dot_general(
            q, k.astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 / (d ** 0.5))
        if ks_row is not None:
            s = s * ks_row
        scores.append(jnp.where(ok, s, NEG_INF))

    ps = []
    for (q, k, v, ks_row, vs_row, ok, rows), s in zip(items, scores):
        m_prev = m_ref[rows, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(ok, p, 0.0)
        l_new = l_ref[rows, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_row is not None:
            p = p * vs_row
        R = m_new.shape[0]
        m_ref[rows] = jnp.broadcast_to(m_new, (R, m_ref.shape[1]))
        l_ref[rows] = jnp.broadcast_to(l_new, (R, l_ref.shape[1]))
        ps.append((p, alpha))

    for (q, k, v, ks_row, vs_row, ok, rows), (p, alpha) in zip(items, ps):
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[rows] = acc_ref[rows] * alpha + pv


def online_update(
    q,  # [R, d] compute dtype
    k,  # [BK, d] storage dtype
    v,  # [BK, d] storage dtype
    ks_row,  # [1, BK] f32 k-scales, or None
    vs_row,  # [1, BK] f32 v-scales, or None
    ok,  # bool, broadcastable to [R, BK]: key visibility
    rows,  # slice into the scratch row dim
    m_ref,  # [*, >=1] f32 running max (lanes replicated)
    l_ref,  # [*, >=1] f32 running denom
    acc_ref,  # [*, d] f32 weighted-V accumulator
    compute_dtype,
) -> None:
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q, k.astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / (d ** 0.5))  # [R, BK]
    if ks_row is not None:
        scores = scores * ks_row
    scores = jnp.where(ok, scores, NEG_INF)

    m_prev = m_ref[rows, :1]  # [R, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    p = jnp.where(ok, p, 0.0)
    l_new = l_ref[rows, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if vs_row is not None:
        p = p * vs_row
    pv = jax.lax.dot_general(
        p.astype(compute_dtype), v.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, d]
    acc_ref[rows] = acc_ref[rows] * alpha + pv
    R = m_new.shape[0]
    m_ref[rows] = jnp.broadcast_to(m_new, (R, m_ref.shape[1]))
    l_ref[rows] = jnp.broadcast_to(l_new, (R, l_ref.shape[1]))
