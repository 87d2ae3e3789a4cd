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
