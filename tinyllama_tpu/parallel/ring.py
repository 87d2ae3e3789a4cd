"""Sequence (context) parallelism: ring attention over a mesh axis.

SURVEY.md §5 names long-context sequence-dim sharding as the one
distributed subsystem with no reference counterpart (the reference is
single-host, max_ctx 2048 with a dense ctx^2 score buffer —
/root/reference/gten/modules.cpp:180). On TPU the long-context prefill
wall is per-chip activation/score memory and attention FLOPs; both scale
down linearly when the SEQUENCE dim shards across chips:

* every position-independent op (norms, matmuls, SwiGLU, rope) shards
  trivially on T — no collectives at all (weights are replicated or
  TP-sharded exactly as before);
* attention needs every query to see every earlier key: the classic
  ring schedule (Liu et al., "Ring Attention with Blockwise
  Transformers", 2023) rotates each shard's KV block around the mesh
  axis with `ppermute` while the flash online-softmax recurrence
  (running max m, normalizer l, weighted-V accumulator) merges one
  block per hop. n-1 hops see every key; per-chip memory stays
  O(T/n * d) and the KV transfer rides the same ICI links the TP
  collectives use, overlapped by XLA with each hop's compute.

Causality makes half the hops no-ops (a shard's queries never see a
LATER shard's keys); those hops still forward the rotating block but
skip their compute via `lax.cond` — the asymptotic FLOP count matches
the causal triangle, not the full square.

This module is the kernel-level component: `ring_gqa_attention` runs
under `shard_map` with T sharded on a mesh axis and is validated against
the dense reference on an 8-virtual-device CPU mesh (tests/test_ring.py)
plus a full T-sharded transformer-block prefill (`__graft_entry__`'s
seq-parallel dryrun). Engine-level wiring stays off until a model
preset exceeds single-chip context capacity (ROADMAP: >32K ctx).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _block_update(q, k, v, mask, m, l, acc, scale):
    """One flash online-softmax step over a visiting KV block.

    q [R, Tq, d] f32/bf16 (R = flattened (B, H) rows), k/v [R', Tk, d]
    with R' broadcastable to R (GQA: kv heads repeated), mask [Tq, Tk]
    or broadcastable, m/l [R, Tq, 1], acc [R, Tq, d].
    """
    scores = jnp.einsum(
        "rqd,rkd->rqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask, scores, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    # fully-masked rows keep m = -inf; exp(-inf - -inf) is nan — guard
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
    p = jnp.exp(scores - m_safe)
    p = jnp.where(mask, p, 0.0)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum(
        "rqk,rkd->rqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    acc_new = acc * alpha + pv
    return m_new, l_new, acc_new


@functools.partial(jax.jit, static_argnames=("axis_name",))
def ring_gqa_attention(
    q: jnp.ndarray,  # [B, Tl, H, d] THIS SHARD's queries (T sharded)
    k: jnp.ndarray,  # [B, Tl, Kh, d] this shard's keys
    v: jnp.ndarray,  # [B, Tl, Kh, d]
    axis_name: str = "data",
) -> jnp.ndarray:
    """Causal GQA attention with the sequence dim sharded on `axis_name`.

    Must run inside shard_map over a mesh with that axis; shard i holds
    global positions [i*Tl, (i+1)*Tl). Returns this shard's [B, Tl, H, d]
    attention output in q.dtype. KV blocks rotate shard i -> i+1 each
    hop, so after n-1 hops every shard has seen every earlier block.
    """
    B, Tl, H, d = q.shape
    Kh = k.shape[2]
    G = H // Kh
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    scale = 1.0 / (d ** 0.5)

    # flatten (B, heads) into rows; repeat kv heads across the group
    def rows_q(x):  # [B, Tl, H, d] -> [B*H, Tl, d]
        return x.transpose(0, 2, 1, 3).reshape(B * H, Tl, d)

    def rows_kv(x):  # [B, Tl, Kh, d] -> [B*H, Tl, d] (G-repeated)
        x = x.transpose(0, 2, 1, 3)  # [B, Kh, Tl, d]
        x = jnp.repeat(x, G, axis=1)  # [B, H, Tl, d]
        return x.reshape(B * H, Tl, d)

    qr = rows_q(q)
    q_pos = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)  # global positions

    # derive the carry from qr so it inherits qr's device-varying type —
    # a literal jnp.zeros is axis-invariant and lax.cond then rejects
    # mixing it with the varying per-shard update
    qf = qr.astype(jnp.float32)
    m0 = jnp.full_like(qf[..., :1], -jnp.inf)
    l0 = jnp.zeros_like(qf[..., :1])
    acc0 = jnp.zeros_like(qf)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def hop(step, carry):
        m, l, acc, kb, vb = carry
        src = (idx - step) % n  # which shard's block we hold this hop
        k_pos = src * Tl + jnp.arange(Tl, dtype=jnp.int32)

        def visible(args):
            m, l, acc = args
            mask = k_pos[None, :] <= q_pos[:, None]  # [Tl, Tl]
            return _block_update(
                qr, rows_kv(kb), rows_kv(vb), mask[None], m, l, acc,
                scale,
            )

        # blocks from strictly-later shards are invisible to every query
        # here: skip the whole update (half the ring's FLOPs)
        m, l, acc = jax.lax.cond(
            src <= idx, visible, lambda args: args, (m, l, acc)
        )
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return m, l, acc, kb, vb

    m, l, acc, _, _ = jax.lax.fori_loop(
        0, n, hop, (m0, l0, acc0, k, v)
    )
    denom = jnp.where(l > 0.0, l, 1.0)
    out = (acc / denom).reshape(B, H, Tl, d).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)
