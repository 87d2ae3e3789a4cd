"""Grouped-query causal attention over a fixed-shape KV cache.

Capability parity with gten's attention stack (/root/reference/gten/ops.h:
930-1133: qk_masked_softmax + transpose_v + qkv_matmul over persistent
activation buffers), re-designed for TPU:

* no ctx x ctx score buffer is ever persisted — scores live only inside the
  fused computation (XLA fusion here; Pallas flash kernels in ops/pallas/),
* the KV cache is an explicit fixed-shape array (runtime/kvcache.py), not
  an implicit start_pos idiom, so the whole step stays jit-compatible,
* GQA head-group mapping (head h uses kv group h // q_heads_per_group,
  ops.h:960) is expressed as a [B,T,Kh,G,d] reshape — no head replication.

Math parity: scores scaled by 1/sqrt(d_head) (ops.h:1107), causal mask
(key_pos <= query_pos), numerically-stable softmax in f32 (ops.h:971-994).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinyllama_tpu.ops.linear import cpu_safe_operand

NEG_INF = float(jnp.finfo(jnp.float32).min)


def gqa_attention(
    q: jnp.ndarray,  # [B, T, H, d]
    k: jnp.ndarray,  # [B, Kh, S, d]
    v: jnp.ndarray,  # [B, Kh, S, d]
    q_positions: jnp.ndarray,  # [B, T] int32, absolute positions of queries
) -> jnp.ndarray:
    """Causal GQA attention of new queries against the full cache.

    Cache slots at key position s are visible to the query at absolute
    position p iff s <= p; slots beyond the current fill are thereby masked
    (they are written later, see runtime/kvcache.py). Returns [B, T, H, d]
    in q.dtype.
    """
    B, T, H, d = q.shape
    Kh, S = k.shape[1], k.shape[2]
    G = H // Kh

    f32 = any(
        t in (q.dtype, k.dtype) for t in (jnp.float32, jnp.float16)
    )
    if f32:
        # f32/f16 path: HIGHEST + f32 upcast keeps the MXU from
        # truncating operands to bf16 (prefill≡decode bit-consistency at
        # f32; f16 has more mantissa bits than bf16).
        precision = jax.lax.Precision.HIGHEST
        qk_dtype = jnp.float32
    else:
        # bf16 path: MXU multiplies bf16 inputs exactly and accumulates in
        # f32 — upcasting k/v to f32 first would only round-trip the same
        # values through 2x the HBM traffic (the KV cache is read whole
        # every decode step, so this is the attention hot loop's bandwidth).
        precision = jax.lax.Precision.DEFAULT
        qk_dtype = q.dtype
    qc = cpu_safe_operand(q.reshape(B, T, Kh, G, d).astype(qk_dtype))
    kc = cpu_safe_operand(k.astype(qk_dtype))

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    # [B, Kh, T, G, S] f32
    scores = (
        jnp.einsum(
            "btkgd,bksd->bktgs",
            qc,
            kc,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        * scale
    )

    key_pos = jnp.arange(S, dtype=jnp.int32)
    visible = key_pos[None, None, :] <= q_positions[:, :, None]  # [B, T, S]
    scores = jnp.where(visible[:, None, :, None, :], scores, NEG_INF)

    # stable softmax in f32 (ops.h:971-994)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    out = jnp.einsum(
        "bktgs,bksd->btkgd",
        cpu_safe_operand(p.astype(qk_dtype)),
        cpu_safe_operand(v.astype(qk_dtype)),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.reshape(B, T, H, d).astype(q.dtype)
