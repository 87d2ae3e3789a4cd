"""Device-resident speculative decoding (n-gram / prompt-lookup drafts).

The reference decodes strictly one token per forward (tinyllama.cpp:
395-512) and lists "multi-stream decoding" as its unimplemented TODO
(notes.txt:7). Weight-bound decode leaves the MXU idle: a forward over
T=k+1 tokens costs the same weight stream as T=1, so verifying k drafted
tokens in one step multiplies tokens-per-weight-stream by the acceptance
rate. TPU-native constraints shape the design:

* the whole generate loop runs in ONE jitted lax.while_loop on device —
  a host-side speculative loop would pay a 20-40 ms round trip per
  verify step on this box, instantly losing everything;
* drafting is prompt-lookup (Leviathan-style n-gram reuse): find the
  latest earlier occurrence of the current bigram in the token history
  and propose its continuation — pure vectorized compare/argmax on a
  fixed [S] buffer, no draft model, no host;
* verification feeds [current, d1..dk] through the normal fixed-shape
  forward at positions pos..pos+k (the same kernels as prefill at
  T=k+1) and accepts the longest matching greedy prefix. Rejected
  positions leave stale K/V in the cache; the next iteration's writes
  start at the first stale slot and k >= remaining staleness, so stale
  entries are always overwritten before any query can attend to them.

Greedy only: sampled speculative decoding needs rejection sampling to
preserve the target distribution; greedy acceptance is exact, so the
output is token-identical to Engine.generate (tests assert this).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tinyllama_tpu.models import llama


def build_speculative_chunk(
    cfg, policy, use_pallas, rope_tables, draft_len: int, s_max: int,
    eos: int, tp_wrap=None,
):
    """Compiled whole-generation speculative loop.

    (params, cache, toks [s_max + T] i32, n_ctx, next_tok, budget) ->
    (out [s_max + T] i32, n_out, n_verify, cache)

    toks[0..n_ctx) = prompt + the first sampled token (next_tok ==
    toks[n_ctx-1], whose K/V is not in the cache yet). `budget` (traced)
    caps emitted tokens; n_verify counts verify forwards (n_out /
    n_verify = tokens per weight-stream, the speculative speedup).

    Context-limit semantics: callers must size `toks` at [s_max + T] and
    the cache at >= s_max + T - 1 positions (Engine pads both), so the
    final verify step near n_ctx == s_max can still run full-width — the
    loop consumes the whole budget instead of stopping up to draft_len
    tokens early, keeping the token-identical-to-generate guarantee at
    the context boundary. Overrun rows live in pad positions no query
    ever attends to (budget bounds every legit position < s_max).
    """
    T = draft_len + 1
    k = draft_len

    def draft_from_history(toks, n_ctx):
        """Latest j with (toks[j], toks[j+1]) == the current bigram;
        propose toks[j+2 : j+2+k]."""
        a = toks[n_ctx - 2]
        b = toks[n_ctx - 1]
        idx = jnp.arange(toks.shape[0] - 1, dtype=jnp.int32)
        match = (
            (toks[:-1] == a) & (toks[1:] == b) & (idx < n_ctx - 2)
        )
        j = jnp.max(jnp.where(match, idx, -1))
        found = j >= 0
        start = jnp.where(found, j + 2, 0)
        draft = jax.lax.dynamic_slice(toks, (start,), (k,))
        return draft

    def verify_forward(params, cache, seq, pos):
        """seq [T] fed at positions pos..pos+T-1 -> greedy targets [T]."""
        hidden, cache = llama.forward(
            cfg, policy, params, seq[None], cache, pos[None],
            rope_tables, use_pallas,
        )
        logits = llama.lm_head_logits(
            params, hidden[0], use_pallas, policy.aq8
        )  # [T, V]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    if tp_wrap is not None:
        verify_forward = tp_wrap(verify_forward)

    @partial(jax.jit, donate_argnums=(1,))
    def chunk(params, cache, toks, n_ctx, next_tok, budget):
        out0 = jnp.zeros((s_max + T,), jnp.int32)

        def cond(state):
            cache, toks, n_ctx, next_tok, out, n_out, nv, done = state
            # n_out < budget implies n_ctx <= s_max - 1 at entry (budget
            # <= s_max - prompt - 1), so the T-wide history append stays
            # inside the [s_max + T] buffer without clamping
            return (~done) & (n_out < budget)

        def body(state):
            cache, toks, n_ctx, next_tok, out, n_out, nv, done = state
            draft = draft_from_history(toks, n_ctx)
            seq = jnp.concatenate([next_tok[None], draft])  # [T]
            targets, cache = verify_forward(
                params, cache, seq, n_ctx - 1
            )
            # longest accepted draft prefix
            ok = draft == targets[:k]
            acc = jnp.cumprod(ok.astype(jnp.int32))
            n_acc = jnp.sum(acc)  # 0..k
            emitted = targets  # [T]; valid prefix = n_acc + 1 tokens
            m = n_acc + 1
            # eos cut: stop before the first eos within the valid prefix
            pos_i = jnp.arange(T, dtype=jnp.int32)
            is_eos = (emitted == eos) & (pos_i < m)
            any_eos = jnp.any(is_eos)
            first_eos = jnp.min(jnp.where(is_eos, pos_i, T))
            m = jnp.where(any_eos, first_eos, m)
            m = jnp.minimum(m, budget - n_out)
            done = any_eos | (n_out + m >= budget)

            out = jax.lax.dynamic_update_slice(out, emitted, (n_out,))
            toks = jax.lax.dynamic_update_slice(toks, emitted, (n_ctx,))
            n_out = n_out + m
            n_ctx = n_ctx + m
            next_tok = toks[n_ctx - 1]
            return (cache, toks, n_ctx, next_tok, out, n_out, nv + 1,
                    done)

        state = (cache, toks, n_ctx, next_tok, out0,
                 jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        (cache, toks, n_ctx, next_tok, out, n_out, nv,
         done) = jax.lax.while_loop(cond, body, state)
        return out, n_out, nv, cache

    return chunk
