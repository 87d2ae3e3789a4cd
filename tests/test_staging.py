"""Chunk-local KV staging (runtime/staging.py): correctness of the
staged-tail attention kernels, the chunk-exit flush, and end-to-end
equality of staged vs per-step-write chunked decode.

The reference has no counterpart (single stream, start_pos cursor,
/root/reference/gten/tensor.cpp:124-134); staging is the TPU serving
design that makes the per-step cache-write cost O(1) in batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import GenerationConfig, POLICIES, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.ops.attention import gqa_attention
from tinyllama_tpu.ops.pallas.flash_paged import flash_paged_staged_attention
from tinyllama_tpu.ops.pallas.flash_prefill import flash_staged_attention
from tinyllama_tpu.runtime.engine import Engine
from tinyllama_tpu.runtime.kvcache import (
    init_cache,
    layer_cache_view,
    update_cache_at_layer,
)
from tinyllama_tpu.runtime.paged import (
    PAGE_SIZE,
    init_paged_cache,
    paged_layer_view,
    update_paged_at_layer,
)
from tinyllama_tpu.runtime.staging import (
    flush_staged,
    stage_cache,
    staged_layer_view,
    update_staged_at_layer,
)

CFG = tiny_test_config()
B, C, S = 3, 5, 256
BASE = jnp.array([7, 33, 130], jnp.int32)  # straddles page boundaries


def _pool(kind: str, kv_dtype: str):
    if kind == "mono":
        return init_cache(CFG, B, kv_dtype, S)
    J = S // PAGE_SIZE
    pool = init_paged_cache(CFG, 1 + B * J, B, kv_dtype, S)
    return pool.with_table(
        1 + jnp.arange(B * J, dtype=jnp.int32).reshape(B, J)
    )


def _filled_pool(kind: str, kv_dtype: str, key):
    """A pool with 140 positions written in every row (rows only attend
    up to their own base, so extra rows are harmless)."""
    pool = _pool(kind, kv_dtype)
    upd = update_cache_at_layer if kind == "mono" else update_paged_at_layer
    kall = jax.random.normal(key, (B, 140, CFG.n_kv_heads, CFG.d_head))
    vall = jax.random.normal(
        jax.random.fold_in(key, 2), (B, 140, CFG.n_kv_heads, CFG.d_head)
    )

    def write_all(pool):
        for li in range(CFG.n_layers):
            for t in range(140):
                pool = upd(
                    pool, jnp.int32(li), kall[:, t : t + 1],
                    vall[:, t : t + 1], jnp.full((B,), t, jnp.int32),
                )
        return pool

    return jax.jit(write_all)(pool)


def _view(kind: str):
    return layer_cache_view if kind == "mono" else paged_layer_view


@pytest.mark.parametrize("kind", ["mono", "paged"])
@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
def test_staged_kernel_matches_dense(kind, kv_dtype):
    """The staged-tail flash kernels (interpret mode) match dense GQA
    attention over the staged view at every step of a chunk."""
    key = jax.random.PRNGKey(1)
    pool = _filled_pool(kind, kv_dtype, key)
    st = stage_cache(pool, BASE, C)
    pos = BASE
    li = jnp.int32(1)
    kn = jax.random.normal(
        jax.random.fold_in(key, 3), (C, B, 1, CFG.n_kv_heads, CFG.d_head)
    )
    vn = jax.random.normal(
        jax.random.fold_in(key, 4), (C, B, 1, CFG.n_kv_heads, CFG.d_head)
    )
    fn = flash_staged_attention if kind == "mono" else (
        flash_paged_staged_attention
    )
    for t in range(C):
        st = update_staged_at_layer(st, li, kn[t], vn[t], pos)
        q = jax.random.normal(
            jax.random.fold_in(key, 10 + t),
            (B, 1, CFG.n_heads, CFG.d_head),
        )
        out = fn(q, st, li, pos, interpret=True)
        k_eff, v_eff = staged_layer_view(st, li, jnp.float32)
        ref = gqa_attention(q, k_eff, v_eff, pos[:, None])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )
        pos = pos + 1


@pytest.mark.parametrize("kind", ["mono", "paged"])
@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
def test_flush_matches_direct_writes(kind, kv_dtype):
    """flush_staged reproduces exactly the cache that per-step direct
    writes would have produced, for every valid position."""
    key = jax.random.PRNGKey(2)
    pool = _filled_pool(kind, kv_dtype, key)
    upd = update_cache_at_layer if kind == "mono" else update_paged_at_layer
    kn = jax.random.normal(
        jax.random.fold_in(key, 3), (C, B, 1, CFG.n_kv_heads, CFG.d_head)
    )
    vn = jax.random.normal(
        jax.random.fold_in(key, 4), (C, B, 1, CFG.n_kv_heads, CFG.d_head)
    )
    li = jnp.int32(1)

    st = stage_cache(pool, BASE, C)
    direct = pool
    for t in range(C):
        st = update_staged_at_layer(st, li, kn[t], vn[t], BASE + t)
        direct = upd(direct, li, kn[t], vn[t], BASE + t)
    flushed = flush_staged(st, C)

    fk, fv = _view(kind)(flushed, li, jnp.float32)
    dk, dv = _view(kind)(direct, li, jnp.float32)
    for b in range(B):
        n = int(BASE[b]) + C
        np.testing.assert_array_equal(
            np.asarray(fk[b, :, :n]), np.asarray(dk[b, :, :n])
        )
        np.testing.assert_array_equal(
            np.asarray(fv[b, :, :n]), np.asarray(dv[b, :, :n])
        )


@pytest.mark.parametrize("paged", [False, True])
def test_staged_generate_at_context_limit(paged):
    """The engine's final chunk may overhang max_ctx (full C-step chunks,
    overhang tokens discarded). A clamped flush/view DUS start would
    shift the staged tail and corrupt live positions — staged must stay
    token-identical to the per-step write path all the way to max_ctx.

    Batch of 2 (staggered lengths): the engine only stages at B > 1 (at
    B == 1 the per-row write is already a single DUS, engine.py)."""
    policy = POLICIES["bf16"]
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    params = llama.convert_params(dense, policy)
    prompts = [[3, 7, 1], [5, 2, 9, 4, 8]]
    gen = GenerationConfig(
        n_predict=CFG.max_ctx, greedy=True, eos_token=-1, chunk_size=32
    )
    outs = {}
    for staged in (False, True):
        eng = Engine(
            CFG, policy, params, max_batch=2, paged=paged, staged=staged
        )
        outs[staged], _ = eng.generate_batch(prompts, gen)
    assert [len(o) for o in outs[True]] == [
        CFG.max_ctx - len(p) for p in prompts
    ]
    assert outs[True] == outs[False]


@pytest.mark.parametrize("paged", [False, True])
@pytest.mark.parametrize("policy_name", ["bf16", "q4", "q4-kvi8"])
def test_staged_generate_token_identical(paged, policy_name):
    """Engine decode with staging ON is token-identical to staging OFF
    (the pre-staging per-row write path) across chunk boundaries, at a
    batch with staggered row positions (B == 1 bypasses staging)."""
    policy = POLICIES[policy_name]
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    params = llama.convert_params(dense, policy)
    prompts = [list(range(2, 12)), list(range(3, 9))]
    gen = GenerationConfig(
        n_predict=40, greedy=True, eos_token=-1, chunk_size=7
    )
    outs = {}
    for staged in (False, True):
        eng = Engine(
            CFG, policy, params, max_batch=2, paged=paged, staged=staged
        )
        outs[staged], _ = eng.generate_batch(prompts, gen)
    assert outs[True] == outs[False]
    assert [len(o) for o in outs[True]] == [30, 34]
