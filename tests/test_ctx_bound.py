"""Fill-bucketed attention grids (`ctx_bound`) are an execution detail.

Every decode-attention kernel accepts a host-static `ctx_bound` (a
promise that every attended position is < ctx_bound) that shrinks its
key-tile / page-walk grid from max_ctx to the live fill bucket.

Numerics contract: the paged kernels keep a fixed PAGE_SIZE tile, so a
bound is pure grid-machinery savings and output is BIT-identical. The
monolithic kernels additionally shrink the key tile with the bound
(`_bound_bs`: 512 unbounded -> max(128, bound // 4)) so the walk cost
tracks fill — a measured perf win — which splits the online-softmax
accumulation into more partial sums in a different order. Those paths
are asserted to a few f32 ulps instead (observed max |delta| ~3e-8);
the end-to-end chunked paths must still match token for token.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.ops.pallas.flash_paged import (
    flash_paged_attention,
    flash_paged_staged_attention,
)
from tinyllama_tpu.ops.pallas.flash_prefill import (
    _bound_tiles,
    flash_decode_heads_attention,
    flash_staged_attention,
)
from tinyllama_tpu.runtime.engine import Engine, _ctx_bucket
from tinyllama_tpu.runtime.kvcache import init_cache, update_cache_at_layer
from tinyllama_tpu.runtime.paged import (
    PAGE_SIZE,
    init_paged_cache,
    paged_layer_view,
    update_paged_at_layer,
)
from tinyllama_tpu.runtime.staging import stage_cache, update_staged_at_layer

CFG = tiny_test_config(max_ctx=512)
B, S = 2, 512
FILL = jnp.array([70, 133], jnp.int32)  # both inside the first 256 bucket


def test_ctx_bucket():
    assert _ctx_bucket(1, 2048) == 512
    assert _ctx_bucket(512, 2048) == 512
    assert _ctx_bucket(513, 2048) == 1024
    assert _ctx_bucket(2049, 2048) == 2048
    assert _ctx_bucket(100, 2048, minimum=256) == 256


def test_bound_tiles():
    assert _bound_tiles(2048, 512, None) == 4
    assert _bound_tiles(2048, 512, 256) == 1
    assert _bound_tiles(2048, 512, 513) == 2
    assert _bound_tiles(2048, 512, 4096) == 4
    assert _bound_tiles(2048, 512, 1) == 1


def _mono_cache(key, kv_dtype="i8"):
    cache = init_cache(CFG, B, kv_dtype, S)
    hist = int(FILL.max())
    kh = jax.random.normal(key, (B, hist, CFG.n_kv_heads, CFG.d_head))
    vh = jax.random.normal(jax.random.fold_in(key, 1), kh.shape)
    return update_cache_at_layer(
        cache, jnp.int32(0), kh, vh, jnp.zeros((B,), jnp.int32)
    )


def _paged_cache(key, kv_dtype="i8"):
    J = S // PAGE_SIZE
    pool = init_paged_cache(CFG, 1 + B * J, B, kv_dtype, S)
    pool = pool.with_table(
        1 + jnp.arange(B * J, dtype=jnp.int32).reshape(B, J)
    )
    hist = int(FILL.max())
    kh = jax.random.normal(key, (B, hist, CFG.n_kv_heads, CFG.d_head))
    vh = jax.random.normal(jax.random.fold_in(key, 1), kh.shape)
    return update_paged_at_layer(
        pool, jnp.int32(0), kh, vh, jnp.zeros((B,), jnp.int32)
    )


def _q(key):
    return jax.random.normal(
        jax.random.fold_in(key, 9), (B, 1, CFG.n_heads, CFG.d_head)
    )


@pytest.mark.parametrize("bound", [256, 512])
def test_decode_heads_bounded(bound):
    key = jax.random.PRNGKey(0)
    cache = _mono_cache(key)
    q, pos = _q(key), FILL - 1
    want = flash_decode_heads_attention(
        q, cache, jnp.int32(0), pos, interpret=True
    )
    got = flash_decode_heads_attention(
        q, cache, jnp.int32(0), pos, interpret=True, ctx_bound=bound
    )
    # _bound_bs shrinks the key tile (512 -> 128) under a bound, which
    # reorders the online-softmax partial sums: ulp-level drift only.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=3e-7
    )


@pytest.mark.parametrize("bound", [256, 512])
def test_paged_bounded(bound):
    key = jax.random.PRNGKey(1)
    pool = _paged_cache(key)
    q, pos = _q(key), FILL - 1
    want = flash_paged_attention(q, pool, jnp.int32(0), pos, interpret=True)
    got = flash_paged_attention(
        q, pool, jnp.int32(0), pos, interpret=True, ctx_bound=bound
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("kind", ["mono", "paged"])
def test_staged_bounded(kind):
    key = jax.random.PRNGKey(2)
    pool = _mono_cache(key) if kind == "mono" else _paged_cache(key)
    st = stage_cache(pool, FILL, 4)
    li, pos = jnp.int32(0), FILL
    kn = jax.random.normal(
        jax.random.fold_in(key, 3), (B, 1, CFG.n_kv_heads, CFG.d_head)
    )
    vn = jax.random.normal(jax.random.fold_in(key, 4), kn.shape)
    st = update_staged_at_layer(st, li, kn, vn, pos)
    q = _q(key)
    fn = flash_staged_attention if kind == "mono" else (
        flash_paged_staged_attention
    )
    want = fn(q, st, li, pos, interpret=True)
    got = fn(q, st, li, pos, interpret=True, ctx_bound=256)
    if kind == "paged":
        # fixed PAGE_SIZE tile: a bound only trims the page walk
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    else:
        # monolithic staged shrinks the pool tile via _bound_bs: the
        # online-softmax accumulation reorders (ulp-level drift only)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=3e-7
        )


def test_paged_view_bounded():
    key = jax.random.PRNGKey(3)
    pool = _paged_cache(key, "f32")
    kf, vf = paged_layer_view(pool, jnp.int32(0), jnp.float32)
    kb, vb = paged_layer_view(pool, jnp.int32(0), jnp.float32, 256)
    assert kb.shape[2] == 256
    np.testing.assert_array_equal(np.asarray(kb), np.asarray(kf[:, :, :256]))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(vf[:, :, :256]))


@pytest.mark.parametrize("paged", [False, True])
def test_generate_bounded_matches_wide_chunks(paged):
    """End to end: chunked generation (which now picks per-chunk ctx
    bounds) is token-identical to an explicitly max_ctx-bounded chunk."""
    cfg = tiny_test_config(max_ctx=128)
    policy = DtypePolicy("q8", "f32", "i8")
    dense = llama.init_dense_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    params = llama.convert_params(dense, policy)

    prompt = list(range(2, 12))
    gen = GenerationConfig(n_predict=40, greedy=True, eos_token=-1,
                           chunk_size=8)

    eng = Engine(cfg, policy, params, paged=paged)
    out, _ = eng.generate(prompt, gen)

    eng_wide = Engine(cfg, policy, params, paged=paged)
    cache = eng_wide.new_cache(1)
    logits, cache, lens = eng_wide.prefill(cache, [prompt])
    chunk = eng_wide._chunk_fn(8, True, 50, paged=paged,
                               ctx_bound=cfg.max_ctx)
    pos = jnp.asarray(lens, jnp.int32)
    key = jax.random.PRNGKey(gen.seed)
    toks_all = []
    for _ in range(4):
        toks, done, logits, cache, pos, key = chunk(
            params, cache, logits, pos, key, jnp.int32(-1),
            jnp.float32(1.0),
        )
        toks_all.extend(int(t) for t in np.asarray(toks)[0])
    assert toks_all[: len(out)] == out[: len(toks_all)]
