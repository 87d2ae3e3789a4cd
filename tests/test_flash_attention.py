"""Flash decode/prefill Pallas kernels vs the XLA fallback attention.

Both kernels must reproduce gqa_attention (ops/attention.py) on the same
cache state — the fallback is itself validated by the prefill≡decode
tests in test_model.py. Inputs are f32 here because interpret-mode XLA
on CPU cannot execute bf16 x bf16 -> f32 dots; on TPU the kernels run
bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import tiny_test_config
from tinyllama_tpu.ops.attention import gqa_attention
from tinyllama_tpu.ops.pallas.flash_prefill import (
    flash_decode_heads_attention,
    flash_prefill_attention,
)
from tinyllama_tpu.runtime.kvcache import (
    init_cache,
    layer_cache_view,
    update_cache_at_layer,
)

CFG = tiny_test_config(n_heads=4, n_kv_heads=2, n_embd=256, max_ctx=128)


def _setup(kv_dtype, B=2, T=1, pos0=5, seed=0):
    rng = np.random.default_rng(seed)
    d = CFG.d_head
    cache = init_cache(CFG, B, kv_dtype)
    li = jnp.int32(1)
    pos = jnp.asarray([pos0, pos0 + 3][:B], jnp.int32)
    # fill history [0, pos+T) with random k/v via cache updates
    hist = int(pos.max()) + T
    kh = jnp.asarray(rng.standard_normal((B, hist, CFG.n_kv_heads, d)),
                     jnp.float32).astype(jnp.float32)
    vh = jnp.asarray(rng.standard_normal((B, hist, CFG.n_kv_heads, d)),
                     jnp.float32).astype(jnp.float32)
    cache = update_cache_at_layer(cache, li, kh, vh, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.standard_normal((B, T, CFG.n_heads, d)),
                    jnp.float32).astype(jnp.float32)
    q_positions = pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    return cache, li, pos, q, q_positions


def _fallback(q, cache, li, q_positions):
    k_eff, v_eff = layer_cache_view(cache, li, q.dtype)
    return gqa_attention(q, k_eff, v_eff, q_positions)


@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
def test_decode_matches_fallback(kv_dtype):
    """T=1 through the blocked kernel — the production decode path
    (models/llama.py uses flash_prefill_attention for decode too)."""
    cache, li, pos, q, q_positions = _setup(kv_dtype, T=1)
    want = np.asarray(_fallback(q, cache, li, q_positions), np.float32)
    got = np.asarray(
        flash_prefill_attention(q, cache, li, pos, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
@pytest.mark.parametrize("pos0", [0, 5, 100])
def test_decode_heads_matches_fallback(kv_dtype, pos0):
    """The heads-merged T=1 kernel (the production b>=1 monolithic
    decode path) vs the XLA fallback, across fills incl. pos 0 and a
    fill crossing key-tile boundaries."""
    cache, li, pos, q, q_positions = _setup(kv_dtype, T=1, pos0=pos0)
    want = np.asarray(_fallback(q, cache, li, q_positions), np.float32)
    got = np.asarray(
        flash_decode_heads_attention(q, cache, li, pos, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_decode_heads_matches_blocked_kernel():
    """heads-merged decode == the generic blocked kernel on the same
    state (both fill-pruned; staggered batch rows)."""
    cache, li, pos, q, q_positions = _setup("i8", B=2, T=1, pos0=37)
    a = np.asarray(
        flash_decode_heads_attention(q, cache, li, pos, interpret=True),
        np.float32,
    )
    b = np.asarray(
        flash_prefill_attention(q, cache, li, pos, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
@pytest.mark.parametrize("T", [4, 16])
def test_prefill_matches_fallback(kv_dtype, T):
    cache, li, pos, q, q_positions = _setup(kv_dtype, T=T, pos0=3)
    want = np.asarray(_fallback(q, cache, li, q_positions), np.float32)
    got = np.asarray(
        flash_prefill_attention(q, cache, li, pos, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_prefill_then_decode_consistency():
    """Flash prefill of T tokens then flash decode of the next must agree
    with one flash prefill of T+1 (the start_pos invariant, kernel-only)."""
    kv = "bf16"
    B, T = 1, 8
    rng = np.random.default_rng(7)
    d = CFG.d_head
    li = jnp.int32(0)
    kh = jnp.asarray(rng.standard_normal((B, T + 1, CFG.n_kv_heads, d)),
                     jnp.float32).astype(jnp.float32)
    vh = jnp.asarray(rng.standard_normal((B, T + 1, CFG.n_kv_heads, d)),
                     jnp.float32).astype(jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, T + 1, CFG.n_heads, d)),
                    jnp.float32).astype(jnp.float32)
    zero = jnp.zeros((B,), jnp.int32)

    cache = update_cache_at_layer(init_cache(CFG, B, kv), li, kh, vh, zero)
    full = flash_prefill_attention(q, cache, li, zero, interpret=True)

    cache2 = update_cache_at_layer(
        init_cache(CFG, B, kv), li, kh[:, :T], vh[:, :T], zero
    )
    cache2 = update_cache_at_layer(
        cache2, li, kh[:, T:], vh[:, T:], jnp.full((B,), T, jnp.int32)
    )
    step = flash_prefill_attention(
        q[:, T:], cache2, li, jnp.full((B,), T, jnp.int32), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(step, np.float32), np.asarray(full[:, T:], np.float32),
        rtol=2e-2, atol=2e-3,
    )
