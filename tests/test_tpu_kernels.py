"""Compiled-vs-interpret Pallas kernel smoke on a real TPU.

The CPU suite exercises every kernel in interpret mode only; Mosaic
lowering differences (fp16-scale int16 decode, fill-pruned index maps,
segmented grids) are exactly what interpret mode cannot catch. This
suite runs each shipped kernel on one production-like shape, compiled
AND interpreted on the same device, and compares.

Run:  python -m pytest -m tpu tests/test_tpu_kernels.py -q
(conftest.py keeps the real backend when "tpu" appears in the pytest
argv; everything here self-skips without a TPU.)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, tiny_test_config
from tinyllama_tpu.models import llama

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU backend",
)

# production-like dims (TinyLlama's D/F at 2 layers, small vocab/ctx)
CFG = tiny_test_config(
    n_vocab=4096, max_ctx=512, n_embd=2048, n_ffn=5632, n_layers=2,
    n_heads=32, n_kv_heads=4,
)


@functools.lru_cache(maxsize=2)
def _params(kind: str):
    policy = DtypePolicy(kind, "bf16", "i8")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    return llama.convert_params(dense, policy), policy


def _close(compiled, interp, rtol=2e-2, atol=5e-3):
    c = np.asarray(compiled, np.float32)
    i = np.asarray(interp, np.float32)
    np.testing.assert_allclose(c, i, rtol=rtol, atol=atol)


@requires_tpu
@pytest.mark.parametrize("kind", ["q4", "q8"])
@pytest.mark.parametrize("M", [1, 256])
def test_qmatmul_compiled_vs_interpret(kind, M):
    """Both kernel variants (smallm blockdot at M=1, bigm tile-dequant at
    M=256), layer-stacked with fp16 scales shipped as int16 bits."""
    from tinyllama_tpu.ops.pallas.qmatmul import qmatmul

    params, _ = _params(kind)
    w = params["layers"]["wqkv"]
    x = jax.random.normal(jax.random.PRNGKey(1), (M, CFG.n_embd),
                          jnp.float32).astype(jnp.bfloat16)
    li = jnp.int32(1)
    _close(
        qmatmul(x, w, layer=li, interpret=False).astype(jnp.float32),
        qmatmul(x, w, layer=li, interpret=True).astype(jnp.float32),
    )


@requires_tpu
@pytest.mark.parametrize("kind", ["q4", "q8"])
def test_ffn_fused_compiled_vs_interpret(kind):
    from tinyllama_tpu.ops.pallas.ffn_fused import ffn_fused

    params, _ = _params(kind)
    lw = params["layers"]
    h = jax.random.normal(jax.random.PRNGKey(2), (1, 1, CFG.n_embd),
                          jnp.float32).astype(jnp.bfloat16)
    li = jnp.int32(0)
    _close(
        ffn_fused(h, lw["w_gateup"], lw["w_down"], li, CFG, interpret=False),
        ffn_fused(h, lw["w_gateup"], lw["w_down"], li, CFG, interpret=True),
    )


@requires_tpu
@pytest.mark.parametrize("kind", ["q4", "q8"])
def test_fused_layer_kernels_compiled_vs_interpret(kind):
    """The decode-fused trio: norm->wqkv, wo+residual, norm->FFN+residual."""
    from tinyllama_tpu.ops.pallas.decode_fused import (
        fused_norm_qkv, fused_out_residual,
    )
    from tinyllama_tpu.ops.pallas.ffn_fused import ffn_fused_normed

    params, _ = _params(kind)
    lw = params["layers"]
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, CFG.n_embd),
                          jnp.float32).astype(jnp.bfloat16)
    attn = jax.random.normal(jax.random.PRNGKey(4), (1, 1, CFG.n_embd),
                             jnp.float32).astype(jnp.bfloat16)
    nw = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (CFG.n_embd,)))
    li = jnp.int32(1)
    _close(
        fused_norm_qkv(x, nw, lw["wqkv"], li, CFG.norm_eps,
                       CFG.norm_eps_inside_sqrt, interpret=False),
        fused_norm_qkv(x, nw, lw["wqkv"], li, CFG.norm_eps,
                       CFG.norm_eps_inside_sqrt, interpret=True),
    )
    _close(
        fused_out_residual(attn, x, lw["wo"], li, interpret=False),
        fused_out_residual(attn, x, lw["wo"], li, interpret=True),
    )
    _close(
        ffn_fused_normed(x, nw, lw["w_gateup"], lw["w_down"], li, CFG,
                         interpret=False),
        ffn_fused_normed(x, nw, lw["w_gateup"], lw["w_down"], li, CFG,
                         interpret=True),
    )


@requires_tpu
@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
@pytest.mark.parametrize("T", [1, 64])
def test_flash_attention_compiled_vs_interpret(kv_dtype, T):
    """The blocked flash kernel (decode at T=1, prefill at T=64) with the
    fill-pruned causal index maps at a partial fill."""
    from tinyllama_tpu.ops.pallas.flash_prefill import flash_prefill_attention
    from tinyllama_tpu.runtime.kvcache import init_cache, update_cache_at_layer

    B, pos0 = 1, 130  # mid-page fill: exercises tile clamping
    d = CFG.d_head
    rng = np.random.default_rng(6)
    cache = init_cache(CFG, B, kv_dtype)
    li = jnp.int32(1)
    hist = pos0 + T
    kh = jnp.asarray(rng.standard_normal((B, hist, CFG.n_kv_heads, d)),
                     jnp.bfloat16)
    vh = jnp.asarray(rng.standard_normal((B, hist, CFG.n_kv_heads, d)),
                     jnp.bfloat16)
    cache = update_cache_at_layer(cache, li, kh, vh, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.standard_normal((B, T, CFG.n_heads, d)), jnp.bfloat16)
    pos = jnp.full((B,), pos0, jnp.int32)
    _close(
        flash_prefill_attention(q, cache, li, pos, interpret=False),
        flash_prefill_attention(q, cache, li, pos, interpret=True),
    )


@requires_tpu
@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
def test_flash_paged_compiled_vs_interpret(kv_dtype):
    """The page-walk decode kernel: scalar-prefetched table indirection +
    DMA-skipping past the fill."""
    from tinyllama_tpu.ops.pallas.flash_paged import flash_paged_attention
    from tinyllama_tpu.runtime.paged import init_paged_cache, update_paged_at_layer

    B = 2
    d = CFG.d_head
    rng = np.random.default_rng(7)
    cache = init_paged_cache(CFG, n_pages=9, batch=B, kv_dtype=kv_dtype)
    # distinct non-identity page mappings per row
    table = np.zeros((B, cache.table.shape[1]), np.int32)
    table[0, :2] = [3, 5]
    table[1, :2] = [7, 1]
    cache = cache.with_table(jnp.asarray(table))
    li = jnp.int32(1)
    pos = jnp.asarray([130, 40], jnp.int32)
    # two page-aligned bulk writes cover every attended position (rows
    # only read keys at <= pos; later positions may hold anything)
    for start in (0, 128):
        kh = jnp.asarray(rng.standard_normal((B, 128, CFG.n_kv_heads, d)),
                         jnp.bfloat16)
        vh = jnp.asarray(rng.standard_normal((B, 128, CFG.n_kv_heads, d)),
                         jnp.bfloat16)
        cache = update_paged_at_layer(
            cache, li, kh, vh, jnp.full((B,), start, jnp.int32)
        )
    q = jnp.asarray(rng.standard_normal((B, 1, CFG.n_heads, d)), jnp.bfloat16)
    _close(
        flash_paged_attention(q, cache, li, pos, interpret=False),
        flash_paged_attention(q, cache, li, pos, interpret=True),
    )


@requires_tpu
@pytest.mark.parametrize("kv_dtype", ["bf16", "i8"])
def test_decode_heads_compiled_vs_interpret(kv_dtype):
    """The heads-merged T=1 kernel (batched monolithic decode)."""
    from tinyllama_tpu.ops.pallas.flash_prefill import (
        flash_decode_heads_attention,
    )
    from tinyllama_tpu.runtime.kvcache import init_cache, update_cache_at_layer

    B, pos0 = 2, 130
    d = CFG.d_head
    rng = np.random.default_rng(8)
    cache = init_cache(CFG, B, kv_dtype)
    li = jnp.int32(1)
    kh = jnp.asarray(rng.standard_normal((B, pos0 + 1, CFG.n_kv_heads, d)),
                     jnp.bfloat16)
    vh = jnp.asarray(rng.standard_normal((B, pos0 + 1, CFG.n_kv_heads, d)),
                     jnp.bfloat16)
    cache = update_cache_at_layer(cache, li, kh, vh, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.standard_normal((B, 1, CFG.n_heads, d)), jnp.bfloat16)
    pos = jnp.asarray([pos0, 40], jnp.int32)
    _close(
        flash_decode_heads_attention(q, cache, li, pos, interpret=False),
        flash_decode_heads_attention(q, cache, li, pos, interpret=True),
    )


@requires_tpu
@pytest.mark.parametrize("kind", ["q4", "q8"])
def test_attn_out_fused_compiled_vs_interpret(kind):
    """The b1 attention+wo+residual segmented-grid kernel: fill-pruned
    phase A + wo blockdot off the scratch in phase B."""
    from tinyllama_tpu.ops.pallas.attn_out_fused import fused_attn_out
    from tinyllama_tpu.runtime.kvcache import init_cache, update_cache_at_layer

    params, _ = _params(kind)
    lw = params["layers"]
    pos0 = 130
    d = CFG.d_head
    rng = np.random.default_rng(9)
    cache = init_cache(CFG, 1, "i8")
    li = jnp.int32(1)
    kh = jnp.asarray(rng.standard_normal((1, pos0 + 1, CFG.n_kv_heads, d)),
                     jnp.bfloat16)
    vh = jnp.asarray(rng.standard_normal((1, pos0 + 1, CFG.n_kv_heads, d)),
                     jnp.bfloat16)
    cache = update_cache_at_layer(cache, li, kh, vh, jnp.zeros((1,), jnp.int32))
    q = jnp.asarray(rng.standard_normal((1, 1, CFG.n_heads, d)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((1, 1, CFG.n_embd)), jnp.bfloat16)
    pos = jnp.asarray([pos0], jnp.int32)
    _close(
        fused_attn_out(q, cache, li, pos, res, lw["wo"], interpret=False),
        fused_attn_out(q, cache, li, pos, res, lw["wo"], interpret=True),
    )


@requires_tpu
@pytest.mark.parametrize("paged", [False, True])
def test_staged_attention_compiled_vs_interpret(paged):
    """The heads-merged staged-tail kernels (batched serving decode):
    pool walk + chunk-local tail, monolithic and page-walking."""
    from tinyllama_tpu.runtime.staging import (
        stage_cache, update_staged_at_layer,
    )

    B, C = 2, 8
    d = CFG.d_head
    rng = np.random.default_rng(10)
    li = jnp.int32(1)
    base = jnp.asarray([130, 40], jnp.int32)
    if paged:
        from tinyllama_tpu.ops.pallas.flash_paged import (
            flash_paged_staged_attention as attn_fn,
        )
        from tinyllama_tpu.runtime.paged import (
            init_paged_cache, update_paged_at_layer,
        )

        pool = init_paged_cache(CFG, n_pages=9, batch=B, kv_dtype="i8")
        table = np.zeros((B, pool.table.shape[1]), np.int32)
        table[0, :2] = [3, 5]
        table[1, :2] = [7, 1]
        pool = pool.with_table(jnp.asarray(table))
        for start in (0, 128):
            kh = jnp.asarray(
                rng.standard_normal((B, 128, CFG.n_kv_heads, d)),
                jnp.bfloat16)
            vh = jnp.asarray(
                rng.standard_normal((B, 128, CFG.n_kv_heads, d)),
                jnp.bfloat16)
            pool = update_paged_at_layer(
                pool, li, kh, vh, jnp.full((B,), start, jnp.int32)
            )
    else:
        from tinyllama_tpu.ops.pallas.flash_prefill import (
            flash_staged_attention as attn_fn,
        )
        from tinyllama_tpu.runtime.kvcache import (
            init_cache, update_cache_at_layer,
        )

        pool = init_cache(CFG, B, "i8")
        kh = jnp.asarray(rng.standard_normal((B, 131, CFG.n_kv_heads, d)),
                         jnp.bfloat16)
        vh = jnp.asarray(rng.standard_normal((B, 131, CFG.n_kv_heads, d)),
                         jnp.bfloat16)
        pool = update_cache_at_layer(pool, li, kh, vh,
                                     jnp.zeros((B,), jnp.int32))

    st = stage_cache(pool, base, C)
    # stage 3 decode steps' k/v into the tail
    for t in range(3):
        kn = jnp.asarray(rng.standard_normal((B, 1, CFG.n_kv_heads, d)),
                         jnp.bfloat16)
        vn = jnp.asarray(rng.standard_normal((B, 1, CFG.n_kv_heads, d)),
                         jnp.bfloat16)
        st = update_staged_at_layer(st, li, kn, vn, base + t)
    q = jnp.asarray(rng.standard_normal((B, 1, CFG.n_heads, d)), jnp.bfloat16)
    pos = base + 2
    _close(
        attn_fn(q, st, li, pos, interpret=False),
        attn_fn(q, st, li, pos, interpret=True),
    )
