"""Fused decode-layer kernels vs the unfused path.

decode_fused.py folds rms_norm into the wqkv/gate-up matmuls and the
residual adds into the wo/down accumulators. The forward picks the fused
path automatically at M <= 8 with quantized kn weights (models/llama.py
`fused`); these tests pin it against the XLA fallback forward and the
unfused Pallas ops. Inputs are f32 (CPU interpret mode can't run bf16
dots); tolerances cover the f32-vs-bf16 residual-add rounding the fusion
removes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.ops.linear import linear
from tinyllama_tpu.ops.norms import rms_norm
from tinyllama_tpu.ops.pallas.decode_fused import (
    decode_fused_eligible,
    fused_norm_qkv,
    fused_out_residual,
)
from tinyllama_tpu.ops.pallas.ffn_fused import ffn_fused_normed
from tinyllama_tpu.runtime.kvcache import init_cache

CFG = tiny_test_config()


@pytest.fixture(scope="module", params=["q4", "q8", "q4g"])
def qparams(request):
    policy = DtypePolicy(request.param, "f32", "f32")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    return llama.convert_params(dense, policy), policy


def _x(B=1, T=1, seed=1):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (B, T, CFG.n_embd), jnp.float32
    )


@pytest.mark.parametrize("B", [1, 32])  # 32 = serving tile-dequant body
def test_fused_norm_qkv_matches_unfused(qparams, B):
    params, _ = qparams
    lw = params["layers"]
    x = _x(B=B)
    li = jnp.int32(1)
    nw = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (CFG.n_embd,)))
    got = fused_norm_qkv(x, nw, lw["wqkv"], li, CFG.norm_eps,
                         CFG.norm_eps_inside_sqrt, interpret=True)
    h = rms_norm(x, nw, CFG.norm_eps, CFG.norm_eps_inside_sqrt)
    want = linear(h, lw["wqkv"], use_pallas=False, layer=li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("B", [1, 32])
def test_fused_out_residual_matches_unfused(qparams, B):
    params, _ = qparams
    lw = params["layers"]
    attn = _x(B=B, seed=3)
    res = _x(B=B, seed=4)
    li = jnp.int32(0)
    got = fused_out_residual(attn, res, lw["wo"], li, interpret=True)
    want = res + linear(attn, lw["wo"], use_pallas=False, layer=li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("B", [1, 24])
def test_ffn_fused_normed_matches_unfused(qparams, B):
    params, _ = qparams
    lw = params["layers"]
    x = _x(B=B, seed=5)
    li = jnp.int32(1)
    nw = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (CFG.n_embd,)))
    got = ffn_fused_normed(x, nw, lw["w_gateup"], lw["w_down"], li, CFG,
                           interpret=True)

    h = rms_norm(x, nw, CFG.norm_eps, CFG.norm_eps_inside_sqrt)
    gu = linear(h, lw["w_gateup"], use_pallas=False, layer=li)
    gate, up = gu[..., : CFG.n_ffn], gu[..., CFG.n_ffn:]
    inner = jax.nn.silu(gate) * up
    want = x + linear(inner, lw["w_down"], use_pallas=False, layer=li)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kv_dtype", ["f32", "i8"])
@pytest.mark.parametrize("pos0", [0, 5, 100])
def test_fused_attn_out_matches_unfused(qparams, kv_dtype, pos0):
    """attention + wo + residual in one call == gqa fallback + linear,
    across fills (incl. pos 0 and past the first key tile) and kv
    dtypes. d_head=32 here, so each q4 KN_GROUP spans two heads of the
    attention scratch — the cross-head slicing case."""
    from tinyllama_tpu.ops.attention import gqa_attention
    from tinyllama_tpu.ops.pallas.attn_out_fused import fused_attn_out
    from tinyllama_tpu.runtime.kvcache import (
        layer_cache_view,
        update_cache_at_layer,
    )

    params, _ = qparams
    lw = params["layers"]
    H, Kh, d = CFG.n_heads, CFG.n_kv_heads, CFG.d_head
    li = jnp.int32(1)
    key = jax.random.PRNGKey(pos0)
    ks = jax.random.split(key, 4)
    cache = init_cache(CFG, 1, kv_dtype)
    k_all = jax.random.normal(ks[0], (1, pos0 + 1, Kh, d), jnp.float32)
    v_all = jax.random.normal(ks[1], (1, pos0 + 1, Kh, d), jnp.float32)
    cache = update_cache_at_layer(cache, li, k_all, v_all,
                                  jnp.zeros((1,), jnp.int32))
    q = jax.random.normal(ks[2], (1, 1, H, d), jnp.float32)
    res = jax.random.normal(ks[3], (1, 1, CFG.n_embd), jnp.float32)
    pos = jnp.asarray([pos0], jnp.int32)

    k_eff, v_eff = layer_cache_view(cache, li, jnp.float32)
    attn = gqa_attention(q, k_eff, v_eff, pos[:, None])
    want = res + linear(attn.reshape(1, 1, H * d), lw["wo"],
                        use_pallas=False, layer=li)
    got = fused_attn_out(q, cache, li, pos, res, lw["wo"],
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fused_forward_matches_fallback(qparams):
    """End-to-end: the pallas forward (which auto-selects the fused layer
    path at T=1) must match the XLA fallback forward on the same cache."""
    params, policy = qparams
    assert decode_fused_eligible(
        CFG, params["layers"], 1, None, False, jnp.int32(0)
    )
    tokens = jnp.asarray([[5]], jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)

    h_pal, _ = llama.forward(
        CFG, policy, params, tokens, init_cache(CFG, 1, "f32"), pos,
        use_pallas=True,
    )
    h_ref, _ = llama.forward(
        CFG, policy, params, tokens, init_cache(CFG, 1, "f32"), pos,
        use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_decode_sequence_matches_fallback(qparams):
    """Multi-step greedy decode through the fused path tracks the
    fallback (same tokens over 12 steps)."""
    params, policy = qparams
    from tinyllama_tpu.config import GenerationConfig
    from tinyllama_tpu.runtime.engine import Engine

    gen = GenerationConfig(n_predict=16, greedy=True, eos_token=-1)
    prompt = [3, 7, 1]
    want, _ = Engine(CFG, policy, params, use_pallas=False).generate(
        prompt, gen
    )
    got, _ = Engine(CFG, policy, params, use_pallas=True).generate(
        prompt, gen
    )
    assert got == want
