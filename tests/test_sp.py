"""Engine-level sequence-parallel prefill (parallel/sp.py).

A T-sharded ring-attention prefill over the 8-virtual-device CPU mesh
must hand off K/V into the ordinary cache such that the whole
generation (prefill + dense decode) is token-identical to the
single-device Engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.parallel.mesh import make_mesh
from tinyllama_tpu.parallel.sp import seq_parallel_prefill
from tinyllama_tpu.runtime.engine import Engine
from tinyllama_tpu.runtime.kvcache import layer_cache_view

CFG = tiny_test_config(max_ctx=256)
F32 = DtypePolicy("f32", "f32", "f32")


@pytest.fixture(scope="module")
def dense_params():
    return llama.init_dense_params(CFG, jax.random.PRNGKey(0), jnp.float32)


def test_sp_prefill_matches_forward(dense_params):
    """T-sharded prefill == the dense forward: final hidden and K/V."""
    from tinyllama_tpu.runtime.kvcache import init_cache

    mesh = make_mesh(tp=1, dp=8)
    T = 64
    toks = jnp.asarray([list(range(2, 2 + T))], jnp.int32)
    rope = (
        jax.jit(lambda: __import__("tinyllama_tpu.ops.rope",
                                   fromlist=["rope_table"]).rope_table(
            CFG.max_ctx, CFG.d_head, CFG.rope_theta))()
    )
    hidden, k_all, v_all, _ = seq_parallel_prefill(
        CFG, F32, dense_params, toks, rope, mesh,
    )

    cache = init_cache(CFG, 1, "f32", CFG.max_ctx)
    want_hidden, cache = llama.forward(
        CFG, F32, dense_params, toks, cache, jnp.zeros((1,), jnp.int32),
        rope, use_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(hidden[0], np.float32),
        np.asarray(want_hidden[0], np.float32), rtol=2e-4, atol=2e-4,
    )
    for li in (0, CFG.n_layers - 1):
        kw, vw = layer_cache_view(cache, jnp.int32(li), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(k_all[li, :, :, :T]), np.asarray(kw[:, :, :T]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(v_all[li, :, :, :T]), np.asarray(vw[:, :, :T]),
            rtol=2e-4, atol=2e-4,
        )


@pytest.mark.parametrize("plen", [37, 64])  # ragged + exact shard fits
@pytest.mark.parametrize("policy", [F32, DtypePolicy("q8", "f32", "i8")])
def test_sp_generate_token_identical(dense_params, plen, policy):
    """Engine(sp=8).generate == Engine().generate, token for token
    (f32, and q8 weights + int8-KV handoff quantization)."""
    params = llama.convert_params(dense_params, policy)
    gen = GenerationConfig(n_predict=plen + 12, greedy=True, eos_token=-1,
                           chunk_size=4)
    prompt = [2 + (i % 40) for i in range(plen)]

    want, _ = Engine(CFG, policy, params).generate(prompt, gen)
    got, _ = Engine(CFG, policy, params, sp=8).generate(prompt, gen)
    assert got == want
