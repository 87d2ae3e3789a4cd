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


@pytest.mark.parametrize("mode", ["paged", "sptp", "sptp_paged"])
def test_sp_generalized_token_identical(dense_params, mode):
    """Round-5 SP generalization: the paged handoff (_write_kv_paged),
    the sp x tp composed mesh (ring attention over local heads + two
    psums per block, decode replicated over the sp axis), and both at
    once must all stay token-identical to the single-device Engine."""
    policy = DtypePolicy("q8", "f32", "i8")
    params = llama.convert_params(dense_params, policy)
    gen = GenerationConfig(n_predict=52, greedy=True, eos_token=-1,
                           chunk_size=4)
    prompt = [2 + (i % 40) for i in range(41)]
    want, _ = Engine(CFG, policy, params).generate(prompt, gen)

    kw = dict(  # tp=2: tiny-test has 2 kv heads
        paged=dict(sp=8, paged=True),
        sptp=dict(sp=4, tp=2),
        sptp_paged=dict(sp=4, tp=2, paged=True),
    )[mode]
    got, _ = Engine(CFG, policy, params, **kw).generate(prompt, gen)
    assert got == want


def test_scheduler_admits_long_prompt_via_sp(dense_params):
    """A near-max_ctx prompt through the ContinuousBatcher on an
    Engine(sp=8): the long prompt must be admitted ALONE (B == 1, so
    the sequence-parallel prefill path fires) without disturbing the
    short requests batched around it, and every output must match the
    dedicated single-engine run."""
    from tinyllama_tpu.runtime.scheduler import ContinuousBatcher

    policy = DtypePolicy("q8", "f32", "i8")
    params = llama.convert_params(dense_params, policy)
    gen = GenerationConfig(n_predict=8, greedy=True, eos_token=-1,
                           chunk_size=4)
    long_prompt = [2 + (i % 40) for i in range(CFG.max_ctx - 16)]  # 240
    shorts = [[3, 7, 1], [9, 2, 4, 8]]

    def gen_for(p):  # dedicated-run budget: exactly 8 new tokens
        return GenerationConfig(n_predict=len(p) + 8, greedy=True,
                                eos_token=-1, chunk_size=4)

    single = Engine(CFG, policy, params)
    want_long, _ = single.generate(long_prompt, gen_for(long_prompt))
    want_short = [single.generate(p, gen_for(p))[0] for p in shorts]

    eng = Engine(CFG, policy, params, max_batch=2, sp=8, paged=True)
    sched = ContinuousBatcher(eng, gen, max_batch=2, paged=True,
                              sp_admit_threshold=128)
    ids = [sched.submit(shorts[0], max_new=8),
           sched.submit(long_prompt, max_new=8),
           sched.submit(shorts[1], max_new=8)]
    res = sched.run()
    assert res[ids[1]].output == want_long
    assert res[ids[0]].output == want_short[0]
    assert res[ids[2]].output == want_short[1]
