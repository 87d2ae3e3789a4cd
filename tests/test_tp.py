"""shard_map tensor parallelism vs the single-device program.

The TP step must produce the same logits and cache as running the plain
forward on one device — sharding is an execution detail, not a model
change. Runs on the 8 virtual CPU devices from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.ops.rope import rope_table
from tinyllama_tpu.parallel import tp as tpmod
from tinyllama_tpu.parallel.mesh import make_mesh
from tinyllama_tpu.runtime.kvcache import init_cache

CFG = tiny_test_config(n_heads=8, n_kv_heads=4, n_embd=256, n_ffn=512)


def _single_device_step(cfg, policy, params, cache, tokens, pos, last, ropes):
    hidden, cache = llama.forward(
        cfg, policy, params, tokens, cache, pos, ropes
    )
    h_last = jnp.take_along_axis(
        hidden, last[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return llama.lm_head_logits(params, h_last), cache


@pytest.mark.parametrize("wdtype", ["f32", "q8"])
@pytest.mark.parametrize("tp,dp", [(2, 1), (4, 2)])
def test_tp_step_matches_single_device(wdtype, tp, dp):
    policy = DtypePolicy(wdtype, "f32", "f32")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    params = llama.convert_params(dense, policy)
    ropes = rope_table(CFG.max_ctx, CFG.d_head, CFG.rope_theta)

    B, T = dp, 6
    tokens = jnp.tile(jnp.arange(2, 2 + T, dtype=jnp.int32)[None], (B, 1))
    pos = jnp.zeros((B,), jnp.int32)
    last = jnp.full((B,), T - 1, jnp.int32)

    want_logits, want_cache = _single_device_step(
        CFG, policy, params, init_cache(CFG, B, policy.kv_dtype),
        tokens, pos, last, ropes,
    )

    mesh = make_mesh(tp=tp, dp=dp)
    tparams = tpmod.tp_permute_params(params, CFG, tp)
    tparams = tpmod.place(mesh, tparams, tpmod.param_partition_specs(tparams))
    cache = init_cache(CFG, B, policy.kv_dtype)
    cache = tpmod.place(mesh, cache, tpmod.cache_partition_specs(cache))
    step = tpmod.make_tp_step(
        CFG, policy, mesh, ropes, False, tparams, cache
    )
    got_logits, got_cache = step(tparams, cache, tokens, pos, last)

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), rtol=2e-5, atol=2e-5
    )
    # cache contents must match too (kv-head shards reassemble the whole)
    np.testing.assert_allclose(
        np.asarray(got_cache.k), np.asarray(want_cache.k), rtol=2e-5,
        atol=2e-5,
    )


def test_tp_permute_roundtrips_dequantized_values():
    """Shard-major permutation must preserve the multiset of rows and put
    shard s's q rows where local slicing expects them."""
    policy = DtypePolicy("q4", "f32", "f32")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    params = llama.convert_params(dense, policy)
    tp = 2
    perm = tpmod.tp_permute_params(params, CFG, tp)
    from tinyllama_tpu.quant.codec import dequantize

    w = np.asarray(dequantize(params["layers"]["wqkv"]))  # [L, K, N]
    wp = np.asarray(dequantize(perm["layers"]["wqkv"]))
    D, kv = CFG.n_embd, CFG.kv_dim
    # shard 0's local [q|k|v]: q rows 0..D/2, k rows D..D+kv/2, ...
    want = np.concatenate(
        [w[..., : D // 2], w[..., D : D + kv // 2],
         w[..., D + kv : D + kv + kv // 2]], axis=-1,
    )
    np.testing.assert_array_equal(wp[..., : want.shape[-1]], want)


def test_tp_step_runs_pallas_kernels():
    """The shard_map path must execute the actual Pallas kernels
    (qmatmul with in-kernel layer indexing + flash attention) per shard —
    GSPMD cannot partition custom calls, this path is why TP works with
    them. Interpret mode on the CPU mesh; logits must track the
    non-Pallas TP step to kernel-precision tolerance."""
    policy = DtypePolicy("q4", "f32", "f32")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    params = llama.convert_params(dense, policy)
    ropes = rope_table(CFG.max_ctx, CFG.d_head, CFG.rope_theta)
    mesh = make_mesh(tp=2, dp=1)
    tparams = tpmod.tp_permute_params(params, CFG, 2)
    tparams = tpmod.place(mesh, tparams, tpmod.param_partition_specs(tparams))
    tokens = jnp.asarray([[2, 3, 4, 5]], jnp.int32)
    pos = jnp.zeros((1,), jnp.int32)
    last = jnp.full((1,), 3, jnp.int32)

    outs = {}
    for use_pallas in (False, True):
        cache = init_cache(CFG, 1, policy.kv_dtype)
        cache = tpmod.place(mesh, cache, tpmod.cache_partition_specs(cache))
        step = tpmod.make_tp_step(
            CFG, policy, mesh, ropes, use_pallas, tparams, cache
        )
        logits, _ = step(tparams, cache, tokens, pos, last)
        outs[use_pallas] = np.asarray(logits)
        assert np.isfinite(outs[use_pallas]).all()
    scale = np.abs(outs[False]).max() + 1e-9
    assert np.abs(outs[True] - outs[False]).max() / scale < 2e-2


@pytest.mark.parametrize("kv_dtype", ["f32", "i8"])
def test_engine_tp_generate_matches_single(kv_dtype):
    """Engine(tp=2) must emit the same greedy tokens as Engine(tp=1) —
    the CLI's --tp path end-to-end (prefill, chunked decode, sampling)."""
    from tinyllama_tpu.config import GenerationConfig
    from tinyllama_tpu.runtime.engine import Engine

    policy = DtypePolicy("q8", "f32", kv_dtype)
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(5), jnp.float32)
    params = llama.convert_params(dense, policy)
    gen = GenerationConfig(n_predict=24, greedy=True, eos_token=-2,
                           chunk_size=4)
    prompt = list(range(2, 12))

    single = Engine(CFG, policy, params, use_pallas=False)
    want, _ = single.generate(prompt, gen)

    eng = Engine(CFG, policy, params, tp=2, mesh=make_mesh(tp=2, dp=1),
                 use_pallas=False)
    got, _ = eng.generate(prompt, gen)
    assert want and got == want


def test_engine_tp_generate_batch():
    """Batched decode through the TP chunk (dp=1 mesh, B=3 rows)."""
    from tinyllama_tpu.config import GenerationConfig
    from tinyllama_tpu.runtime.engine import Engine

    policy = DtypePolicy("q4", "f32", "f32")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(6), jnp.float32)
    params = llama.convert_params(dense, policy)
    gen = GenerationConfig(n_predict=16, greedy=True, eos_token=-2,
                           chunk_size=4)
    prompts = [list(range(2, 8)), list(range(3, 13)), [7, 8, 9]]

    single = Engine(CFG, policy, params, max_batch=3, use_pallas=False)
    want, _ = single.generate_batch(prompts, gen)

    eng = Engine(CFG, policy, params, max_batch=3, tp=4,
                 mesh=make_mesh(tp=4, dp=1), use_pallas=False)
    got, _ = eng.generate_batch(prompts, gen)
    assert got == want


class TestTpOverlap:
    """--tp-overlap: ring reduce-scatter + all-gather replacing the two
    per-block psums, with matmul chunks interleaved between ppermute
    hops (parallel/tp.py ring_row_parallel)."""

    def _engines(self, tp_overlap):
        import jax
        import jax.numpy as jnp

        from tinyllama_tpu.config import DtypePolicy, tiny_test_config
        from tinyllama_tpu.models import llama
        from tinyllama_tpu.runtime.engine import Engine

        cfg = tiny_test_config(n_heads=8, n_kv_heads=4, n_embd=256,
                               n_ffn=512)
        policy = DtypePolicy("q8", "f32", "f32")
        params = llama.convert_params(
            llama.init_dense_params(cfg, jax.random.PRNGKey(0), jnp.float32),
            policy,
        )
        return cfg, Engine(cfg, policy, params, tp=4, use_pallas=False,
                           tp_overlap=tp_overlap)

    def test_overlap_matches_psum_baseline(self):
        from tinyllama_tpu.config import GenerationConfig

        gen = GenerationConfig(n_predict=24, greedy=True, eos_token=-2,
                               chunk_size=4)
        prompt = list(range(2, 14))
        _, base = self._engines(False)
        want, _ = base.generate(prompt, gen)
        _, ovl = self._engines(True)
        got, _ = ovl.generate(prompt, gen)
        assert got == want

    def test_collectives_interleave_with_compute(self):
        """Structure proof: the lowered decode step must contain the ring
        (2*(tp-1) collective-permutes per layer scan body) and between
        consecutive permute hops there must be compute (the next chunk's
        matmul) — i.e. permutes are NOT back-to-back, unlike a bare
        all-reduce decomposition."""
        import jax.numpy as jnp

        cfg, eng = self._engines(True)
        step = eng._step_fn(1)
        import jax

        cache = eng.new_cache(1)
        args = (eng.params, cache, jnp.zeros((1, 1), jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        hlo = jax.jit(step).lower(*args).as_text()
        n_perm = hlo.count("stablehlo.collective_permute")
        # scan body: 2 rings x (tp-1)=3 hops each
        assert n_perm >= 6, f"expected ring ppermutes, found {n_perm}"
        assert "stablehlo.all_gather" in hlo
        # interleaving: the next chunk's matmul sits between permute
        # hops (a bare psum decomposition would have none)
        first = hlo.find("stablehlo.collective_permute")
        last = hlo.rfind("stablehlo.collective_permute")
        between = hlo[first:last]
        assert between.count("stablehlo.dot_general") >= n_perm - 2, \
            "no compute between permute hops"


def test_q4g_tp_pack_group_guard():
    """A tp that would split a q4g pack group across row-parallel
    K-shards must be REFUSED: the per-shard kernel re-derives the pack
    group from its local K and would decode garbage silently (e.g.
    TinyLlama w_down K=5632, pack group 256, tp=4 -> local 1408 reads
    as group 128). tp values that keep shards group-aligned pass."""
    from tinyllama_tpu.config import DtypePolicy, tiny_test_config
    from tinyllama_tpu.models import llama
    from tinyllama_tpu.parallel import tp as tpmod

    cfg = tiny_test_config(n_embd=256, n_ffn=768, n_heads=4, n_kv_heads=2)
    params = llama.convert_params(
        llama.init_dense_params(cfg, jax.random.PRNGKey(0)),
        DtypePolicy("q4g", "f32", "i8"),
    )
    # w_down K=768: pack group 256 -> 3 groups; tp=2 splits one
    with pytest.raises(ValueError, match="pack group"):
        tpmod.tp_permute_params(params, cfg, 2)

    cfg_ok = tiny_test_config(n_embd=512, n_ffn=1024, n_heads=4,
                              n_kv_heads=2)
    params_ok = llama.convert_params(
        llama.init_dense_params(cfg_ok, jax.random.PRNGKey(0)),
        DtypePolicy("q4g", "f32", "i8"),
    )
    tpmod.tp_permute_params(params_ok, cfg_ok, 2)  # 1024/2=512 aligned
