"""Tensor/data-parallel sharding tests on a virtual 8-device CPU mesh.

Verifies (a) the sharded program produces the same logits as single-device,
(b) weights are actually partitioned (per-device memory shrinks), for both
dense and quantized parameter pytrees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.parallel.mesh import make_mesh
from tinyllama_tpu.parallel.sharding import cache_sharding, param_sharding
from tinyllama_tpu.runtime.engine import Engine

CFG = tiny_test_config()
F32 = DtypePolicy("f32", "f32", "f32")


@pytest.fixture(scope="module")
def dense_params():
    return llama.init_dense_params(CFG, jax.random.PRNGKey(0))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("tp,dp", [(2, 1), (4, 1), (2, 2)])
def test_sharded_generation_matches_single_device(dense_params, tp, dp):
    gen = GenerationConfig(n_predict=16, greedy=True, eos_token=-1)
    prompt = [3, 7, 1, 9]

    ref_eng = Engine(CFG, F32, dense_params)
    ref_out, _ = ref_eng.generate(prompt, gen)

    mesh = make_mesh(tp=tp, dp=dp)
    eng = Engine(
        CFG, F32, dense_params,
        param_sharding=param_sharding(mesh, dense_params),
        cache_sharding=cache_sharding(mesh, CFG),
    )
    out, _ = eng.generate(prompt, gen)
    assert out == ref_out


def test_quantized_sharded_matches_single_device(dense_params):
    policy = DtypePolicy("q8", "f32", "f32")
    qparams = llama.convert_params(dense_params, policy)
    gen = GenerationConfig(n_predict=12, greedy=True, eos_token=-1)
    prompt = [5, 2, 8]

    ref_out, _ = Engine(CFG, policy, qparams).generate(prompt, gen)

    mesh = make_mesh(tp=2)
    eng = Engine(
        CFG, policy, qparams,
        param_sharding=param_sharding(mesh, qparams),
        cache_sharding=cache_sharding(mesh, CFG),
    )
    out, _ = eng.generate(prompt, gen)
    assert out == ref_out


def test_weights_are_partitioned(dense_params):
    mesh = make_mesh(tp=4)
    sharded = jax.device_put(dense_params, param_sharding(mesh, dense_params))
    wqkv = sharded["layers"]["wqkv"]
    # column-parallel: each device holds (fused) d_out/4
    d_out = CFG.n_embd + 2 * CFG.kv_dim
    shard_shapes = {s.data.shape for s in wqkv.addressable_shards}
    assert shard_shapes == {(CFG.n_layers, d_out // 4, CFG.n_embd)}
    wo = sharded["layers"]["wo"]
    shard_shapes = {s.data.shape for s in wo.addressable_shards}
    assert shard_shapes == {(CFG.n_layers, CFG.n_embd, CFG.n_embd // 4)}


def test_i8_kv_cache_sharded(dense_params):
    policy = DtypePolicy("f32", "f32", "i8")
    mesh = make_mesh(tp=2, dp=2)
    eng = Engine(
        CFG, policy, dense_params,
        max_batch=2,
        param_sharding=param_sharding(mesh, dense_params),
        cache_sharding=cache_sharding(mesh, CFG),
    )
    cache = eng.new_cache(2)
    assert cache.k.dtype == jnp.int8
    logits, cache, lens = eng.prefill(cache, [[1, 2, 3], [4, 5]])
    assert logits.shape == (2, CFG.n_vocab)
    assert np.all(np.isfinite(np.asarray(logits)))
