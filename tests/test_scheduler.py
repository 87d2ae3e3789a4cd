"""Continuous batching scheduler invariants.

Key property: per-request outputs are identical to running each request
alone through Engine.generate (greedy, f32) — batching and slot reuse must
not leak state across requests.
"""

import jax
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.runtime.engine import Engine
from tinyllama_tpu.runtime.scheduler import ContinuousBatcher

CFG = tiny_test_config()
F32 = DtypePolicy("f32", "f32", "f32")
GEN = GenerationConfig(n_predict=24, greedy=True, eos_token=-1, chunk_size=8)

PROMPTS = [
    [3, 7, 1],
    [9, 2, 4, 8, 5],
    [11, 6],
    [1, 2, 3, 4],
    [5, 5, 5],
]


@pytest.fixture(scope="module")
def engine():
    params = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    return Engine(CFG, F32, params, max_batch=2)


@pytest.fixture(scope="module")
def reference_outputs(engine):
    return {
        i: engine.generate(p, GEN)[0] for i, p in enumerate(PROMPTS)
    }


def test_batched_matches_sequential(engine, reference_outputs):
    """5 requests through 2 slots (forced slot reuse) == sequential runs."""
    sched = ContinuousBatcher(engine, GEN, max_batch=2)
    ids = {sched.submit(p): i for i, p in enumerate(PROMPTS)}
    results = sched.run()
    assert len(results) == len(PROMPTS)
    for req_id, i in ids.items():
        assert results[req_id].output == reference_outputs[i], f"prompt {i}"


def test_streaming_callback_per_request(engine):
    sched = ContinuousBatcher(engine, GEN, max_batch=2)
    r0 = sched.submit(PROMPTS[0])
    r1 = sched.submit(PROMPTS[1])
    seen: dict[int, list[int]] = {r0: [], r1: []}
    results = sched.run(stream=lambda rid, tok: seen[rid].append(tok))
    assert seen[r0] == results[r0].output
    assert seen[r1] == results[r1].output


def test_mid_flight_submission(engine, reference_outputs):
    """Submitting while others are decoding must not disturb them."""
    sched = ContinuousBatcher(engine, GEN, max_batch=2)
    first = sched.submit(PROMPTS[0])
    sched.step()  # prefill + first chunk of request 0
    late = sched.submit(PROMPTS[2])
    results = sched.run()
    assert results[first].output == reference_outputs[0]
    assert results[late].output == reference_outputs[2]


def test_max_new_respected(engine):
    sched = ContinuousBatcher(engine, GEN, max_batch=2)
    rid = sched.submit(PROMPTS[0], max_new=5)
    results = sched.run()
    assert len(results[rid].output) == 5


def test_ttft_recorded(engine):
    sched = ContinuousBatcher(engine, GEN, max_batch=2)
    rid = sched.submit(PROMPTS[0])
    results = sched.run()
    req = results[rid]
    assert req.first_token_s is not None
    assert req.finished_s >= req.first_token_s >= req.submitted_s


def test_insert_compile_variants_keyed_on_bucket_only():
    """_insert_logits/_insert_slots must compile one variant per
    admission BUCKET (log2(B) total), never per admitted count: the
    walk covers the full bucket and unused slot entries alias slots[0]
    (reverse order ⇒ the real row 0 lands last). Admitting 3 then 4
    requests at bucket 4 must hit the same executable, and the dummy
    rows must never leak into a non-admitted slot."""
    import jax.numpy as jnp
    import numpy as np

    from tinyllama_tpu.runtime.kvcache import init_cache
    from tinyllama_tpu.runtime.scheduler import _insert_logits, _insert_slots

    B, V = 4, 8
    state0 = jnp.arange(B * V, dtype=jnp.float32).reshape(B, V)
    rows = -(jnp.arange(4 * V, dtype=jnp.float32).reshape(4, V) + 1.0)

    before = _insert_logits._cache_size()
    # take=3 into free slots [1, 2, 3]; dummy bucket entry aliases 1
    got3 = _insert_logits(state0, rows, jnp.asarray([1, 2, 3, 1], jnp.int32))
    got3 = np.asarray(got3)
    np.testing.assert_array_equal(got3[0], np.arange(V))  # slot 0 untouched
    for i, slot in enumerate([1, 2, 3]):
        np.testing.assert_array_equal(got3[slot], np.asarray(rows[i]))
    # take=4 at the same bucket: same executable, no recompile
    state0 = jnp.arange(B * V, dtype=jnp.float32).reshape(B, V)
    _insert_logits(state0, rows, jnp.asarray([0, 1, 2, 3], jnp.int32))
    assert _insert_logits._cache_size() - before == 1

    cache = init_cache(CFG, B, "f32", 16)
    batch = init_cache(CFG, 4, "f32", 16)
    batch = type(batch)(
        k=jnp.ones_like(batch.k), v=2 * jnp.ones_like(batch.v),
        k_scale=batch.k_scale, v_scale=batch.v_scale,
    )
    before = _insert_slots._cache_size()
    cache3, _ = _insert_slots(
        cache, jnp.zeros((B, V)), batch, rows,
        jnp.asarray([1, 2, 3, 1], jnp.int32),
    )
    assert float(jnp.abs(cache3.k[:, 0]).max()) == 0.0  # slot 0 untouched
    assert float(cache3.k[:, 1].min()) == 1.0
    cache4, _ = _insert_slots(
        init_cache(CFG, B, "f32", 16), jnp.zeros((B, V)), batch, rows,
        jnp.asarray([0, 1, 2, 3], jnp.int32),
    )
    assert _insert_slots._cache_size() - before == 1


def test_scheduler_over_tp_engine():
    """ContinuousBatcher on a tensor-parallel Engine: the batched chunk
    runs under shard_map; outputs must match the single-device engine."""
    from tinyllama_tpu.parallel.mesh import make_mesh

    params = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    single = Engine(CFG, F32, params, max_batch=2)
    want = {i: single.generate(p, GEN)[0] for i, p in enumerate(PROMPTS[:3])}

    tp_engine = Engine(CFG, F32, params, max_batch=2, tp=2,
                       mesh=make_mesh(tp=2, dp=1), use_pallas=False)
    sched = ContinuousBatcher(tp_engine, GEN, max_batch=2)
    ids = {sched.submit(p): i for i, p in enumerate(PROMPTS[:3])}
    results = sched.run()
    for rid, i in ids.items():
        assert results[rid].output == want[i], f"prompt {i}"
