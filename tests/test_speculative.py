"""Speculative decoding must be token-identical to plain greedy decode.

Greedy acceptance is exact: any draft, any acceptance pattern, the
emitted sequence equals Engine.generate's. The tiny random-weight model
babbles repetitively, which exercises real n-gram draft hits.
"""

import jax
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.runtime.engine import Engine

CFG = tiny_test_config()
F32 = DtypePolicy("f32", "f32", "f32")


@pytest.fixture(scope="module")
def engine():
    params = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    return Engine(CFG, F32, params)


@pytest.mark.parametrize("draft_len", [1, 3, 4])
@pytest.mark.parametrize("prompt", [[3, 7, 1], [9, 2, 4, 8, 5, 11, 6]])
def test_speculative_matches_greedy(engine, draft_len, prompt):
    gen = GenerationConfig(n_predict=48, greedy=True, eos_token=-1)
    want, _ = engine.generate(prompt, gen)
    got, stats = engine.generate_speculative(prompt, gen, draft_len)
    assert got == want
    # the verify counter must show fewer forwards than tokens whenever
    # any draft was accepted; at worst it's one forward per token
    n_verify = stats.decode_token_times[0]
    assert n_verify <= max(1, len(got))


def test_speculative_respects_eos(engine):
    """Find a token the model emits, then use it as EOS: speculative
    must stop exactly where generate stops."""
    probe = GenerationConfig(n_predict=32, greedy=True, eos_token=-1)
    base, _ = engine.generate([3, 7, 1], probe)
    eos = base[len(base) // 2]  # a token mid-stream becomes the eos
    gen = GenerationConfig(n_predict=32, greedy=True, eos_token=eos)
    want, _ = engine.generate([3, 7, 1], gen)
    got, _ = engine.generate_speculative([3, 7, 1], gen, draft_len=3)
    assert got == want


def test_speculative_budget(engine):
    gen = GenerationConfig(n_predict=10, greedy=True, eos_token=-1)
    want, _ = engine.generate([3, 7, 1], gen)
    got, _ = engine.generate_speculative([3, 7, 1], gen, draft_len=4)
    assert got == want and len(got) == 7


def test_speculative_full_budget_at_context_limit(engine):
    """Near max_ctx the loop must consume the WHOLE budget (the padded
    cache/history buffers let the final verifies run full-width) — not
    stop up to draft_len tokens early."""
    prompt = [3, 7, 1]
    gen = GenerationConfig(n_predict=CFG.max_ctx, greedy=True, eos_token=-1)
    want, _ = engine.generate(prompt, gen)
    got, _ = engine.generate_speculative(prompt, gen, draft_len=4)
    assert len(want) == CFG.max_ctx - len(prompt)
    assert got == want
