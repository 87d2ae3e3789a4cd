"""Sampler unit tests (ops/sampling.py).

Parity targets: greedy argmax (tinyllama.cpp:416-426) and top-k /
temperature sampling (tinyllama.cpp:466-499).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.ops import sampling


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.1, 3.0, -2.0, 1.0], [5.0, 0.0, 0.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(sampling.greedy(logits)), [1, 0]
    )


def test_top_k_never_selects_outside_top_k():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    top = np.argsort(np.asarray(logits), axis=-1)[:, -8:]
    for seed in range(20):
        toks = np.asarray(
            sampling.sample_top_k(
                logits, jax.random.PRNGKey(seed), 1.0, top_k=8
            )
        )
        for b in range(4):
            assert toks[b] in top[b]


def test_deterministic_per_key():
    logits = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 128)), jnp.float32
    )
    a = sampling.sample_top_k(logits, jax.random.PRNGKey(7), 0.9, top_k=50)
    b = sampling.sample_top_k(logits, jax.random.PRNGKey(7), 0.9, top_k=50)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_low_temperature_approaches_greedy():
    logits = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 256)) * 2, jnp.float32
    )
    want = np.asarray(sampling.greedy(logits))
    for seed in range(10):
        got = np.asarray(
            sampling.sample_top_k(
                logits, jax.random.PRNGKey(seed), 1e-3, top_k=50
            )
        )
        np.testing.assert_array_equal(got, want)


def test_distribution_tracks_softmax():
    """Empirical frequencies over many draws match softmax(logits/temp)
    on the top-k support (the reference's discrete_distribution
    semantics, tinyllama.cpp:487-499)."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]], jnp.float32)
    temp, k, n = 1.0, 4, 4000
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    draws = jax.vmap(
        lambda kk: sampling.sample_top_k_device(logits, kk, temp, k)[0]
    )(keys)
    counts = np.bincount(np.asarray(draws), minlength=4) / n
    probs = np.exp([2.0, 1.0, 0.0, -1.0])
    probs = probs / probs.sum()
    np.testing.assert_allclose(counts, probs, atol=0.03)
