"""Ring attention (sequence parallelism) vs the dense fallback.

parallel/ring.py shards the sequence dim over the mesh "data" axis and
rotates KV blocks with ppermute; these tests run it under shard_map on
the 8-virtual-device CPU mesh and pin it against gqa_attention on the
gathered sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tinyllama_tpu.ops.attention import gqa_attention
from tinyllama_tpu.parallel.mesh import make_mesh
from tinyllama_tpu.parallel.ring import ring_gqa_attention


def _ref(q, k, v):
    """Dense causal GQA on the full sequence."""
    B, T = q.shape[:2]
    kh = jnp.swapaxes(k, 1, 2)  # [B, Kh, T, d]
    vh = jnp.swapaxes(v, 1, 2)
    q_positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    return gqa_attention(q, kh, vh, q_positions)


@pytest.mark.parametrize("n_shards", [2, 8])
@pytest.mark.parametrize("shape", [(1, 64, 4, 32, 2), (2, 32, 8, 16, 4)])
def test_ring_matches_dense(n_shards, shape):
    B, T, H, d, Kh = shape
    mesh = make_mesh(tp=1, dp=n_shards)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, H, d), jnp.float32)
    k = jax.random.normal(kk, (B, T, Kh, d), jnp.float32)
    v = jax.random.normal(kv, (B, T, Kh, d), jnp.float32)

    want = np.asarray(_ref(q, k, v), np.float32)

    f = shard_map(
        lambda q, k, v: ring_gqa_attention(q, k, v, axis_name="data"),
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"),
    )
    got = np.asarray(f(q, k, v), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_single_shard_degenerates_to_dense():
    """n=1 ring == plain causal attention (no ppermute hop at all)."""
    mesh = make_mesh(tp=1, dp=1)
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 16, 4, 8), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 16, 2, 8),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 16, 2, 8),
                          jnp.float32)
    f = shard_map(
        lambda q, k, v: ring_gqa_attention(q, k, v, axis_name="data"),
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"),
    )
    got = np.asarray(f(q, k, v), np.float32)
    want = np.asarray(_ref(q, k, v), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_bf16_activations():
    """bf16 q/k/v (the production activation dtype) stays close to the
    f32 dense reference."""
    mesh = make_mesh(tp=1, dp=4)
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 32, 4, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 2, 16),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 2, 16),
                          jnp.float32)
    f = shard_map(
        lambda q, k, v: ring_gqa_attention(q, k, v, axis_name="data"),
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"),
    )
    got = np.asarray(
        f(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
          v.astype(jnp.bfloat16)).astype(jnp.float32)
    )
    want = np.asarray(_ref(q, k, v), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
