"""Token samplers.

Parity targets: greedy argmax (/root/reference/tinyllama.cpp:416-426) and
top-k/temperature sampling (tinyllama.cpp:466-499: divide logits by temp,
take top-k, softmax, draw). Both are jitted device functions drawing from
threaded PRNG keys instead of the reference's host-side mt19937.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def greedy_device(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax over the vocab axis. logits [B, V] -> [B] int32. Traceable —
    embed inside larger jitted programs (the engine's decode chunk)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_k_device(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: jnp.ndarray | float,
    top_k: int,
) -> jnp.ndarray:
    """Temperature + top-k sampling, [B] int32. Traceable.

    Ordering by logits/temp equals ordering by logits (temp > 0), so top-k
    selection before or after the temperature divide is equivalent to the
    reference's divide-then-partial-sort (tinyllama.cpp:466-479).
    """
    vals, idx = jax.lax.top_k(logits, top_k)  # [B, k]
    choice = jax.random.categorical(key, vals / temperature, axis=-1)  # [B]
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


greedy = jax.jit(greedy_device)
sample_top_k = partial(jax.jit, static_argnames=("top_k",))(sample_top_k_device)
