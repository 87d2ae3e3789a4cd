"""Rotary position embeddings (GPT-NeoX half-rotation style).

Parity target: gten's rotary_emb (/root/reference/gten/ops.h:714-760):
pairs (j, j + d_head/2) rotated by ``theta_j = pos * base^(-2j/d_head)``,
angles computed in f32. The reference recomputes pow/cos/sin per position
per step; on TPU we precompute an f32 cos/sin table once (max_ctx ×
d_head/2) and gather rows by position — the f32 table values are the same
f32 cos/sin the reference computes, so rotation parity holds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_table(max_ctx: int, d_head: int, base: float = 10000.0):
    """Precompute (cos, sin) tables of shape [max_ctx, d_head//2], f32."""
    d_half = d_head // 2
    j = np.arange(d_half, dtype=np.float32)
    # theta_j = base^(-2j/d), matching ops.h:743: pow(10000, -(2*j/d))
    inv_freq = np.power(np.float32(base), -(2.0 * j / np.float32(d_head)))
    pos = np.arange(max_ctx, dtype=np.float32)
    angles = np.outer(pos, inv_freq)  # [max_ctx, d_half]
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


def gather_rope(
    positions: jnp.ndarray,  # [B, T] int32
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather (cos, sin) rows for a step's positions: [B, T, d_half] f32.

    Hoisted out of the layer scan by the caller — the rows are identical
    for every layer, but XLA does not hoist the gather out of the scan
    body, so done per layer it costs ~2 dynamic-slice ops x n_layers per
    decoded token."""
    return cos_table[positions], sin_table[positions]


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate x of shape [B, T, n_heads, d_head] at integer positions [B, T].

    Half-rotation: (x0, x1) = (x[..:d/2], x[d/2:..]);
    out0 = x0*cos - x1*sin; out1 = x0*sin + x1*cos (ops.h:738-748).
    Computed in f32, returned in x.dtype.
    """
    cos, sin = gather_rope(positions, cos_table, sin_table)
    return apply_rope_gathered(x, cos, sin)


def apply_rope_gathered(
    x: jnp.ndarray,  # [B, T, n_heads, d_head]
    cos: jnp.ndarray,  # [B, T, d_half] f32 (gather_rope)
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """apply_rope over pre-gathered cos/sin rows (see gather_rope)."""
    dtype = x.dtype
    d_half = x.shape[-1] // 2
    cos = cos[:, :, None, :]  # [B, T, 1, d_half]
    sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    x0 = xf[..., :d_half]
    x1 = xf[..., d_half:]
    out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.astype(dtype)
