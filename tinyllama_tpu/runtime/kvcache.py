"""Explicit fixed-shape KV cache.

The reference realizes its KV cache implicitly: persistent max_ctx-row
activation buffers plus a start_pos cursor (SURVEY.md C16;
/root/reference/gten/tensor.cpp:124-134 and every modules.cpp forward).
On TPU everything under jit needs static shapes, so the cache is an
explicit array pytree of shape [n_layers, B, max_ctx, n_kv_heads, d_head],
updated with per-batch dynamic_update_slice (a scatter across the batch,
enabling continuous batching where every slot sits at a different position).

Supports an int8-quantized mode (kv_dtype="i8"): values stored as int8 with
a per-(position, kv-head) f32 scale (absmax/127), halving/quartering HBM
traffic for the decode-attention read — the TPU analog of the reference's
q8 activation cache (ops.h:522-528).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from tinyllama_tpu.config import ModelConfig

_KV_JNP_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}


@dataclass(frozen=True)
class KVCache:
    """k/v: [L, B, S, Kh, d] in storage dtype; scales present iff int8."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None  # [L, B, S, Kh] f32, or None
    v_scale: jax.Array | None

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def max_ctx(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


jax.tree_util.register_dataclass(
    KVCache, data_fields=("k", "v", "k_scale", "v_scale"), meta_fields=()
)


def init_cache(
    cfg: ModelConfig, batch: int, kv_dtype: str = "bf16", max_ctx: int | None = None
) -> KVCache:
    S = max_ctx or cfg.max_ctx
    shape = (cfg.n_layers, batch, S, cfg.n_kv_heads, cfg.d_head)
    if kv_dtype == "i8":
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    dt = _KV_JNP_DTYPES[kv_dtype]
    return KVCache(
        k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt), k_scale=None, v_scale=None
    )


def _quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(pos, head) int8 quantization: scale = absmax/127."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale


@partial(jax.vmap, in_axes=(0, 0, 0))  # over batch
def _write_at(buf, new, pos):
    """buf [S, ...], new [T, ...] -> buf with new written at row `pos`."""
    start = (pos,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype), start)


def update_layer_cache(
    ck: jnp.ndarray,
    cv: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, T, Kh, d] activation dtype
    v_new: jnp.ndarray,
    pos: jnp.ndarray,  # [B] int32 write offsets
    ck_scale: jnp.ndarray | None = None,
    cv_scale: jnp.ndarray | None = None,
):
    """Write T new positions into one layer's [B, S, Kh, d] cache slabs.

    Returns (ck, cv, ck_scale, cv_scale, k_eff, v_eff) where k_eff/v_eff are
    the full dequantized-to-compute-dtype cache views for attention.
    """
    if ck_scale is not None:
        kq, ks = _quantize_kv(k_new)
        vq, vs = _quantize_kv(v_new)
        ck = _write_at(ck, kq, pos)
        cv = _write_at(cv, vq, pos)
        ck_scale = _write_at(ck_scale, ks, pos)
        cv_scale = _write_at(cv_scale, vs, pos)
        k_eff = ck.astype(jnp.float32) * ck_scale[..., None]
        v_eff = cv.astype(jnp.float32) * cv_scale[..., None]
        return ck, cv, ck_scale, cv_scale, k_eff, v_eff
    ck = _write_at(ck, k_new, pos)
    cv = _write_at(cv, v_new, pos)
    return ck, cv, None, None, ck, cv
