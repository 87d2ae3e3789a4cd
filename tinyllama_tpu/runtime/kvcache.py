"""Explicit fixed-shape KV cache.

The reference realizes its KV cache implicitly: persistent max_ctx-row
activation buffers plus a start_pos cursor (SURVEY.md C16;
/root/reference/gten/tensor.cpp:124-134 and every modules.cpp forward).
On TPU everything under jit needs static shapes, so the cache is an
explicit array pytree of shape [n_layers, B, n_kv_heads, max_ctx, d_head]
— head-major, so one (layer, seq, head)'s history is a single contiguous
S x d slab the flash attention kernel (ops/pallas/flash_prefill.py,
which serves decode at T=1 with causal tile pruning) DMAs in straight
HBM runs.

The full stacked arrays flow through the layer scan as *carry* and are
updated in place with per-(layer, batch-row) dynamic_update_slice —
scanning them as xs/ys would make XLA materialize per-layer copies of
the whole cache every step (the same custom-call fusion limit that moved
weight layer-indexing into the matmul kernel).

Supports an int8-quantized mode (kv_dtype="i8"): values stored as int8
with a per-(kv-head, position) f32 scale (absmax/127), halving/quartering
HBM traffic for the decode-attention read — the TPU analog of the
reference's q8 activation cache (ops.h:522-528).
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp

from tinyllama_tpu.config import ModelConfig

_KV_JNP_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}


@dataclass(frozen=True)
class KVCache:
    """k/v: [L, B, Kh, S, d] in storage dtype; scales present iff int8."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None  # [L, B, Kh, S] f32, or None
    v_scale: jax.Array | None

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def max_ctx(self) -> int:
        return self.k.shape[3]

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
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, S, cfg.d_head)
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
    """Per-(head, pos) int8 quantization along d: scale = absmax/127."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale


def _write_rows(buf, new, li, pos):
    """buf [L, B, Kh, S, *], new [B, Kh, T, *] -> write each batch row at
    (li, b, :, pos[b]).

    The batch dimension unrolls into a chain of dynamic_update_slice ops
    (B is static under jit): each link updates the donated carry in
    place. A vmapped/batched DUS would lower to scatter, which
    materializes a full copy of the cache slab per call — at B=4 that
    alone was ~2.3 ms per layer per decode step.
    """
    B = new.shape[0]
    for b in range(B):
        start = (li, b, 0, pos[b]) + (0,) * (buf.ndim - 4)
        buf = jax.lax.dynamic_update_slice(
            buf, new[b][None, None].astype(buf.dtype), start
        )
    return buf


def update_cache_at_layer(
    cache: KVCache,
    li: jnp.ndarray,  # scalar int32 layer index
    k_new: jnp.ndarray,  # [B, T, Kh, d] activation dtype
    v_new: jnp.ndarray,
    pos: jnp.ndarray,  # [B] int32 write offsets
) -> KVCache:
    """Write T new positions into layer `li` of the stacked cache slabs,
    in place under jit (donated carry)."""
    kh = k_new.transpose(0, 2, 1, 3)  # [B, Kh, T, d]
    vh = v_new.transpose(0, 2, 1, 3)
    if cache.quantized:
        kq, ks = _quantize_kv(kh)
        vq, vs = _quantize_kv(vh)
        return KVCache(
            k=_write_rows(cache.k, kq, li, pos),
            v=_write_rows(cache.v, vq, li, pos),
            k_scale=_write_rows(cache.k_scale, ks, li, pos),
            v_scale=_write_rows(cache.v_scale, vs, li, pos),
        )
    return KVCache(
        k=_write_rows(cache.k, kh, li, pos),
        v=_write_rows(cache.v, vh, li, pos),
        k_scale=None,
        v_scale=None,
    )


def layer_cache_view(
    cache: KVCache, li: jnp.ndarray, dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Layer li's cache dequantized to `dtype`: (k, v) each [B, Kh, S, d].

    The XLA fallback read path (prefill and non-Pallas decode); the
    flash-decode kernel instead reads the stacked arrays directly.
    """
    k, v = cache.k[li], cache.v[li]
    if cache.quantized:
        k = k.astype(jnp.float32) * cache.k_scale[li][..., None]
        v = v.astype(jnp.float32) * cache.v_scale[li][..., None]
    return k.astype(dtype), v.astype(dtype)
