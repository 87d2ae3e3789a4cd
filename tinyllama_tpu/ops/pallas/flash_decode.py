"""Flash-decode attention Pallas kernel over the stacked KV cache.

TPU-native replacement for the reference's decode-attention stage
(/root/reference/gten/ops.h:930-1133: qk_masked_softmax over cached score
rows plus a full V dequant+transpose per token, "TODO: Improve this"
ops.h:1067). Design:

* One kernel per (sequence, kv-head) grid step computes the whole GQA
  group's attention for the new token: scores over the full cache slab,
  masked softmax, and the value contraction — no ctx x ctx buffer, no
  intermediate materialization in HBM.
* The cache stays in its stacked [L, B, Kh, S, d] layout; the layer is
  selected inside the BlockSpec index map via scalar prefetch, so a
  lax.scan over layers never slices/copies the cache in HBM (each step
  DMAs exactly one contiguous S x d slab per head).
* int8 KV cache (runtime/kvcache.py) is dequantized by folding the
  per-position k-scales into the scores and the v-scales into the
  softmax weights — both single lane-broadcast multiplies on [G, S];
  the int8 values feed the MXU after a plain element cast.

The whole (padded) context is read every step; masking handles validity.
At TinyLlama scale the full-cache read is ~7% of the decode budget; a
length-pruned multi-block variant only pays off at much longer contexts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(li_ref, pos_ref, q_ref, k_ref, v_ref, *rest, compute_dtype):
    if len(rest) == 3:
        ks_ref, vs_ref, o_ref = rest
    else:
        ks_ref = vs_ref = None
        (o_ref,) = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    G, d = q_ref.shape
    S = k_ref.shape[0]

    q = q_ref[:].astype(compute_dtype)
    scores = jax.lax.dot_general(
        q, k_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / (d ** 0.5))  # [G, S]
    if ks_ref is not None:
        # int8 cache: q.(k_i8[s]*ks[s]) == (q.k_i8[s])*ks[s] — fold this
        # head's per-position k-scales into the raw scores as a [1, S]
        # lane-aligned multiply instead of dequantizing [S, d] keys
        scores = scores * ks_ref[pl.ds(h, 1), :]

    key_pos = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    scores = jnp.where(key_pos <= pos_ref[b], scores, NEG_INF)

    # numerically-stable softmax in f32 (ops.h:971-994)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    if vs_ref is not None:
        # v-scales fold into the softmax weights the same way
        p = p * vs_ref[pl.ds(h, 1), :]

    o_ref[:] = jax.lax.dot_general(
        p.astype(compute_dtype), v_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_decode(q, ck, cv, ck_s, cv_s, li, pos, interpret):
    B, Kh, G, d = q.shape
    S = ck.shape[3]
    compute_dtype = q.dtype
    quant = ck_s is not None

    grid = (B, Kh)
    in_specs = [
        pl.BlockSpec((None, None, G, d), lambda b, h, li, pos: (b, h, 0, 0)),
        pl.BlockSpec(
            (None, None, None, S, d), lambda b, h, li, pos: (li[0], b, h, 0, 0)
        ),
        pl.BlockSpec(
            (None, None, None, S, d), lambda b, h, li, pos: (li[0], b, h, 0, 0)
        ),
    ]
    operands = [q, ck, cv]
    if quant:
        # all Kh heads' scale rows ride along (block dims (Kh, S) stay
        # Mosaic-legal); the kernel slices its head's row. NEVER reshape
        # the scales to [..., S, 1] here — that would physically relayout
        # the whole array (S lanes -> sublanes) every call.
        Kh = ck.shape[2]
        scale_spec = pl.BlockSpec(
            (None, None, Kh, S), lambda b, h, li, pos: (li[0], b, 0, 0)
        )
        in_specs += [scale_spec, scale_spec]
        operands += [ck_s, cv_s]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, None, G, d),
                               lambda b, h, li, pos: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kh, G, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Kh * G * S * d,
            bytes_accessed=2 * ck.size // ck.shape[0] * ck.dtype.itemsize,
            transcendentals=B * Kh * G * S,
        ),
        interpret=interpret,
    )(li, pos, *operands)
    return out


def flash_decode_attention(
    q: jnp.ndarray,  # [B, 1, H, d] activation dtype
    cache,  # KVCache ([L, B, Kh, S, d])
    li: jnp.ndarray,  # scalar int32 layer index
    pos: jnp.ndarray,  # [B] int32 position of the new token
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single-token GQA attention against layer `li` of the cache.

    The new token's k/v must already be written at `pos`
    (runtime/kvcache.py update_cache_at_layer). Returns [B, 1, H, d].
    """
    B, T, H, d = q.shape
    assert T == 1, "flash_decode_attention is the T=1 decode path"
    Kh = cache.k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qg = q.reshape(B, Kh, H // Kh, d)
    li = jnp.reshape(li, (1,)).astype(jnp.int32)
    out = _flash_decode(
        qg, cache.k, cache.v, cache.k_scale, cache.v_scale, li,
        pos.astype(jnp.int32), interpret,
    )
    return out.reshape(B, 1, H, d).astype(q.dtype)
