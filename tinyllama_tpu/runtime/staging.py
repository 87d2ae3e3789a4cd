"""Chunk-local KV staging: O(1) cache writes per decode step at any batch.

The per-step KV write is the serving scaling wall: every batch row sits
at its own position, so appending to the cache (monolithic [L,B,Kh,S,d]
rows or paged pool pages) needs one dynamic_update_slice *per row per
plane per layer* — ~128 chained DUS per layer-step at B=32 with int8
scales (a batched/vmapped DUS lowers to scatter = full-slab copy, worse;
see runtime/kvcache.py). The reference has no counterpart (single
stream, start_pos cursor, gten/tensor.cpp:124-134).

Fix: stage the chunk. Inside a C-step decode chunk every row emits
exactly one token per step, so chunk-local slot t is THE SAME for all
rows. New K/V goes to a staging buffer ``[L, B, Kh, C, d]`` written with
ONE dynamic_update_slice per plane per layer-step (batched over B), the
attention kernels read {pages/cache rows below the chunk start} + {the
staged tail, masked to slot <= t}, and the staging is flushed into the
real cache once per chunk:

* monolithic: one [L, 1, Kh, C, d] DUS per row (B per chunk),
* paged: per row, a read-merge-write of the <= ceil(C/P)+1 pool pages
  its span [base, base+C) touches — page-granular, so every slab is a
  static-shape dynamic_slice/dynamic_update_slice pair.

Everything lives inside the jitted chunk: the staging buffers are
created at chunk entry and dead after the flush; the cache object that
crosses the host boundary is always a plain KVCache/PagedKVCache.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tinyllama_tpu.runtime.kvcache import (
    KVCache,
    _quantize_kv,
    layer_cache_view,
)
from tinyllama_tpu.runtime.paged import PagedKVCache, paged_layer_view


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@dataclass(frozen=True)
class StagedKVCache:
    """A monolithic or paged cache plus this chunk's staged tail.

    sk/sv: [L, B, Kh, Cs, d] in the pool's storage dtype (Cs = the chunk
    length padded up to a sublane multiple; slots >= the chunk length are
    never written and always masked). scales: [L, B, Kh, Cs] f32 iff the
    pool is int8. base: [B] int32 — each row's fill when the chunk
    started; staged slot t holds the token at absolute position base + t.
    """

    pool: KVCache | PagedKVCache
    sk: jax.Array
    sv: jax.Array
    sk_scale: jax.Array | None
    sv_scale: jax.Array | None
    base: jax.Array  # [B] int32

    @property
    def batch(self) -> int:
        return self.base.shape[0]

    @property
    def slots(self) -> int:
        return self.sk.shape[3]

    @property
    def quantized(self) -> bool:
        return self.sk_scale is not None

    @property
    def max_ctx(self) -> int:
        return self.pool.max_ctx


jax.tree_util.register_dataclass(
    StagedKVCache,
    data_fields=("pool", "sk", "sv", "sk_scale", "sv_scale", "base"),
    meta_fields=(),
)


def stage_cache(pool: KVCache | PagedKVCache, base: jnp.ndarray,
                chunk: int) -> StagedKVCache:
    """Wrap `pool` for a C-step decode chunk starting at fills `base`."""
    L = pool.k.shape[0]
    Kh = pool.k.shape[2]
    d = pool.k.shape[-1]
    B = base.shape[0]
    # i8 wants 32-row sublane tiles; wider dtypes fewer — 32 covers all
    Cs = _round_up(chunk, 32)
    shape = (L, B, Kh, Cs, d)
    quant = pool.quantized
    return StagedKVCache(
        pool=pool,
        sk=jnp.zeros(shape, pool.k.dtype),
        sv=jnp.zeros(shape, pool.v.dtype),
        sk_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
        sv_scale=jnp.zeros(shape[:-1], jnp.float32) if quant else None,
        base=base.astype(jnp.int32),
    )


def update_staged_at_layer(
    st: StagedKVCache,
    li: jnp.ndarray,  # scalar int32
    k_new: jnp.ndarray,  # [B, 1, Kh, d] activation dtype
    v_new: jnp.ndarray,
    pos: jnp.ndarray,  # [B] int32 current positions (== base + t)
) -> StagedKVCache:
    """Write the step's new K/V into staged slot t = pos - base.

    The slot is chunk-local and IDENTICAL for every row, so each plane
    is one batched dynamic_update_slice — per-row writes wait for the
    chunk-end flush.
    """
    assert k_new.shape[1] == 1, "staging is a decode-chunk (T == 1) path"
    t = (pos[0] - st.base[0]).astype(jnp.int32)
    kh = k_new.transpose(0, 2, 1, 3)  # [B, Kh, 1, d]
    vh = v_new.transpose(0, 2, 1, 3)
    if st.quantized:
        kq, ks = _quantize_kv(kh)
        vq, vs = _quantize_kv(vh)
        planes = {"sk": kq, "sv": vq, "sk_scale": ks, "sv_scale": vs}
    else:
        planes = {"sk": kh, "sv": vh}

    out = {}
    for name, new in planes.items():
        buf = getattr(st, name)
        start = (li, 0, 0, t) + (0,) * (buf.ndim - 4)
        out[name] = jax.lax.dynamic_update_slice(
            buf, new[None].astype(buf.dtype), start
        )
    return StagedKVCache(
        pool=st.pool, sk=out["sk"], sv=out["sv"],
        sk_scale=out.get("sk_scale"), sv_scale=out.get("sv_scale"),
        base=st.base,
    )


def flush_staged(st: StagedKVCache, chunk: int) -> KVCache | PagedKVCache:
    """Write the chunk's staged rows [base, base + chunk) into the pool.

    Returns the plain pool — the staging buffers die here (chunk-local).
    """
    if isinstance(st.pool, PagedKVCache):
        return _flush_paged(st, chunk)
    return _flush_monolithic(st, chunk)


def _plane_pairs(st: StagedKVCache) -> list[tuple[str, str]]:
    pairs = [("k", "sk"), ("v", "sv")]
    if st.quantized:
        pairs += [("k_scale", "sk_scale"), ("v_scale", "sv_scale")]
    return pairs


def _flush_monolithic(st: StagedKVCache, C: int) -> KVCache:
    """One [L, 1, Kh, C, d] read-merge-write per row per plane.

    The final chunk of a generation may overhang max_ctx (the engine
    always runs full C-step chunks and discards the overhang tokens,
    matching the per-step write path whose clamped DUS only ever
    touched the last row). A clamped DUS start would shift the whole
    chunk and corrupt live positions, so clamp explicitly: write at
    cb = clip(base, 0, S - C), build the piece from staged slots
    shifted by delta = base - cb, and keep the pool's own rows where
    the shift rolls past the staged span. Every slab is static-shape,
    so nothing copies the pool wholesale.
    """
    pool: KVCache = st.pool
    B = st.batch
    S = pool.k.shape[3]
    bufs = {n: getattr(pool, n) for n, _ in _plane_pairs(st)}
    # pad the staged slot dim by C on the left: piece row r (absolute
    # position cb + r) is padded slot r - delta + C, one static slice
    padded = {}
    for name, sname in _plane_pairs(st):
        sg = getattr(st, sname)
        widths = [(0, 0)] * sg.ndim
        widths[3] = (C, 0)
        padded[name] = jnp.pad(sg, widths)
    r_iota = jnp.arange(C, dtype=jnp.int32)
    for b in range(B):
        base = st.base[b]
        cb = jnp.clip(base, 0, S - C)
        delta = base - cb  # >= 0; rows r < delta keep pool contents
        slice_start = C - jnp.minimum(delta, C)
        keep = r_iota >= delta
        for name, _ in _plane_pairs(st):
            buf = bufs[name]
            pad_b = padded[name]
            piece = jax.lax.dynamic_slice(
                pad_b,
                (0, b, 0, slice_start) + (0,) * (pad_b.ndim - 4),
                (pad_b.shape[0], 1, pad_b.shape[2], C) + pad_b.shape[4:],
            )
            old = jax.lax.dynamic_slice(
                buf,
                (0, b, 0, cb) + (0,) * (buf.ndim - 4),
                (buf.shape[0], 1, buf.shape[2], C) + buf.shape[4:],
            )
            mask = keep.reshape((1, 1, 1, C) + (1,) * (buf.ndim - 4))
            merged = jnp.where(mask, piece, old)
            bufs[name] = jax.lax.dynamic_update_slice(
                buf, merged, (0, b, 0, cb) + (0,) * (buf.ndim - 4)
            )
    return KVCache(
        k=bufs["k"], v=bufs["v"],
        k_scale=bufs.get("k_scale"), v_scale=bufs.get("v_scale"),
    )


def _flush_paged(st: StagedKVCache, C: int) -> PagedKVCache:
    """Page-granular read-merge-write of every pool page the chunk spans.

    Row b's staged span is absolute positions [base, base + C): at most
    ceil(C/P) + 1 pages. For span page p (logical page base//P + p),
    page row r holds staged slot i = p*P - (base % P) + r; rows with
    i outside [0, C) keep the page's existing contents (earlier tokens
    of a partially-filled page, or rows past the span). All L layers
    move in one slab per plane. Clamped/empty spans degenerate to
    identity writes of the row's own (or scratch) page — never another
    live row's data, since masks derive from the same base/off values.
    """
    pool: PagedKVCache = st.pool
    P = pool.page_size
    J = pool.table.shape[1]
    B = st.batch
    n_span = -(-C // P) + 1
    bufs = {n: getattr(pool, n) for n, _ in _plane_pairs(st)}
    # pad the slot dim by P on both sides once per plane: every span
    # page's P rows are then one static-length dynamic_slice
    padded = {}
    for name, sname in _plane_pairs(st):
        sg = getattr(st, sname)  # [L, B, Kh, Cs(,d)]
        widths = [(0, 0)] * sg.ndim
        widths[3] = (P, P)
        padded[name] = jnp.pad(sg, widths)

    r_iota = jnp.arange(P, dtype=jnp.int32)
    for b in range(B):
        base = st.base[b]
        off = base % P
        p0 = base // P
        for p in range(n_span):
            lp = jnp.clip(p0 + p, 0, J - 1)
            phys = pool.table[b, lp]
            i = p * P - off + r_iota  # staged slot of each page row
            # guard the lp clip: a span page past the table (the chunk
            # overhanging max_ctx — the engine discards those tokens)
            # must degenerate to an identity write of the clipped page,
            # not merge staged rows into it
            valid = (i >= 0) & (i < C) & (p0 + p < J)
            start_s = p * P - off + P  # into the P-padded slot dim
            for name, _ in _plane_pairs(st):
                buf = bufs[name]  # [L, NP, Kh, P(,d)]
                pad_b = padded[name]
                piece = jax.lax.dynamic_slice(
                    pad_b,
                    (0, b, 0, start_s) + (0,) * (pad_b.ndim - 4),
                    (pad_b.shape[0], 1, pad_b.shape[2], P)
                    + pad_b.shape[4:],
                )  # [L, 1, Kh, P(,d)]
                old = jax.lax.dynamic_slice(
                    buf,
                    (0, phys, 0, 0) + (0,) * (buf.ndim - 4),
                    (buf.shape[0], 1, buf.shape[2], P) + buf.shape[4:],
                )
                mask = valid.reshape((1, 1, 1, P) + (1,) * (buf.ndim - 4))
                merged = jnp.where(mask, piece, old)
                bufs[name] = jax.lax.dynamic_update_slice(
                    buf, merged, (0, phys, 0, 0) + (0,) * (buf.ndim - 4)
                )
    return PagedKVCache(
        k=bufs["k"], v=bufs["v"],
        k_scale=bufs.get("k_scale"), v_scale=bufs.get("v_scale"),
        table=pool.table,
    )


def staged_layer_view(
    st: StagedKVCache, li: jnp.ndarray, dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense [B, Kh, S, d] k/v view of pool + staged tail (the XLA
    fallback read path — CPU tests and non-kernel decode)."""
    if isinstance(st.pool, PagedKVCache):
        k, v = paged_layer_view(st.pool, li, dtype)
    else:
        k, v = layer_cache_view(st.pool, li, dtype)
    sk = st.sk[li].astype(jnp.float32)  # [B, Kh, Cs, d]
    sv = st.sv[li].astype(jnp.float32)
    if st.quantized:
        sk = sk * st.sk_scale[li][..., None]
        sv = sv * st.sv_scale[li][..., None]
    sk = sk.astype(dtype)
    sv = sv.astype(dtype)
    B = st.batch
    # pad the slot dim by the tail length so the per-row DUS never
    # clamps when base + Cs overhangs max_ctx (the engine's final chunk
    # may: overhang steps are discarded, but a clamped start would shift
    # the tail and corrupt the view for the still-live steps)
    Cs = sk.shape[2]
    k = jnp.pad(k, ((0, 0), (0, 0), (0, Cs), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, Cs), (0, 0)))
    for b in range(B):
        start = (b, 0, st.base[b], 0)
        k = jax.lax.dynamic_update_slice(k, sk[b : b + 1], start)
        v = jax.lax.dynamic_update_slice(v, sv[b : b + 1], start)
    S = k.shape[2] - Cs
    return k[:, :, :S], v[:, :, :S]
