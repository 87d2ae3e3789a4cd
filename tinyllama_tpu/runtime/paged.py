"""Paged KV cache: block-table indirection over a shared page pool.

BASELINE.json's north star names "flash-decode kernels with an INT8 paged
KV-cache"; the reference has no counterpart (its cache is preallocated
max_ctx activation buffers, SURVEY.md C16). Design (TPU-first, after
vLLM's PagedAttention, re-expressed as Pallas scalar-prefetch index maps):

* One global **page pool** per engine: ``k/v`` of shape
  ``[L, n_pages, Kh, P, d]`` (`P` = page size, 128 positions — one lane
  quantum, so a page slab is a single contiguous DMA run). A logical
  page covers all L layers at once (pages allocate/free in lockstep
  across layers — one table serves the whole model).
* A per-sequence **page table** ``[B, max_ctx // P]`` of physical page
  ids. The flash-decode kernel receives it as a scalar-prefetch operand
  and resolves ``physical = table[b, min(j, last_page(b))]`` inside its
  BlockSpec index maps — out-of-fill grid steps repeat the previous
  block index, which skips their DMA entirely, so decode-attention cost
  tracks the *fill*, not max_ctx.
* Slot memory is proportional to the request (pages held = ceil(fill/P)),
  not to max_ctx: a 32-slot scheduler over a pool sized for the actual
  working set replaces 32 full-length cache rows.

Host-side allocation is a free-list (`PageAllocator`); the scheduler
reserves a request's worst-case page count at admission so decode can
never run out mid-flight, but allocates lazily as the sequence grows.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tinyllama_tpu.config import ModelConfig

#: Default page length. 256 measured best at the serving benchmark
#: shapes (round 5 A/B at 32 slots: 128 -> 256 = +4.3% aggregate tok/s
#: — half the page-walk grid steps and [G, 256] dots per online-softmax
#: update; 512 regresses to -12% because the walk cannot skip inside a
#: page and mostly-dead 512-wide page DMAs dominate at ~100-160 token
#: fills). Use `default_page_size(S)` rather than this constant when a
#: context may be smaller than one page.
PAGE_SIZE = 256


def default_page_size(S: int) -> int:
    """The largest legal page (<= PAGE_SIZE) for a max_ctx of S."""
    p = PAGE_SIZE
    while p > S or S % p:
        p //= 2
        assert p >= 8, (S, "max_ctx must be a multiple of 8")
    return p

_KV_JNP_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}


@dataclass(frozen=True)
class PagedKVCache:
    """Page pool + the page table of the sequences in the current call.

    k/v: [L, n_pages, Kh, P, d] storage dtype; scales present iff int8.
    table: [B, max_ctx // P] int32 physical page ids (rows beyond a
    sequence's fill may hold anything — the kernels clamp to the fill).
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None  # [L, n_pages, Kh, P] f32, or None
    v_scale: jax.Array | None
    table: jax.Array  # [B, J] int32

    @property
    def batch(self) -> int:
        return self.table.shape[0]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_ctx(self) -> int:
        return self.table.shape[1] * self.page_size

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def with_table(self, table: jax.Array) -> "PagedKVCache":
        """Same pool, different sequence set (e.g. admission prefill)."""
        return PagedKVCache(self.k, self.v, self.k_scale, self.v_scale, table)


jax.tree_util.register_dataclass(
    PagedKVCache,
    data_fields=("k", "v", "k_scale", "v_scale", "table"),
    meta_fields=(),
)


def init_paged_cache(
    cfg: ModelConfig,
    n_pages: int,
    batch: int,
    kv_dtype: str = "bf16",
    max_ctx: int | None = None,
    page_size: int | None = None,
) -> PagedKVCache:
    S = max_ctx or cfg.max_ctx
    page_size = page_size or default_page_size(S)
    assert S % page_size == 0, (S, page_size)
    shape = (cfg.n_layers, n_pages, cfg.n_kv_heads, page_size, cfg.d_head)
    table = jnp.zeros((batch, S // page_size), jnp.int32)
    if kv_dtype == "i8":
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
            table=table,
        )
    dt = _KV_JNP_DTYPES[kv_dtype]
    return PagedKVCache(
        k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt),
        k_scale=None, v_scale=None, table=table,
    )


def _quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, scale


def update_paged_at_layer(
    cache: PagedKVCache,
    li: jnp.ndarray,  # scalar int32
    k_new: jnp.ndarray,  # [B, T, Kh, d] activation dtype
    v_new: jnp.ndarray,
    pos: jnp.ndarray,  # [B] int32 write offsets
) -> PagedKVCache:
    """Write T new positions of each row into its pages, in place.

    T == 1 (decode): the target page is ``table[b, pos[b] // P]``.
    T > 1 (prefill): requires ``pos[b] % P == 0`` for every row (the
    scheduler's admission prefills always start at 0), so page t of the
    written span is whole (or the trailing partial) — each page is one
    dynamic_update_slice.
    """
    P = cache.page_size
    B, T = k_new.shape[:2]
    kh = k_new.transpose(0, 2, 1, 3)  # [B, Kh, T, d]
    vh = v_new.transpose(0, 2, 1, 3)
    if cache.quantized:
        kq, ks = _quantize_kv(kh)
        vq, vs = _quantize_kv(vh)
        planes = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
    else:
        planes = {"k": kh, "v": vh}

    bufs = {n: getattr(cache, n) for n in planes}

    def write(buf, new, b, phys, offset, t0, rows):
        # new: [B, Kh, T, *]; slab: [1, 1, Kh, rows, *]
        piece = jax.lax.dynamic_slice_in_dim(new[b], t0, rows, axis=1)
        start = (li, phys, 0, offset) + (0,) * (buf.ndim - 4)
        return jax.lax.dynamic_update_slice(
            buf, piece[None, None].astype(buf.dtype), start
        )

    if T == 1:
        for b in range(B):
            page_i = pos[b] // P
            phys = cache.table[b, page_i]
            offset = pos[b] % P
            for n, new in planes.items():
                bufs[n] = write(bufs[n], new, b, phys, offset, 0, 1)
    else:
        n_pages = -(-T // P)  # ceil
        for b in range(B):
            base_page = pos[b] // P  # pos % P == 0 required
            for t in range(n_pages):
                rows = min(P, T - t * P)
                phys = cache.table[b, base_page + t]
                for n, new in planes.items():
                    bufs[n] = write(bufs[n], new, b, phys, 0, t * P, rows)

    return PagedKVCache(
        k=bufs["k"], v=bufs["v"],
        k_scale=bufs.get("k_scale"), v_scale=bufs.get("v_scale"),
        table=cache.table,
    )


def paged_layer_view(
    cache: PagedKVCache, li: jnp.ndarray, dtype,
    ctx_bound: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather layer li's pages into dense [B, Kh, S, d] k/v (the XLA
    fallback read path — prefill, CPU tests and non-Pallas decode; the
    flash decode kernel reads the pool directly via the page table).
    `ctx_bound` (host-static, every attended position < ctx_bound)
    trims the gather to the pages that can hold live positions — an
    admission prefill of a 33-token prompt gathers 1 page per layer
    instead of the table's max_ctx-wide 16."""
    k, v = cache.k[li], cache.v[li]  # [NP, Kh, P, d]
    tbl = cache.table  # [B, J]
    if ctx_bound is not None:
        tbl = tbl[:, : max(1, -(-ctx_bound // cache.page_size))]
    kg = k[tbl]  # [B, J, Kh, P, d]
    vg = v[tbl]
    B, J, Kh, P, d = kg.shape
    kg = kg.transpose(0, 2, 1, 3, 4).reshape(B, Kh, J * P, d)
    vg = vg.transpose(0, 2, 1, 3, 4).reshape(B, Kh, J * P, d)
    if cache.quantized:
        ks = cache.k_scale[li][tbl].transpose(0, 2, 1, 3).reshape(B, Kh, J * P)
        vs = cache.v_scale[li][tbl].transpose(0, 2, 1, 3).reshape(B, Kh, J * P)
        kg = kg.astype(jnp.float32) * ks[..., None]
        vg = vg.astype(jnp.float32) * vs[..., None]
    return kg.astype(dtype), vg.astype(dtype)


class PageAllocator:
    """Host-side free-list allocator with reservation-based admission.

    ``reserve(n)`` claims capacity without picking pages (admission
    control: a request's worst case is reserved up front so lazy growth
    can never fail); ``alloc(n)`` hands out physical pages against an
    existing reservation; ``release(pages, reserved)`` returns both.
    """

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free = list(range(n_pages - 1, -1, -1))
        self._reserved = 0

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def available(self) -> int:
        """Unreserved capacity."""
        return self.n_pages - self._reserved

    def can_reserve(self, n: int) -> bool:
        return n <= self.available

    def reserve(self, n: int) -> None:
        if not self.can_reserve(n):
            raise RuntimeError(
                f"page pool over-committed: want {n}, available "
                f"{self.available} of {self.n_pages}"
            )
        self._reserved += n

    def alloc(self, n: int) -> list[int]:
        assert n <= len(self._free), (n, len(self._free))
        return [self._free.pop() for _ in range(n)]

    def release(self, pages: list[int], reserved: int) -> None:
        self._free.extend(pages)
        self._reserved -= reserved
        assert self._reserved >= 0 and len(self._free) <= self.n_pages
