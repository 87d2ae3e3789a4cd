"""Continuous batching scheduler.

The reference lists multi-stream decoding as an unimplemented TODO
(/root/reference/notes.txt:7); BASELINE.json makes it a headline config
("Q4 + INT8 KV-cache, continuous batching at batch 32 on one host").

Design (TPU-first):
  * the engine's batched KV cache provides B fixed slots; every slot sits
    at its own position (per-row `pos` — the cache update is a vmapped
    dynamic_update_slice, i.e. a batch scatter),
  * new requests are prefilled in one batched call whose batch size is
    padded to a power-of-two bucket (bounded compile variants; the
    bucket's cache buffers are allocated once and reused across
    admissions), then inserted into the live batch state with ONE jitted
    dispatch for the whole admitted set (`_insert_slots`) — per-row
    eager inserts cost a host round-trip each, ruinous behind a
    high-latency chip tunnel. The admission prefill is dispatched while
    the previous decode chunk is still in flight, so the host never
    stalls running slots on a prompt (on-device the chunk and the
    prefill serialize — one chip — but no decode chunk is ever delayed
    by host-side admission work),
  * decode advances ALL slots together in the engine's device-resident
    chunk (one host round-trip per C tokens per batch, not per token),
  * finished/empty slots park: they keep decoding into their own cache row
    (overwriting the same garbage position) and their tokens are dropped
    on the host — no recompile, no shape change, no branch on device,
  * (paged) **bucket downshift**: when occupancy stays low, decode chunks
    run at the smallest power-of-two batch bucket that holds the active
    slots instead of the full width — parked rows stop paying attention
    tiles + sampling. Compaction is paged-native and cheap: the KV never
    moves (pages are position-independent); only the page-table rows
    (host), logits rows and pos entries are gathered into the bucket and
    scattered back after the chunk. At most log2(B) chunk variants ever
    compile; a patience counter stops shrink/grow thrash.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tinyllama_tpu.config import GenerationConfig
from tinyllama_tpu.runtime.engine import Engine
from tinyllama_tpu.runtime.kvcache import KVCache


@dataclass
class Request:
    req_id: int
    prompt: list[int]
    max_new: int
    output: list[int] = field(default_factory=list)
    done: bool = False
    submitted_s: float = 0.0
    first_token_s: float | None = None  # TTFT
    finished_s: float | None = None


@jax.jit
def _gather_rows(logits, idx):
    """Bucket downshift: pull the active slots' logits rows into a
    compact [bucket, V] array for a narrow decode chunk."""
    return jnp.take(logits, idx, axis=0)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(logits, logits_rows, idx):
    """Bucket downshift: write a narrow chunk's logits rows back into
    the full-width state (idx entries are distinct — an in-place
    scatter)."""
    return logits.at[idx].set(logits_rows)


@partial(jax.jit, donate_argnums=(0,))
def _insert_logits(
    logits_state: jnp.ndarray,  # [B, V]
    row_logits: jnp.ndarray,  # [bucket, V] admission logits
    slots: jnp.ndarray,  # [bucket] int32 (entries past the admitted set
    #                        alias slots[0] — see reverse-walk note)
):
    """Paged mode: only the logits rows move — the admission prefill
    already wrote each request's K/V into its own pool pages. All
    admitted rows land in ONE dispatch: an eager per-row insert loop
    costs a ~3 ms host round-trip per row on a tunneled chip (measured
    ~0.5 s/wave at 32 slots — half the serving wall).

    The walk always covers the FULL bucket so compile variants key on
    the bucket shape only (log2(B) total), never on how many rows were
    actually admitted. Dummy entries (index >= the admitted count)
    alias slots[0]; the walk runs in REVERSE so every dummy write lands
    before the real row-0 write overwrites it."""
    bucket = row_logits.shape[0]
    for i in range(bucket - 1, -1, -1):
        logits_state = jax.lax.dynamic_update_slice(
            logits_state, row_logits[i : i + 1], (slots[i], jnp.int32(0))
        )
    return logits_state


@partial(jax.jit, donate_argnums=(0, 1))
def _insert_slots(
    cache: KVCache,
    logits_state: jnp.ndarray,  # [B, V]
    batch_cache: KVCache,  # admission cache (bucket rows; NOT donated)
    row_logits: jnp.ndarray,  # [bucket, V]
    slots: jnp.ndarray,  # [bucket] int32 (entries past the admitted set
    #                        alias slots[0] — see reverse-walk note)
):
    """Scatter the bucket's prefilled rows into their batch slots in one
    dispatch (chained per-row DUS — a batched scatter would copy the
    whole cache slab). The walk always covers the FULL bucket so at most
    log2(B) variants compile regardless of the admitted count; dummy
    entries alias slots[0] and the reverse walk guarantees the real
    row 0 lands last (dummy rows are BOS-only prefill garbage — they
    must never survive in a live slot)."""

    def put(buf, rows, i):
        if buf is None:
            return None
        start = (jnp.int32(0), slots[i]) + (jnp.int32(0),) * (buf.ndim - 2)
        return jax.lax.dynamic_update_slice(
            buf, rows[:, i : i + 1].astype(buf.dtype), start
        )

    bucket = row_logits.shape[0]
    for i in range(bucket - 1, -1, -1):
        cache = KVCache(
            k=put(cache.k, batch_cache.k, i),
            v=put(cache.v, batch_cache.v, i),
            k_scale=put(cache.k_scale, batch_cache.k_scale, i),
            v_scale=put(cache.v_scale, batch_cache.v_scale, i),
        )
        logits_state = jax.lax.dynamic_update_slice(
            logits_state, row_logits[i : i + 1], (slots[i], jnp.int32(0))
        )
    return cache, logits_state


class ContinuousBatcher:
    """Fixed-slot continuous batching over one Engine."""

    def __init__(
        self,
        engine: Engine,
        gen: GenerationConfig | None = None,
        max_batch: int | None = None,
        paged: bool = False,
        n_pages: int | None = None,
        page_size: int | None = None,
        downshift: bool | None = None,
        min_bucket: int = 1,
        downshift_patience: int = 1,
        sp_admit_threshold: int | None = None,
        ttft_chunk: int = 0,
    ):
        self.engine = engine
        self.gen = gen or GenerationConfig()
        self.B = max_batch or engine.max_batch
        # bucket downshift (paged, tp=1): default on — compaction there
        # moves no KV. Monolithic compaction would copy whole cache rows
        # per chunk; not supported (paged already beats it everywhere).
        if downshift is None:
            downshift = paged and engine.tp == 1
        if downshift and not (paged and engine.tp == 1):
            raise ValueError("bucket downshift requires paged=True, tp=1")
        self.downshift = downshift
        #: prompts at least this long are admitted ALONE so the engine's
        #: B == 1 sequence-parallel prefill path fires (Engine(sp=N)
        #: shards the prompt's T dim over the mesh); shorter prompts
        #: batch into admission buckets as usual. Default: on whenever
        #: the engine is sequence-parallel.
        if sp_admit_threshold is None and engine.sp > 1:
            sp_admit_threshold = 1024
        self.sp_admit_threshold = sp_admit_threshold
        #: first-token latency knob (default OFF): when a running slot
        #: has not emitted anything yet, cap the next decode chunk at
        #: this length so its first token reaches the host after
        #: ~ttft_chunk steps instead of a full chunk_size. Measured on
        #: the 96-request/32-slot burst: ttft_chunk=16 cuts TTFT p50
        #: 600 -> 499 ms but costs 23% aggregate throughput (bursts
        #: admit fresh slots almost every wave, so most chunks run
        #: short) — a latency/throughput dial for interactive serving,
        #: not a default.
        self.ttft_chunk = ttft_chunk
        self.min_bucket = max(1, min(min_bucket, self.B))
        self._patience = max(1, downshift_patience)
        self._bucket = self.B
        self._shrink_streak = 0
        self._ids = itertools.count()
        self.queue: list[Request] = []
        self.running: list[Request | None] = [None] * self.B
        self.results: dict[int, Request] = {}

        self.paged = paged
        V = engine.cfg.n_vocab
        self.logits = jnp.zeros((self.B, V), jnp.float32)
        # positions live on the HOST and upload with each chunk dispatch
        # ([B] int32 — noise next to the chunk args): keeping them on
        # device meant an eager .at[].set per admitted/finished row,
        # ~3 ms of tunnel round-trip each (measured ~1/3 of the serving
        # wall at 32 slots)
        self.pos_np = np.zeros((self.B,), np.int32)
        self.key = jax.random.PRNGKey(self.gen.seed)
        if paged:
            from tinyllama_tpu.runtime.paged import (
                PageAllocator, default_page_size, init_paged_cache,
            )

            self.P = page_size or default_page_size(engine.max_ctx)
            S = engine.max_ctx
            self.J = S // self.P
            # default pool: monolithic-equivalent capacity (callers size
            # it down to their actual working set — that's the point)
            n_pages = n_pages or (self.B * self.J + 1)
            self.pool = init_paged_cache(
                engine.cfg, n_pages, self.B, engine.policy.kv_dtype, S,
                page_size=self.P,
            )
            if engine.tp > 1:
                from tinyllama_tpu.parallel import tp as tpmod

                self.pool = tpmod.place(
                    engine.mesh, self.pool, engine._cspecs_paged
                )
            self.alloc = PageAllocator(n_pages)
            # physical page 0 is the scratch page: unmapped table entries
            # are zeros, so parked/dummy rows write there harmlessly
            self.alloc.reserve(1)
            scratch = self.alloc.alloc(1)
            assert scratch == [0], scratch
            self.table_np = np.zeros((self.B, self.J), np.int32)
            self.slot_pages: list[list[int]] = [[] for _ in range(self.B)]
            self.slot_reserved: list[int] = [0] * self.B
            self.cache = None
        else:
            self.cache = engine.new_cache(self.B)
        #: per-bucket reusable admission-prefill caches (allocated lazily,
        #: reused every admission — prefill donates and returns the same
        #: buffers, so steady-state admissions allocate nothing).
        #: Unused in paged mode (admissions prefill into the pool).
        self._admit_caches: dict[int, KVCache] = {}

    # ------------------------------------------------------------------ API

    def submit(self, prompt: list[int], max_new: int | None = None) -> int:
        req = Request(
            req_id=next(self._ids),
            prompt=list(prompt),
            max_new=max_new
            if max_new is not None
            else max(1, self.gen.n_predict - len(prompt)),
            submitted_s=time.perf_counter(),
        )
        if self.paged:
            # Fail fast on requests the pool can never hold: admission
            # waits for pages to free, so a worst-case need exceeding the
            # whole pool (minus the scratch page) would block the FIFO
            # head forever and livelock run().
            need = -(-self._worst_case_tokens(req) // self.P)
            capacity = self.alloc.n_pages - 1
            if need > capacity:
                raise ValueError(
                    f"request needs up to {need} pages but the pool holds "
                    f"{capacity}: shrink prompt/max_new or grow n_pages"
                )
        self.queue.append(req)
        return req.req_id

    def _worst_case_tokens(self, req: Request) -> int:
        """Upper bound on a request's context length: prompt + budget +
        one chunk of parked overrun (finished slots keep decoding into
        their last page until the host notices), capped at max_ctx."""
        return min(
            len(req.prompt) + req.max_new + self.gen.chunk_size,
            self.engine.max_ctx,
        )

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.running)

    def run(
        self, stream: Callable[[int, int], None] | None = None
    ) -> dict[int, Request]:
        """Drive until all submitted requests finish. Returns req_id->Request."""
        while self.has_work:
            self.step(stream)
        return self.results

    # ----------------------------------------------------------------- steps

    def _admit_prefill(self):
        """Dispatch one batched prefill for every queued request with a
        free slot; returns the in-flight admission (or None).

        Dispatch-only — nothing blocks here. The admission batch size is
        padded up to a power-of-two bucket with BOS-only dummy rows so at
        most log2(B) prefill-batch variants ever compile and the bucket's
        cache buffers are reused across admissions (prefill donates them
        and hands the same memory back).
        """
        free = [s for s in range(self.B) if self.running[s] is None]
        if not free or not self.queue:
            return None
        if self.paged:
            return self._admit_prefill_paged(free)
        take = min(len(free), len(self.queue))
        take = self._sp_take(take)
        bucket = 1
        while bucket < take:
            bucket *= 2
        bucket = min(bucket, self.B)
        take = min(take, bucket)
        reqs = [self.queue.pop(0) for _ in range(take)]
        prompts = [r.prompt for r in reqs] + [[1]] * (bucket - take)
        cache = self._admit_caches.pop(bucket, None)
        if cache is None:
            cache = self.engine.new_cache(bucket)
        logits, cache, lens = self.engine.prefill(cache, prompts)
        return free, reqs, logits, cache, lens, bucket

    def _sp_take(self, take: int) -> int:
        """Clamp an admission's size so any long prompt (>= the SP
        threshold) is admitted alone: the head of the queue if it is
        long, else stop just before the first long prompt so the next
        wave admits it by itself."""
        if self.sp_admit_threshold is None:
            return take
        for i in range(take):
            if len(self.queue[i].prompt) >= self.sp_admit_threshold:
                return max(1, i)
        return take

    def _admit_prefill_paged(self, free: list[int]):
        """Paged admission: reserve each request's worst-case page count
        (prompt + max_new + one chunk of parked overrun — lazy growth can
        then never fail), allocate its prompt pages, and prefill straight
        into the pool through an admission page table. No cache insert —
        the pages already belong to the request."""
        reqs: list[Request] = []
        needs: list[int] = []
        while self.queue and len(reqs) < len(free):
            req = self.queue[0]
            long = (
                self.sp_admit_threshold is not None
                and len(req.prompt) >= self.sp_admit_threshold
            )
            if long and reqs:
                break  # long prompt admits ALONE next wave (SP prefill)
            need = -(-self._worst_case_tokens(req) // self.P)
            if not self.alloc.can_reserve(need):
                break  # FIFO admission control: wait for pages to free
            self.alloc.reserve(need)
            self.queue.pop(0)
            reqs.append(req)
            needs.append(need)
            if long:
                break  # B == 1 admission routes through Engine's SP path
        if not reqs:
            return None
        take = len(reqs)
        bucket = 1
        while bucket < take:
            bucket *= 2
        bucket = min(bucket, self.B)
        adm_table = np.zeros((bucket, self.J), np.int32)
        pages_list: list[list[int]] = []
        for i, req in enumerate(reqs):
            pn = max(1, -(-len(req.prompt) // self.P))
            pages = self.alloc.alloc(pn)
            adm_table[i, : pn] = pages
            pages_list.append(pages)
        prompts = [r.prompt for r in reqs] + [[1]] * (bucket - take)
        cache = self.pool.with_table(jnp.asarray(adm_table))
        logits, cache, lens = self.engine.prefill(cache, prompts)
        self.pool = cache  # prefill donated the pool; keep the new handle
        return "paged", free, reqs, needs, pages_list, logits, lens

    def _insert_admitted(self, admitted) -> None:
        if admitted[0] == "paged":
            _, free, reqs, needs, pages_list, logits, lens = admitted
            # bucket entries past the admitted set alias slot free[0]:
            # the insert walks the bucket in reverse, so every dummy
            # (BOS-only) row lands there before the real row 0 does
            slots = np.full((logits.shape[0],), free[0], np.int32)
            for i, (slot, req) in enumerate(zip(free, reqs)):
                self.slot_pages[slot] = pages_list[i]
                self.slot_reserved[slot] = needs[i]
                self.table_np[slot, :] = 0
                self.table_np[slot, : len(pages_list[i])] = pages_list[i]
                self.pos_np[slot] = int(lens[i])
                self.running[slot] = req
                slots[i] = slot
            self.logits = _insert_logits(
                self.logits, logits, jnp.asarray(slots)
            )
            return
        free, reqs, logits, batch_cache, lens, bucket = admitted
        slots = np.full((bucket,), free[0], np.int32)
        for i, (slot, req) in enumerate(zip(free, reqs)):
            self.pos_np[slot] = int(lens[i])
            self.running[slot] = req
            slots[i] = slot
        self.cache, self.logits = _insert_slots(
            self.cache, self.logits, batch_cache, logits,
            jnp.asarray(slots),
        )
        self._admit_caches[bucket] = batch_cache

    def _grow_pages(self, C: int) -> None:
        """Map pages covering the next C decode positions of every
        running slot (always within the slot's admission reservation)."""
        for slot, req in enumerate(self.running):
            if req is None:
                continue
            need = min(-(-(int(self.pos_np[slot]) + C) // self.P), self.J)
            have = len(self.slot_pages[slot])
            if need > have:
                new = self.alloc.alloc(need - have)
                self.slot_pages[slot].extend(new)
                self.table_np[slot, have:need] = new

    def _pick_bucket(self, n_active: int) -> int:
        """Power-of-two chunk batch for this step's occupancy. Upshift is
        immediate (correctness of a too-small bucket is never at stake —
        it just wouldn't hold the active slots); downshift waits for
        `downshift_patience` consecutive shrink votes so one short dip
        does not recompile/compact back and forth."""
        target = 1 << max(0, n_active - 1).bit_length()
        target = min(max(target, self.min_bucket), self.B)
        if target >= self._bucket:
            self._bucket = target
            self._shrink_streak = 0
        else:
            self._shrink_streak += 1
            if self._shrink_streak >= self._patience:
                self._bucket = target
                self._shrink_streak = 0
        return self._bucket

    def step(self, stream: Callable[[int, int], None] | None = None) -> None:
        """Decode one chunk for all running slots while admitting pending
        requests behind it; insert the admitted rows for the next chunk."""
        in_flight = None
        idx = None  # compact-row -> slot map (None = identity, full width)
        C = max(1, self.gen.chunk_size)
        # clamp the chunk to the largest remaining budget among running
        # slots (rounded up to a power of two — log2(chunk_size) compile
        # variants at most): a 384-step chunk against a 128-token tail
        # would decode 256 garbage positions on every row
        rem = [
            r.max_new - len(r.output) for r in self.running if r is not None
        ]
        if rem:
            C = min(C, 1 << (max(max(rem), 1) - 1).bit_length())
        if self.ttft_chunk and any(
            r is not None and not r.output for r in self.running
        ):
            # a freshly admitted slot is waiting for its first token
            C = max(1, min(C, self.ttft_chunk))
        was_running = [r is not None for r in self.running]
        if any(was_running):
            # fill-bucketed attention grids: the chunk's key walk covers
            # the largest live fill at chunk end, not max_ctx (parked
            # slots sit at pos 0 and are always covered). Floor 256
            # keeps the variant count small; serving fills rarely leave
            # the first bucket.
            from tinyllama_tpu.runtime.engine import _ctx_bucket

            fill_end = max(
                int(self.pos_np[slot])
                for slot, r in enumerate(self.running) if r is not None
            ) + C + 1
            bound = _ctx_bucket(fill_end, self.engine.max_ctx, minimum=256)
            chunk = self.engine._chunk_fn(
                C, self.gen.greedy, self.gen.top_k, paged=self.paged,
                ctx_bound=bound,
            )
            logits_in, pos_np_in = self.logits, self.pos_np
            if self.paged:
                self._grow_pages(C)
                table = self.table_np
                if self.downshift:
                    bucket = self._pick_bucket(sum(was_running))
                    if bucket < self.B:
                        active = [s for s, w in enumerate(was_running) if w]
                        parked = [
                            s for s, w in enumerate(was_running) if not w
                        ]
                        idx = np.asarray(
                            active + parked[: bucket - len(active)], np.int32
                        )
                        table = table[idx]
                        pos_np_in = self.pos_np[idx]
                        logits_in = _gather_rows(
                            self.logits, jnp.asarray(idx)
                        )
                cache_in = self.pool.with_table(jnp.asarray(table))
            else:
                cache_in = self.cache
            in_flight = chunk(
                self.engine.params, cache_in, logits_in,
                jnp.asarray(pos_np_in), self.key,
                jnp.int32(self.gen.eos_token),
                jnp.float32(self.gen.temperature),
            )
            if self.paged:
                # chain the (async) post-chunk pool into the admission
                # prefill dispatched below — no host blocking
                self.pool = in_flight[3]
        admitted = self._admit_prefill()
        if in_flight is None:
            if admitted is not None:
                self._insert_admitted(admitted)
            return

        toks, done, logits_out, cache_out, pos_out, self.key = in_flight
        if idx is None:
            self.logits = logits_out
        else:
            self.logits = _scatter_rows(
                self.logits, logits_out, jnp.asarray(idx)
            )
        if not self.paged:
            self.cache = cache_out
        toks_np = np.asarray(toks)  # [bucket, C] — one transfer
        now = time.perf_counter()
        for slot, was in enumerate(was_running):
            if was:
                self.pos_np[slot] += C

        max_ctx = self.engine.max_ctx
        rows = (
            enumerate(self.running) if idx is None
            else ((int(s), self.running[int(s)]) for s in idx)
        )
        row_toks = iter(toks_np)
        for slot, req in rows:
            t_row = next(row_toks)
            if req is None:
                continue
            for t in t_row:
                t = int(t)
                if t == self.gen.eos_token:
                    self._finish(slot, req, now)
                    break
                req.output.append(t)
                if req.first_token_s is None:
                    req.first_token_s = now
                if stream is not None:
                    stream(req.req_id, t)
                if (
                    len(req.output) >= req.max_new
                    or len(req.prompt) + len(req.output) >= max_ctx - C
                ):
                    self._finish(slot, req, now)
                    break

        if admitted is not None:
            self._insert_admitted(admitted)

    def _finish(self, slot: int, req: Request, now: float) -> None:
        req.done = True
        req.finished_s = now
        self.results[req.req_id] = req
        self.running[slot] = None
        # park the slot at pos 0: its rides (full-width steps, or bucket
        # padding) write/attend one scratch position instead of paying
        # fill-pruned attention over the dead request's stale fill — and
        # pos can never creep past max_ctx on a long-parked slot
        self.pos_np[slot] = 0
        if self.paged:
            # release pages + reservation; zero the table row so the
            # parked slot keeps writing into the scratch page (0)
            self.alloc.release(self.slot_pages[slot],
                               self.slot_reserved[slot])
            self.slot_pages[slot] = []
            self.slot_reserved[slot] = 0
            self.table_np[slot, :] = 0
