"""Continuous batching scheduler.

The reference lists multi-stream decoding as an unimplemented TODO
(/root/reference/notes.txt:7); BASELINE.json makes it a headline config
("Q4 + INT8 KV-cache, continuous batching at batch 32 on one host").

Design (TPU-first):
  * the engine's batched KV cache provides B fixed slots; every slot sits
    at its own position (per-row `pos` — the cache update is a vmapped
    dynamic_update_slice, i.e. a batch scatter),
  * new requests are prefilled as a standalone single-row call, then their
    cache row + first logits are inserted into the live batch state with
    one jitted scatter (`_insert_slot`) — decode of other slots never
    stalls on a prompt,
  * decode advances ALL slots together in the engine's device-resident
    chunk (one host round-trip per C tokens per batch, not per token),
  * finished/empty slots park: they keep decoding into their own cache row
    (overwriting the same garbage position) and their tokens are dropped
    on the host — no recompile, no shape change, no branch on device.
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


@partial(jax.jit, donate_argnums=(0, 1))
def _insert_slot(
    cache: KVCache,
    logits_state: jnp.ndarray,  # [B, V]
    row_cache: KVCache,  # B=1
    row_logits: jnp.ndarray,  # [1, V]
    slot: jnp.ndarray,  # scalar int32
):
    """Scatter one prefilled request into batch slot `slot`."""

    def put(buf, row):
        if buf is None:
            return None
        start = (0, slot) + (0,) * (buf.ndim - 2)
        return jax.lax.dynamic_update_slice(buf, row.astype(buf.dtype), start)

    cache = KVCache(
        k=put(cache.k, row_cache.k),
        v=put(cache.v, row_cache.v),
        k_scale=put(cache.k_scale, row_cache.k_scale),
        v_scale=put(cache.v_scale, row_cache.v_scale),
    )
    logits_state = jax.lax.dynamic_update_slice(
        logits_state, row_logits, (slot, jnp.int32(0))
    )
    return cache, logits_state


class ContinuousBatcher:
    """Fixed-slot continuous batching over one Engine."""

    def __init__(
        self,
        engine: Engine,
        gen: GenerationConfig | None = None,
        max_batch: int | None = None,
    ):
        self.engine = engine
        self.gen = gen or GenerationConfig()
        self.B = max_batch or engine.max_batch
        self._ids = itertools.count()
        self.queue: list[Request] = []
        self.running: list[Request | None] = [None] * self.B
        self.results: dict[int, Request] = {}

        self.cache = engine.new_cache(self.B)
        V = engine.cfg.n_vocab
        self.logits = jnp.zeros((self.B, V), jnp.float32)
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.key = jax.random.PRNGKey(self.gen.seed)

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
        self.queue.append(req)
        return req.req_id

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

    def _admit(self) -> None:
        free = [s for s in range(self.B) if self.running[s] is None]
        if not free or not self.queue:
            return
        # one batched prefill for every admission this round — per-request
        # prefills each pay a host<->device round-trip (large behind a
        # tunneled chip) and re-stream the weights per prompt
        take = min(len(free), len(self.queue))
        reqs = [self.queue.pop(0) for _ in range(take)]
        batch_cache = self.engine.new_cache(take)
        logits, batch_cache, lens = self.engine.prefill(
            batch_cache, [r.prompt for r in reqs]
        )
        for i, (slot, req) in enumerate(zip(free, reqs)):
            row_cache = jax.tree.map(
                lambda a: None if a is None else a[:, i : i + 1],
                batch_cache, is_leaf=lambda a: a is None,
            )
            self.cache, self.logits = _insert_slot(
                self.cache, self.logits, row_cache, logits[i : i + 1],
                jnp.int32(slot),
            )
            self.pos = self.pos.at[slot].set(int(lens[i]))
            self.running[slot] = req

    def step(self, stream: Callable[[int, int], None] | None = None) -> None:
        """Admit pending requests, then decode one chunk for all slots."""
        self._admit()
        if not any(r is not None for r in self.running):
            return

        C = max(1, self.gen.chunk_size)
        chunk = self.engine._chunk_fn(C, self.gen.greedy, self.gen.top_k)
        toks, done, self.logits, self.cache, self.pos, self.key = chunk(
            self.engine.params, self.cache, self.logits, self.pos, self.key,
            jnp.int32(self.gen.eos_token), jnp.float32(self.gen.temperature),
        )
        toks_np = np.asarray(toks)  # [B, C] — one transfer
        now = time.perf_counter()

        max_ctx = self.engine.max_ctx
        for slot, req in enumerate(self.running):
            if req is None:
                continue
            for t in toks_np[slot]:
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

    def _finish(self, slot: int, req: Request, now: float) -> None:
        req.done = True
        req.finished_s = now
        self.results[req.req_id] = req
        self.running[slot] = None
