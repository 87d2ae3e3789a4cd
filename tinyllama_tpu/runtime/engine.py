"""Inference engine: compiled prefill/decode pair + generation loops.

Replaces the reference's sampler loops (/root/reference/tinyllama.cpp:
395-512), which re-feed the whole token vector each step with a start_pos
cursor, with the TPU-idiomatic two-function design (SURVEY.md §7):

* ``prefill``: one jitted call over the (bucket-padded) prompt, writing the
  prompt's K/V into the cache and returning last-token logits,
* ``decode_step``: a jitted single-token step with donated cache buffers —
  the cache is updated in place in HBM, nothing reshuffles host<->device,
* ``generate``: a *device-resident* decode loop — lax.scan over
  chunk_size decode steps with sampling fused in, so the host pays one
  round-trip per chunk of tokens instead of 2-3 per token (host<->device
  latency, not FLOPs, dominates single-token dispatch).

Prompt lengths are padded up to a small set of bucket sizes so at most
log2(max_ctx) prefill variants ever compile.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, ModelConfig
from tinyllama_tpu.models import llama
from tinyllama_tpu.ops import sampling
from tinyllama_tpu.ops.rope import rope_table
from tinyllama_tpu.runtime.kvcache import KVCache, init_cache


@dataclass
class GenStats:
    """Timing/throughput report data (the print_perf analog,
    tinyllama.cpp:515-582)."""

    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_s: float = 0.0
    decode_s: float = 0.0
    sample_s: float = 0.0
    load_s: float = 0.0
    compile_s: float = 0.0
    decode_token_times: list = field(default_factory=list)

    @property
    def decode_tokens_per_s(self) -> float:
        return self.generated_tokens / self.decode_s if self.decode_s else 0.0

    @property
    def ms_per_token(self) -> float:
        return (
            1000.0 * self.decode_s / self.generated_tokens
            if self.generated_tokens
            else 0.0
        )


def _bucket(n: int, max_ctx: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return min(b, max_ctx)


def _ctx_bucket(fill_end: int, max_ctx: int, minimum: int = 512) -> int:
    """Power-of-two context bound covering `fill_end` positions.

    Every decode-attention kernel walks its key tiles/pages over a grid
    sized by this host-static bound instead of max_ctx: the walk's
    past-fill steps skip their DMA either way, but each still costs
    ~0.3 us of grid machinery — at serving fills far below max_ctx that
    empty machinery was 65% of a B=32 decode step (see
    flash_prefill._bound_tiles). Power-of-two bucketing keeps the
    compile-variant count at log2(max_ctx / minimum) + 1."""
    return min(_bucket(fill_end, max_ctx, minimum), max_ctx)


class Engine:
    """Single-program inference engine over one model + dtype policy.

    Two multi-chip modes:

    * ``tp > 1`` — the production tensor-parallel path (parallel/tp.py):
      params are permuted shard-major, placed on a (data, model) mesh,
      and every compiled step/chunk runs under shard_map with explicit
      collectives, so the Pallas kernels execute per shard (GSPMD cannot
      partition a custom call).
    * ``param_sharding``/``cache_sharding`` (parallel/sharding.py) —
      GSPMD NamedShardings for the dense/XLA fallback path; jit
      partitions the same single-chip program.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        policy: DtypePolicy,
        params: llama.Params,
        max_batch: int = 1,
        max_ctx: int | None = None,
        use_pallas: bool | None = None,
        param_sharding=None,
        cache_sharding=None,
        tp: int = 1,
        mesh=None,
        paged: bool = False,
        tp_overlap: bool = False,
        staged: bool = True,
        sp: int = 1,
    ):
        self.cfg = cfg
        self.policy = policy
        self.params = params
        self.max_batch = max_batch
        self.max_ctx = max_ctx or cfg.max_ctx
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and policy.is_quantized
        self.use_pallas = use_pallas
        self.paged = paged
        #: chunk-local KV staging in decode chunks (runtime/staging.py);
        #: off = per-step per-row cache writes (the pre-staging path)
        self.staged = staged
        if use_pallas:
            # whole lm_head N-tiles on the kernel path (models/llama.py)
            self.params = llama.pad_lm_head_vocab(self.params)
        self.rope_tables = rope_table(self.max_ctx, cfg.d_head, cfg.rope_theta)
        self.cache_sharding = cache_sharding
        self.tp = tp
        self.mesh = mesh
        #: sequence-parallel prefill ways (parallel/sp.py): single-prompt
        #: prefills shard the prompt's T dim over `sp` devices with ring
        #: attention, then hand the K/V off into the decode cache
        #: (monolithic or paged) — decode is untouched. Composes with tp:
        #: the mesh becomes (data=sp, model=tp); prefill shards T on the
        #: data axis while decode replicates over it (sp devices are for
        #: long-prompt latency; batch-parallel decode wants dp replicas
        #: behind the router instead).
        self.sp = sp
        if sp > 1 and tp == 1:
            from tinyllama_tpu.parallel.mesh import make_mesh

            self.sp_mesh = make_mesh(tp=1, dp=sp)
        self.tp_overlap = tp if (tp > 1 and tp_overlap) else 0
        if tp > 1:
            from tinyllama_tpu.parallel import tp as tpmod
            from tinyllama_tpu.parallel.mesh import batch_axes, make_mesh

            if self.mesh is None:
                self.mesh = make_mesh(tp=tp, dp=sp)
            if sp > 1:
                self.sp_mesh = self.mesh
            self.params = tpmod.tp_permute_params(self.params, cfg, tp)
            if self.tp_overlap:
                # chunk-stack wo/w_down for the ring all-reduce
                self.params = tpmod.tp_chunk_row_parallel(self.params, tp)
            self._pspecs = tpmod.param_partition_specs(self.params)
            self.params = tpmod.place(self.mesh, self.params, self._pspecs)
            # with sp the data axis carries sequence shards during
            # prefill; decode replicates batch over it (None spec)
            self._batch_axes = None if sp > 1 else batch_axes(self.mesh)
            self._cspecs = tpmod.cache_specs(
                policy.kv_dtype == "i8", self._batch_axes
            )
            self._cspecs_paged = tpmod.paged_cache_specs(
                policy.kv_dtype == "i8", self._batch_axes
            )
            self._fwd_cfg = tpmod.local_config(cfg, tp)
        elif param_sharding is not None:
            self.params = jax.device_put(self.params, param_sharding)
            self._fwd_cfg = cfg
        else:
            self._fwd_cfg = cfg
        self._steps: dict[int, Callable] = {}
        self._chunks: dict[tuple, Callable] = {}

    # ------------------------------------------------------------------ state

    def new_cache(self, batch: int | None = None) -> KVCache:
        if self.paged:
            return self.new_paged_cache(batch or self.max_batch)
        cache = init_cache(
            self.cfg, batch or self.max_batch, self.policy.kv_dtype, self.max_ctx
        )
        if self.tp > 1:
            from tinyllama_tpu.parallel import tp as tpmod

            return tpmod.place(self.mesh, cache, self._cspecs)
        if self.cache_sharding is not None:
            if hasattr(self.cache_sharding, "apply"):
                cache = self.cache_sharding.apply(cache)
            else:
                cache = jax.device_put(cache, self.cache_sharding)
        return cache

    def new_paged_cache(self, batch: int, n_pages: int | None = None):
        """Paged cache for the non-scheduler paths (Engine.generate /
        generate_batch / CLI --paged): every row owns a static run of
        pages covering max_ctx (page 0 stays the scratch page), so the
        reference-shaped single-prompt loop exercises flash_paged
        end-to-end. Pool-under-allocation belongs to the scheduler."""
        from tinyllama_tpu.runtime.paged import (
            default_page_size, init_paged_cache,
        )

        J = self.max_ctx // default_page_size(self.max_ctx)
        cache = init_paged_cache(
            self.cfg, n_pages or (1 + batch * J), batch,
            self.policy.kv_dtype, self.max_ctx,
        )
        table = 1 + jnp.arange(batch * J, dtype=jnp.int32).reshape(batch, J)
        cache = cache.with_table(table)
        if self.tp > 1:
            from tinyllama_tpu.parallel import tp as tpmod

            return tpmod.place(self.mesh, cache, self._cspecs_paged)
        return cache

    # ------------------------------------------------------------------ steps

    def _shard_wrap(self, fn, in_specs, out_specs):
        """Wrap a local-program fn in shard_map on the engine's TP mesh.

        In the spec tuples, the strings "params"/"cache" stand for the
        engine's param/cache PartitionSpec pytrees, "batch" for a
        leading-batch-dim array sharded on the data axis, and "scalar"
        for a replicated operand.
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        named = {
            "params": self._pspecs,
            "cache": self._cspecs,
            "paged_cache": self._cspecs_paged,
            "batch": P(self._batch_axes),
            "scalar": P(),
        }
        return shard_map(
            fn,
            mesh=self.mesh,
            in_specs=tuple(named[s] for s in in_specs),
            out_specs=tuple(named[s] for s in out_specs),
            check_vma=False,
        )

    @property
    def _tp_axis(self):
        if self.tp > 1:
            from tinyllama_tpu.parallel.mesh import MODEL_AXIS

            return MODEL_AXIS
        return None

    def _step_fn(self, T: int, paged: bool = False) -> Callable:
        """Compiled (params, cache, tokens[B,T], pos[B], last[B]) ->
        (logits[B,V] f32, cache). Cache buffers are donated."""
        if (T, paged) in self._steps:
            return self._steps[(T, paged)]

        cfg, policy, use_pallas = self._fwd_cfg, self.policy, self.use_pallas
        rope_tables = self.rope_tables
        tp_axis, tp_overlap = self._tp_axis, self.tp_overlap

        # paged prefill always starts at pos 0 (admission/CLI), so T
        # bounds every attended position exactly and the dense page
        # gather (paged_layer_view) shrinks from the table's max_ctx
        # width to the prompt bucket. T == 1 is decode_step at arbitrary
        # pos — no bound.
        ctx_bound = T if (paged and T > 1) else None

        def step(params, cache, tokens, pos, last):
            hidden, cache = llama.forward(
                cfg, policy, params, tokens, cache, pos, rope_tables,
                use_pallas, tp_axis=tp_axis, tp_overlap=tp_overlap,
                ctx_bound=ctx_bound,
            )
            # gather the last valid hidden row per sequence: [B, D]
            h_last = jnp.take_along_axis(
                hidden, last[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            logits = llama.lm_head_logits(
                params, h_last, use_pallas, policy.aq8
            )
            return logits, cache

        cname = "paged_cache" if paged else "cache"
        if self.tp > 1:
            step = self._shard_wrap(
                step,
                in_specs=("params", cname, "batch", "batch", "batch"),
                out_specs=("batch", cname),
            )
        step = jax.jit(step, donate_argnums=(1,))
        self._steps[(T, paged)] = step
        return step

    def prefill(self, cache: KVCache, prompts: list[list[int]]):
        """Prefill a batch of prompts (bucket-padded). Returns
        (logits [B, V], cache, lens [B])."""
        B = len(prompts)
        assert B == cache.batch, (B, cache.batch)
        lens = np.array([len(p) for p in prompts], np.int32)
        if int(lens.max()) > self.max_ctx:
            # parity with the reference's context guard (tinyllama.cpp:46-49),
            # minus the process exit
            raise ValueError(
                f"Number of prompt tokens ({int(lens.max())}) exceeds maximum "
                f"ctx size ({self.max_ctx})"
            )
        from tinyllama_tpu.runtime.paged import PagedKVCache

        if self.sp > 1 and B == 1:
            # sequence-parallel prefill (parallel/sp.py): T shards over
            # the sp mesh with ring attention; K/V lands in this cache
            # (monolithic or paged; Kh additionally sharded under tp)
            from tinyllama_tpu.parallel.sp import sp_prefill_into_cache

            assert not self.tp_overlap, (
                "sp prefill scans [L]-stacked layers; --tp-overlap "
                "chunk-stacks wo/w_down to [L*tp]"
            )
            logits, cache = sp_prefill_into_cache(
                self._fwd_cfg, self.policy, self.params, prompts[0],
                self.rope_tables, self.sp_mesh, cache,
                use_pallas=self.use_pallas,
                tp_axis=self._tp_axis,
            )
            return logits, cache, lens

        T = _bucket(int(lens.max()), self.max_ctx)
        toks = np.zeros((B, T), np.int32)
        for i, p in enumerate(prompts):
            toks[i, : len(p)] = p
        step = self._step_fn(T, paged=isinstance(cache, PagedKVCache))
        logits, cache = step(
            self.params,
            cache,
            jnp.asarray(toks),
            jnp.zeros((B,), jnp.int32),
            jnp.asarray(lens - 1),
        )
        return logits, cache, lens

    def decode_step(self, cache: KVCache, tokens: jnp.ndarray, pos: jnp.ndarray):
        """One token per sequence. tokens [B], pos [B] -> (logits [B,V], cache)."""
        from tinyllama_tpu.runtime.paged import PagedKVCache

        step = self._step_fn(1, paged=isinstance(cache, PagedKVCache))
        return step(
            self.params, cache, tokens[:, None], pos, jnp.zeros_like(pos)
        )

    # ------------------------------------------------------ device decode loop

    def _chunk_fn(self, C: int, greedy: bool, top_k: int,
                  paged: bool = False,
                  ctx_bound: int | None = None) -> Callable:
        """Compiled chunk: sample + decode C tokens entirely on device.

        (params, cache, logits[B,V], pos[B], key, eos, temp) ->
        (tokens [B,C], done [B], logits, cache, pos, key).
        The token emitted at step i is sampled from the logits entering
        step i; once a row hits EOS it keeps emitting EOS (host truncates).

        The chunk's KV writes go through a chunk-local staging tail
        (runtime/staging.py): one batched DUS per plane per step instead
        of B chained per-row cache writes, flushed into the real cache
        once at chunk exit — the per-step write cost is O(1) in batch.
        """
        sig = (C, greedy, top_k, paged, ctx_bound)
        if sig in self._chunks:
            return self._chunks[sig]

        cfg, policy, use_pallas = self._fwd_cfg, self.policy, self.use_pallas
        rope_tables = self.rope_tables
        tp_axis, tp_overlap = self._tp_axis, self.tp_overlap
        staged = self.staged

        def chunk(params, cache, logits, pos, key, eos, temperature):
            from tinyllama_tpu.runtime.staging import (
                flush_staged, stage_cache,
            )

            # staging turns B per-row cache writes into 1 batched DUS per
            # plane — a win only at B > 1. At B == 1 the per-row path is
            # already a single DUS and the staged-tail attention pass
            # costs ~65us/tok extra (measured), so bypass it.
            use_staged = staged and pos.shape[0] > 1
            state = stage_cache(cache, pos, C) if use_staged else cache

            def body(carry, _):
                state, logits, pos, done, key = carry
                if greedy:
                    tok = sampling.greedy_device(logits)
                else:
                    key, sub = jax.random.split(key)
                    tok = sampling.sample_top_k_device(
                        logits, sub, temperature, top_k
                    )
                tok = jnp.where(done, eos, tok)
                done = done | (tok == eos)
                hidden, state = llama.forward(
                    cfg, policy, params, tok[:, None], state, pos,
                    rope_tables, use_pallas, tp_axis=tp_axis,
                    tp_overlap=tp_overlap, ctx_bound=ctx_bound,
                )
                logits = llama.lm_head_logits(
                    params, hidden[:, 0], use_pallas, policy.aq8
                )
                return (state, logits, pos + 1, done, key), tok

            B = logits.shape[0]
            init = (state, logits, pos, jnp.zeros((B,), bool), key)
            (state, logits, pos, done, key), toks = jax.lax.scan(
                body, init, length=C
            )
            cache = flush_staged(state, C) if use_staged else state
            return toks.T, done, logits, cache, pos, key

        if self.tp > 1:
            cname = "paged_cache" if paged else "cache"
            chunk = self._shard_wrap(
                chunk,
                in_specs=("params", cname, "batch", "batch", "scalar",
                          "scalar", "scalar"),
                out_specs=("batch", "batch", "batch", cname, "batch",
                           "scalar"),
            )
        chunk = jax.jit(chunk, donate_argnums=(1,))
        self._chunks[sig] = chunk
        return chunk

    # --------------------------------------------------------------- generate

    def generate(
        self,
        prompt_tokens: list[int],
        gen: GenerationConfig | None = None,
        stream: Callable[[int], None] | None = None,
    ) -> tuple[list[int], GenStats]:
        """Single-prompt generation (greedy or top-k), matching the
        reference loop semantics (tinyllama.cpp:395-512): generate up to
        n_predict - len(prompt) tokens, stop at EOS (not emitted)."""
        gen = gen or GenerationConfig()
        stats = GenStats(prompt_tokens=len(prompt_tokens))
        key = jax.random.PRNGKey(gen.seed)

        cache = self.new_cache(1)

        t0 = time.perf_counter()
        logits, cache, lens = self.prefill(cache, [prompt_tokens])
        logits.block_until_ready()
        stats.prefill_s = time.perf_counter() - t0

        max_new = max(0, min(gen.n_predict - len(prompt_tokens),
                             self.max_ctx - len(prompt_tokens)))
        if not max_new:
            # prompt already fills n_predict / max_ctx (reference loop runs
            # zero iterations, tinyllama.cpp:456): skip decode entirely
            return [], stats
        C = max(1, min(gen.chunk_size, max_new))
        # per-dispatch fill-bucketed attention grids: chunk k ends at
        # position start + k*C, so early chunks walk 512-wide key grids
        # instead of max_ctx-wide ones (same compiled fn per bucket)
        start, n_disp = int(lens[0]), 0

        def next_chunk():
            nonlocal n_disp
            n_disp += 1
            return self._chunk_fn(
                C, gen.greedy, gen.top_k, paged=self.paged,
                ctx_bound=_ctx_bucket(start + n_disp * C, self.max_ctx),
            )

        out: list[int] = []
        pos = jnp.asarray([int(lens[0])], jnp.int32)
        eos = jnp.int32(gen.eos_token)
        temp = jnp.float32(gen.temperature)

        t_decode = time.perf_counter()
        finished = False
        # Speculative double-buffering: dispatch chunk i+1 (async) before
        # reading chunk i's tokens, so the host<->device round-trip (large
        # behind a remote-chip tunnel) overlaps device execution. At most
        # one chunk of work is wasted when EOS lands.
        toks, done, logits, cache, pos, key = next_chunk()(
            self.params, cache, logits, pos, key, eos, temp
        )
        while len(out) < max_new and not finished:
            t1 = time.perf_counter()
            need_more = len(out) + toks.shape[1] < max_new
            if need_more:
                nxt = next_chunk()(
                    self.params, cache, logits, pos, key, eos, temp
                )
            toks_np = np.asarray(toks)[0]  # one transfer per chunk
            stats.decode_token_times.append(time.perf_counter() - t1)
            for t in toks_np:
                t = int(t)
                if t == gen.eos_token:
                    finished = True
                    break
                out.append(t)
                if stream is not None:
                    stream(t)
                if len(out) >= max_new:
                    break
            if not need_more:
                break
            toks, done, logits, cache, pos, key = nxt

        stats.decode_s = time.perf_counter() - t_decode
        stats.generated_tokens = len(out)
        return out, stats

    def generate_speculative(
        self,
        prompt_tokens: list[int],
        gen: GenerationConfig | None = None,
        draft_len: int = 4,
    ) -> tuple[list[int], GenStats]:
        """Greedy generation with device-resident speculative decoding
        (runtime/speculative.py): n-gram prompt-lookup drafts verified
        k+1 tokens per weight stream. Output is token-identical to
        ``generate`` (greedy acceptance is exact); the whole loop runs
        in one device call. ``stats.decode_token_times`` holds one entry
        [n_verify] — emitted/verify = the effective speedup factor."""
        from tinyllama_tpu.runtime.speculative import build_speculative_chunk

        gen = gen or GenerationConfig()
        assert gen.greedy, "speculative decoding is greedy-only"
        assert self.tp == 1, "speculative decoding: tp support pending"
        assert not self.paged, "speculative decoding uses the monolithic cache"
        assert draft_len < 128
        stats = GenStats(prompt_tokens=len(prompt_tokens))

        # the verify step writes up to draft_len K/V rows past the last
        # real position near the context limit (speculative.py): pad the
        # cache by one 128-row tile so the final verifies stay in bounds
        # (pad rows are never attended — every query position < max_ctx)
        S_pad = self.max_ctx + 128
        cache = init_cache(self.cfg, 1, self.policy.kv_dtype, S_pad)
        spec_rope = rope_table(S_pad, self.cfg.d_head, self.cfg.rope_theta)
        t0 = time.perf_counter()
        logits, cache, lens = self.prefill(cache, [prompt_tokens])
        next_tok = int(jnp.argmax(logits[0]))
        stats.prefill_s = time.perf_counter() - t0

        max_new = max(0, min(gen.n_predict - len(prompt_tokens),
                             self.max_ctx - len(prompt_tokens)))
        if not max_new or next_tok == gen.eos_token:
            return [], stats
        if max_new == 1:
            stats.generated_tokens = 1
            return [next_tok], stats

        sig = ("spec", draft_len, gen.eos_token)
        if sig not in self._chunks:
            self._chunks[sig] = build_speculative_chunk(
                self._fwd_cfg, self.policy, self.use_pallas,
                spec_rope, draft_len, self.max_ctx, gen.eos_token,
            )
        chunk = self._chunks[sig]

        toks = np.zeros((self.max_ctx + draft_len + 1,), np.int32)
        toks[: len(prompt_tokens)] = prompt_tokens
        toks[len(prompt_tokens)] = next_tok
        n_ctx = jnp.int32(len(prompt_tokens) + 1)

        t1 = time.perf_counter()
        out_buf, n_out, n_verify, cache = chunk(
            self.params, cache, jnp.asarray(toks), n_ctx,
            jnp.int32(next_tok), jnp.int32(max_new - 1),
        )
        out = [next_tok] + [int(t) for t in np.asarray(out_buf)[: int(n_out)]]
        stats.decode_s = time.perf_counter() - t1
        stats.generated_tokens = len(out)
        stats.decode_token_times.append(int(n_verify))
        return out, stats

    def generate_batch(
        self,
        prompts: list[list[int]],
        gen: GenerationConfig | None = None,
    ) -> tuple[list[list[int]], GenStats]:
        """Offline batched generation: decode all prompts in lockstep.

        One prefill + chunked device decode for the whole batch; rows
        that hit EOS keep decoding padding on device until every row is
        done (use runtime/scheduler.py ContinuousBatcher when requests
        arrive over time or lengths vary wildly).
        """
        gen = gen or GenerationConfig()
        B = len(prompts)
        stats = GenStats(prompt_tokens=sum(len(p) for p in prompts))
        key = jax.random.PRNGKey(gen.seed)

        cache = self.new_cache(B)
        t0 = time.perf_counter()
        logits, cache, lens = self.prefill(cache, prompts)
        logits.block_until_ready()
        stats.prefill_s = time.perf_counter() - t0

        # per-row budget, matching the reference loop semantics per row
        # (max_iters = n_predict - tokens.size(), tinyllama.cpp:450)
        budgets = [
            max(0, min(gen.n_predict, self.max_ctx) - int(l)) for l in lens
        ]
        max_new = max(budgets, default=0)
        if not max_new:
            return [[] for _ in range(B)], stats
        C = max(1, min(gen.chunk_size, max_new))
        start, n_disp = int(lens.max()), 0

        def next_chunk():
            nonlocal n_disp
            n_disp += 1
            return self._chunk_fn(
                C, gen.greedy, gen.top_k, paged=self.paged,
                ctx_bound=_ctx_bucket(start + n_disp * C, self.max_ctx),
            )

        outs: list[list[int]] = [[] for _ in range(B)]
        finished = [b == 0 for b in budgets]
        pos = jnp.asarray(lens, jnp.int32)
        eos = jnp.int32(gen.eos_token)
        temp = jnp.float32(gen.temperature)

        t_decode = time.perf_counter()
        emitted = 0
        while emitted < max_new and not all(finished):
            toks, done, logits, cache, pos, key = next_chunk()(
                self.params, cache, logits, pos, key, eos, temp
            )
            toks_np = np.asarray(toks)
            emitted += toks_np.shape[1]
            for b in range(B):
                if finished[b]:
                    continue
                for t in toks_np[b]:
                    t = int(t)
                    if t == gen.eos_token or len(outs[b]) >= budgets[b]:
                        finished[b] = True
                        break
                    outs[b].append(t)

        stats.decode_s = time.perf_counter() - t_decode
        stats.generated_tokens = sum(len(o) for o in outs)
        return outs, stats
