"""Llama-family forward pass, functional and jit-first.

Capability parity with the reference model stack (/root/reference/
tinyllama.cpp:23-76 and gten/modules.cpp: Embedding -> 22x[AttentionBlock:
pre-norm GQA attention + SwiGLU FFN with residuals] -> RMSNorm -> lm_head),
re-designed for TPU:

* parameters are a pytree with all per-layer weights *stacked* on a leading
  layer axis; the forward runs one compiled block under lax.scan (one block
  traced once, not 22 unrolled copies),
* there is no start_pos incremental-row idiom — prefill and decode are the
  same fixed-shape function at different sequence lengths T, writing into an
  explicit KV cache (runtime/kvcache.py),
* the lm_head is applied outside `forward` to the last valid hidden row
  only (the reference's stride-0 "last token only" trick,
  gten/modules.cpp:65-81, becomes an explicit gather + single matmul).

Weight layout is [d_out, d_in] per linear (HF convention, matching the
reference checkpoint layout, tinyllama.cpp:345-391).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from tinyllama_tpu.config import DtypePolicy, ModelConfig
from tinyllama_tpu.ops.attention import gqa_attention
from tinyllama_tpu.ops.linear import (
    Weight,
    embedding_lookup,
    linear,
    linear_f32_out,
)
from tinyllama_tpu.ops.norms import rms_norm
from tinyllama_tpu.ops.pallas.decode_fused import (
    decode_fused_eligible,
    fused_norm_qkv,
    fused_out_residual,
)
from tinyllama_tpu.ops.pallas.ffn_fused import (
    ffn_fused,
    ffn_fused_eligible,
    ffn_fused_normed,
)
from tinyllama_tpu.ops.pallas.flash_paged import flash_paged_attention
from tinyllama_tpu.ops.pallas.flash_prefill import (
    flash_decode_heads_attention,
    flash_prefill_attention,
)
from tinyllama_tpu.ops.rope import apply_rope_gathered, gather_rope, rope_table
from tinyllama_tpu.quant.codec import QTensor, quantize
from tinyllama_tpu.runtime.kvcache import (
    KVCache,
    _quantize_kv,
    layer_cache_view,
    update_cache_at_layer,
)
from tinyllama_tpu.runtime.paged import (
    PagedKVCache,
    paged_layer_view,
    update_paged_at_layer,
)
from tinyllama_tpu.runtime.staging import (
    StagedKVCache,
    staged_layer_view,
    update_staged_at_layer,
)

Params = dict[str, Any]

_ACT_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}
_W_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}

#: per-layer linear weights and their [d_out, d_in] shapes (as fn of cfg).
#: q/k/v and gate/up are FUSED along d_out (rows [q | k | v] and
#: [gate | up]): one matmul kernel invocation instead of three/two per
#: block — at decode the per-launch overhead of the tiny wk/wv matmuls
#: costs more than their FLOPs. Checkpoints keep the tensors separate
#: (io/gten.py); the loader/saver merge/split (row-wise block quantization
#: commutes with row concatenation, so quantize(concat) == concat(quantize)).
_LAYER_LINEARS = {
    "wqkv": lambda c: (c.n_embd + 2 * c.kv_dim, c.n_embd),
    "wo": lambda c: (c.n_embd, c.n_embd),
    "w_gateup": lambda c: (2 * c.n_ffn, c.n_embd),
    "w_down": lambda c: (c.n_embd, c.n_ffn),
}


def act_dtype(policy: DtypePolicy):
    return _ACT_DTYPES[policy.adtype]


# ----------------------------------------------------------------------------
# Parameter construction
# ----------------------------------------------------------------------------


def init_dense_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random dense parameters (for tests/benchmarks; real weights come from
    io/gten.py or io/convert.py)."""
    n_tensors = 3 + len(_LAYER_LINEARS)
    keys = iter(jax.random.split(key, n_tensors))

    def rand(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(
            dtype
        )

    layers = {
        name: rand((cfg.n_layers, *shape_fn(cfg)))
        for name, shape_fn in _LAYER_LINEARS.items()
    }
    layers["attn_norm"] = jnp.ones((cfg.n_layers, cfg.n_embd), jnp.float32)
    layers["ffn_norm"] = jnp.ones((cfg.n_layers, cfg.n_embd), jnp.float32)
    return {
        "embed": rand((cfg.n_vocab, cfg.n_embd)),
        "layers": layers,
        "norm": jnp.ones((cfg.n_embd,), jnp.float32),
        "lm_head": rand((cfg.n_vocab, cfg.n_embd)),
    }


def init_quantized_params(
    cfg: ModelConfig, key: jax.Array, policy: DtypePolicy
) -> Params:
    """Random parameters materialized DIRECTLY in the policy's storage
    dtypes, one tensor at a time.

    `init_dense_params` + `convert_params` stages the whole model in
    f32 first — at Llama-3-8B that is a 32 GB tree and this chip holds
    16 GB, so large-preset benches/smokes build each layer's f32
    tensor, quantize it, and stack only the packed planes (peak extra
    memory = one layer tensor + the embed/lm_head tables)."""
    assert policy.is_quantized, "use init_dense_params for dense policies"
    n_tensors = 3 + len(_LAYER_LINEARS)
    keys = iter(jax.random.split(key, n_tensors))

    def rand(k, shape, scale=0.02):
        return jax.random.normal(k, shape, jnp.float32) * scale

    layers: dict[str, Any] = {}
    for name, shape_fn in _LAYER_LINEARS.items():
        kbase = next(keys)
        qts = []
        for li in range(cfg.n_layers):
            w = rand(jax.random.fold_in(kbase, li), shape_fn(cfg))
            qts.append(quantize(w, policy.wdtype, layout="kn"))
            del w
        layers[name] = QTensor(
            data=jnp.stack([q.data for q in qts]),
            scales=jnp.stack([q.scales for q in qts]),
            kind=qts[0].kind, layout="kn",
        )
        del qts
    layers["attn_norm"] = jnp.ones((cfg.n_layers, cfg.n_embd), jnp.float32)
    layers["ffn_norm"] = jnp.ones((cfg.n_layers, cfg.n_embd), jnp.float32)
    embed = quantize(
        rand(next(keys), (cfg.n_vocab, cfg.n_embd)), policy.wdtype,
        layout="nk",
    )
    lm_head = quantize(
        rand(next(keys), (cfg.n_vocab, cfg.n_embd)), policy.wdtype,
        layout="kn",
    )
    return {
        "embed": embed,
        "layers": layers,
        "norm": jnp.ones((cfg.n_embd,), jnp.float32),
        "lm_head": lm_head,
    }


def convert_params(dense: Params, policy: DtypePolicy) -> Params:
    """Cast or block-quantize dense f32 params per the dtype policy.

    Norm weights stay f32 (the reference keeps norms fp16 even in q8/q4
    files, tinyllama_to_gten.py:192-195; f32 holds those values exactly).
    """

    def conv(path_name: str, w):
        if path_name.endswith("norm"):
            return w.astype(jnp.float32)
        if policy.is_quantized:
            # matmul weights use the K-major kernel layout; the embedding
            # table stays row-major for token gathers (ops/linear.py)
            layout = "nk" if path_name == "embed" else "kn"
            return quantize(w, policy.wdtype, layout=layout)
        return w.astype(_W_DTYPES[policy.wdtype])

    out: Params = {
        "embed": conv("embed", dense["embed"]),
        "norm": dense["norm"].astype(jnp.float32),
        "lm_head": conv("lm_head", dense["lm_head"]),
        "layers": {},
    }
    for name, w in dense["layers"].items():
        out["layers"][name] = conv(name, w)
    return out


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------


def _block(
    cfg: ModelConfig,
    x: jnp.ndarray,  # [B, T, D] activation dtype
    lp: dict[str, Weight],
    cache: KVCache,  # full stacked cache (carry)
    li: jnp.ndarray,  # traced layer index
    pos: jnp.ndarray,  # [B] write offsets
    q_positions: jnp.ndarray,  # [B, T]
    cos,  # [B, T, d_half] pre-gathered rope rows (gather_rope)
    sin,
    use_pallas: bool,
    layer=None,  # == li iff lp's matmul weights are layer-stacked
    tp_axis: str | None = None,  # shard_map TP: psum after row-parallel mats
    aq8: bool = False,
    tp_overlap: int = 0,  # != 0: ring-overlapped all-reduce of that width
    ctx_bound: int | None = None,  # host-static: every attended pos < this
):
    """One pre-norm transformer block (gten/modules.cpp:224-254).

    Under shard_map tensor parallelism (parallel/tp.py) `cfg` carries the
    per-shard head/ffn counts, lp's weights are the local shards, and the
    two row-parallel matmul outputs (wo, w_down) are all-reduced over
    `tp_axis` — the Megatron-minimal 2 collectives per block.
    """
    B, T, D = x.shape
    H, Kh, d = cfg.n_heads, cfg.n_kv_heads, cfg.d_head

    def _reduce(y):
        return jax.lax.psum(y, tp_axis) if tp_axis else y

    def _row_linear(y, name):
        """Row-parallel matmul + all-reduce: a bare psum, or the chunked
        ring with compute interleaved (parallel/tp.py ring_row_parallel,
        --tp-overlap; weights then carry chunk-stacked [L*tp, ..])."""
        if tp_overlap:
            from tinyllama_tpu.parallel.tp import ring_row_parallel

            return ring_row_parallel(
                y, lp[name], li, tp_axis, tp_overlap, use_pallas
            )
        return _reduce(linear(y, lp[name], use_pallas, layer, aq8))

    # decode fast path: norms and residuals fused into the weight-
    # streaming kernels (ops/pallas/decode_fused.py) — the per-layer XLA
    # glue (2 norms, 2 residual adds, their HBM round-trips) vanishes
    fused = use_pallas and decode_fused_eligible(
        cfg, lp, B * T, tp_axis, aq8, layer
    )

    def _norm_w(name):
        # forward keeps norm weights stacked [L, D] on the fused path
        # (layer-indexed inside the kernels); scan-sliced [D] otherwise
        w = lp[name]
        return w[li] if w.ndim == 2 else w

    if fused:
        qkv = fused_norm_qkv(
            x, lp["attn_norm"], lp["wqkv"], li, cfg.norm_eps,
            cfg.norm_eps_inside_sqrt,
        )
    else:
        h = rms_norm(x, _norm_w("attn_norm"), cfg.norm_eps,
                     cfg.norm_eps_inside_sqrt)
        qkv = linear(h, lp["wqkv"], use_pallas, layer, aq8)
    q = qkv[..., : H * d].reshape(B, T, H, d)
    k = qkv[..., H * d : (H + Kh) * d].reshape(B, T, Kh, d)
    v = qkv[..., (H + Kh) * d :].reshape(B, T, Kh, d)

    q = apply_rope_gathered(q, cos, sin)
    k = apply_rope_gathered(k, cos, sin)

    if isinstance(cache, StagedKVCache):
        # chunked decode (runtime/staging.py): the step's K/V goes into
        # the chunk-local staging tail — ONE batched DUS per plane
        # instead of B chained per-row writes — and attention reads
        # {pool below the chunk base} + {staged tail, masked to the step}
        cache = update_staged_at_layer(cache, li, k, v, pos)
        if use_pallas and T == 1:
            if isinstance(cache.pool, PagedKVCache):
                from tinyllama_tpu.ops.pallas.flash_paged import (
                    flash_paged_staged_attention,
                )

                attn = flash_paged_staged_attention(
                    q, cache, li, pos, ctx_bound=ctx_bound
                )
            else:
                from tinyllama_tpu.ops.pallas.flash_prefill import (
                    flash_staged_attention,
                )

                attn = flash_staged_attention(
                    q, cache, li, pos, ctx_bound=ctx_bound
                )
        else:
            k_eff, v_eff = staged_layer_view(cache, li, x.dtype)
            attn = gqa_attention(q, k_eff, v_eff, q_positions)
    elif isinstance(cache, PagedKVCache):
        cache = update_paged_at_layer(cache, li, k, v, pos)
        if use_pallas and T == 1:
            # page-walking flash decode: DMA cost tracks each row's fill
            attn = flash_paged_attention(q, cache, li, pos,
                                         ctx_bound=ctx_bound)
        elif use_pallas:
            # paged prefill (always pos == 0: admission/CLI — see
            # Engine._step_fn): the chunk's own K/V is the WHOLE
            # attended context, and _quantize_kv here produces the
            # exact int8+scale values update_paged_at_layer just wrote,
            # so attending a temporary single-layer dense view is
            # value-identical to reading the pool back — without the
            # per-layer whole-table page gather + dense S² fallback
            # attention that made a 3K-token paged prefill 3.6x slower
            # than monolithic (PERF.md, round 5)
            kh = k.transpose(0, 2, 1, 3)  # [B, Kh, T, d]
            vh = v.transpose(0, 2, 1, 3)
            if cache.quantized:
                kq, ks = _quantize_kv(kh)
                vq, vs = _quantize_kv(vh)
                tmp = KVCache(k=kq[None], v=vq[None],
                              k_scale=ks[None], v_scale=vs[None])
            else:
                tmp = KVCache(k=kh[None], v=vh[None],
                              k_scale=None, v_scale=None)
            attn = flash_prefill_attention(q, tmp, jnp.int32(0), pos)
        else:
            # CPU/fallback prefill: gather the pages into a dense view
            k_eff, v_eff = paged_layer_view(cache, li, x.dtype, ctx_bound)
            attn = gqa_attention(q, k_eff, v_eff, q_positions)
    else:
        cache = update_cache_at_layer(cache, li, k, v, pos)
        if fused and T == 1 and B == 1 and d % 32 == 0:
            # b1 latency path: attention + wo + residual in ONE call —
            # the attention result stays in VMEM scratch and feeds the
            # wo blockdot directly (ops/pallas/attn_out_fused.py)
            from tinyllama_tpu.ops.pallas.attn_out_fused import (
                fused_attn_out,
            )

            x = fused_attn_out(q, cache, li, pos, x, lp["wo"],
                               ctx_bound=ctx_bound)
            attn = None
        elif use_pallas and T == 1:
            # decode: all kv heads per grid step (grid (B, S/bs) with
            # fill-pruned tiles) — the generic kernel's (B, Kh, 1, S/bs)
            # grid pays ~0.3 us of per-step overhead on tiny work
            attn = flash_decode_heads_attention(q, cache, li, pos,
                                                ctx_bound=ctx_bound)
        elif use_pallas:
            # blocked kernel with causal tile pruning: cost tracks the
            # filled context per sequence — an unblocked single-pass
            # kernel would read the whole padded cache slab every step
            # (~100us/token at S=2048 vs ~tile cost at low fill), which
            # is why it was retired
            attn = flash_prefill_attention(q, cache, li, pos)
        else:
            k_eff, v_eff = layer_cache_view(cache, li, x.dtype)
            attn = gqa_attention(q, k_eff, v_eff, q_positions)
    if attn is not None:
        attn = attn.reshape(B, T, H * d).astype(x.dtype)
        if fused:
            x = fused_out_residual(attn, x, lp["wo"], li)
        else:
            x = x + _row_linear(attn, "wo")
    if fused and ffn_fused_eligible(cfg, lp["w_gateup"], lp["w_down"],
                                    B * T):
        # x + FFN(rms_norm(x)) in one segmented-grid kernel: the
        # [B, n_ffn] intermediate lives in VMEM scratch, never HBM
        return ffn_fused_normed(
            x, lp["ffn_norm"], lp["w_gateup"], lp["w_down"], li, cfg
        ), cache

    h = rms_norm(x, _norm_w("ffn_norm"), cfg.norm_eps,
                 cfg.norm_eps_inside_sqrt)
    if (
        use_pallas and not aq8 and tp_axis is None and layer is not None
        and ffn_fused_eligible(cfg, lp["w_gateup"], lp["w_down"], B * T)
    ):
        # decode: whole SwiGLU FFN in one segmented-grid kernel — the
        # [B, n_ffn] intermediate lives in VMEM scratch, never in HBM
        ffn = ffn_fused(h, lp["w_gateup"], lp["w_down"], li, cfg)
    else:
        gate_up = linear(h, lp["w_gateup"], use_pallas, layer, aq8)
        gate = gate_up[..., : cfg.n_ffn]
        up = gate_up[..., cfg.n_ffn :]
        # SwiGLU: silu(gate) * up -> down (modules.cpp:238-247)
        inner = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        return x + _row_linear(inner, "w_down"), cache
    return x + _reduce(ffn), cache


def forward(
    cfg: ModelConfig,
    policy: DtypePolicy,
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32
    cache: KVCache,
    pos: jnp.ndarray,  # [B] int32: absolute position of tokens[:, 0]
    rope_tables: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    use_pallas: bool = False,
    tp_axis: str | None = None,
    tp_overlap: int = 0,
    ctx_bound: int | None = None,  # host-static: every attended pos < this
) -> tuple[jnp.ndarray, KVCache]:
    """Run the model over T new tokens per sequence.

    Returns (hidden [B, T, D] post-final-norm, updated cache). Works for
    prefill (T = padded prompt length, pos = 0) and decode (T = 1) alike.
    """
    B, T = tokens.shape
    adt = act_dtype(policy)
    cos, sin = rope_tables if rope_tables is not None else rope_table(
        cache.max_ctx, cfg.d_head, cfg.rope_theta
    )
    q_positions = pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    # rope rows are layer-invariant: gather once per step, outside the
    # scan (XLA does not hoist the gather out of the scan body)
    cos_g, sin_g = gather_rope(q_positions, cos, sin)

    x = embedding_lookup(tokens, params["embed"], adt)

    layers = params["layers"]
    # Quantized weights stay stacked and are indexed inside the matmul
    # kernel per layer (ops/pallas/qmatmul.py `layer`); scanning them as
    # xs would make XLA copy each layer's weights in HBM every step
    # (dynamic-slice into a custom-call does not fuse). The cache flows
    # through the scan as carry for the same reason: xs/ys slicing would
    # copy every layer's whole cache slab per step, where the carry is
    # updated in place (runtime/kvcache.py) and read either by the flash
    # kernel (layer-indexed DMA) or a fallback per-layer view.
    stacked = {n: w for n, w in layers.items() if isinstance(w, QTensor)}
    # on the fused decode path the norm weights also stay stacked: the
    # fused kernels index [L, D] rows via the prefetched layer scalar,
    # so the scan's per-layer xs slices (~2 ops/layer/token) vanish
    if use_pallas and decode_fused_eligible(
        cfg, layers, B * T, tp_axis, policy.aq8, 0 if stacked else None
    ):
        stacked = {
            **stacked,
            "attn_norm": layers["attn_norm"],
            "ffn_norm": layers["ffn_norm"],
        }
    scanned_ws = {n: w for n, w in layers.items() if n not in stacked}

    stacked_q = any(isinstance(w, QTensor) for w in stacked.values())

    def run_block(x, cache, li, lp_scanned):
        return _block(
            cfg, x, {**lp_scanned, **stacked}, cache, li, pos,
            q_positions, cos_g, sin_g, use_pallas,
            layer=li if stacked_q else None,
            tp_axis=tp_axis, aq8=policy.aq8, tp_overlap=tp_overlap,
            ctx_bound=ctx_bound,
        )

    if scanned_ws:
        def body(carry, scanned):
            li, lp_scanned = scanned
            x, cache = run_block(*carry, li, lp_scanned)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            body,
            (x, cache),
            (jnp.arange(cfg.n_layers, dtype=jnp.int32), scanned_ws),
        )
    else:
        # everything layer-stacked (the fused quantized path): a
        # fori_loop hands the body its layer index directly, dropping
        # the scan's per-iteration xs slice + carry machinery
        # (~2.5 us/layer-step; 752 -> 777 tok/s at b1, round 3).
        # History: round 3 measured a ~35% SERVING regression for this
        # walk under the scheduler's eager per-row admission inserts
        # and gated it to B*T == 1; with the round-4 serving machinery
        # (one-dispatch bucket-keyed inserts, host-side positions,
        # downshift) the round-5 A/B (TINYLLAMA_FORI knob, PERF.md)
        # showed the regression gone and fori AHEAD everywhere it is
        # eligible — paged serve +1.6%, monolithic serve +2.3%, b16
        # lockstep +2.5% — so it is now the default whenever no weight
        # rides the scan. The old regression was an interaction with
        # the retired eager insert dispatches, not a property of the
        # loop construct.
        x, cache = jax.lax.fori_loop(
            0, cfg.n_layers,
            lambda li, carry: run_block(*carry, li, {}),
            (x, cache),
        )

    x = rms_norm(x, params["norm"], cfg.norm_eps, cfg.norm_eps_inside_sqrt)
    return x, cache


def pad_lm_head_vocab(params: Params, multiple: int = 2048) -> Params:
    """Pad a quantized kn-layout lm_head's vocab dim (32003 -> 32768) with
    zero data + zero scales so every kernel N-tile is whole — Pallas's
    masked ragged boundary block costs a full grid step whose thin DMA
    rows stream poorly (see qmatmul._pick_bn). Zero scales null the pad
    columns exactly (q4's -7 offset is scale-multiplied too), and
    lm_head_logits slices them back off, so samplers never see pad ids.
    Applied at Engine param-prep time: checkpoints, converters, the CPU
    fallback, and the parity emulator all keep the exact 32003 shape."""
    lm = params["lm_head"]
    if not (isinstance(lm, QTensor) and lm.layout == "kn"):
        return params
    N = lm.data.shape[-1]
    pad = (-N) % multiple
    if not pad:
        return params
    widths = [(0, 0)] * (lm.data.ndim - 1) + [(0, pad)]
    return {
        **params,
        "lm_head": QTensor(
            data=jnp.pad(lm.data, widths),
            scales=jnp.pad(lm.scales, widths),
            kind=lm.kind, layout=lm.layout,
        ),
    }


def lm_head_logits(
    params: Params, hidden: jnp.ndarray, use_pallas: bool = False,
    aq8: bool = False,
) -> jnp.ndarray:
    """Project hidden rows [B, D] to f32 logits [B, n_vocab]
    (gten/modules.cpp:65-81: lm_head activations are always f32). The
    matmul runs in the activation dtype with f32 accumulation. A
    vocab-padded lm_head (pad_lm_head_vocab) is sliced back to the
    embedding table's true vocab size."""
    logits = linear_f32_out(hidden, params["lm_head"], use_pallas, aq8)
    emb = params["embed"]
    V = emb.data.shape[0] if isinstance(emb, QTensor) else emb.shape[0]
    return logits[..., :V] if logits.shape[-1] != V else logits
