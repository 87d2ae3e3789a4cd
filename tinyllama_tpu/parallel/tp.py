"""Explicit tensor parallelism: shard_map over the (data, model) mesh.

Two multi-chip execution paths exist:

* parallel/sharding.py: NamedSharding + jit — GSPMD infers the
  collectives. Works for the dense/XLA fallback everywhere, but a Pallas
  custom call cannot be auto-partitioned by GSPMD.
* this module: shard_map with hand-placed collectives — every device runs
  the *same single-chip program* (including the Pallas kernels of
  ops/pallas/) on its local weight/cache shard, with exactly two psums
  per block (after the row-parallel wo and w_down matmuls, the Megatron
  minimum; models/llama.py `tp_axis`). This is the production TP path:
  the kernels stay hot and the collectives ride ICI.

Sharding plan (mesh axes ("data", "model"), parallel/mesh.py):

  wqkv, w_gateup   column-parallel on fused d_out; rows are re-ordered
                   shard-major first (tp_permute_params) so each model
                   shard owns whole attention heads / ffn slices
  wo, w_down       row-parallel on d_in (contiguous: head h's attention
                   output rows are wo's columns h*d..(h+1)*d)
  KV cache         kv-heads on "model", batch on "data"
  embed, norms,    replicated (lm_head's vocab dim 32003 resists even
  lm_head          splits; at ~16-131MB replicating costs one extra
                   weight-stream per chip, not a collective)
  tokens/pos       batch-sharded on "data"

The reference has no counterpart (SURVEY.md §2: OpenMP threads are its
only parallelism); design follows the standard Megatron/TPU recipe.
"""

from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp

from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinyllama_tpu.config import DtypePolicy, ModelConfig
from tinyllama_tpu.models import llama
from tinyllama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tinyllama_tpu.quant.codec import QTensor
from tinyllama_tpu.runtime.kvcache import KVCache

_COL = ("wqkv", "w_gateup")
_ROW = ("wo", "w_down")


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard architecture: heads and ffn divide across the model axis."""
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, (
        f"tp={tp} must divide heads {cfg.n_heads}/{cfg.n_kv_heads}"
    )
    assert cfg.n_ffn % tp == 0
    return cfg.replace(
        n_heads=cfg.n_heads // tp,
        n_kv_heads=cfg.n_kv_heads // tp,
        n_ffn=cfg.n_ffn // tp,
        head_dim=cfg.d_head,
    )


def _fused_perm(cfg: ModelConfig, tp: int) -> dict[str, jnp.ndarray]:
    """Row permutations turning [q|k|v] / [gate|up] fused layouts into
    shard-major [q0|k0|v0|q1|k1|v1|...] so a contiguous model-axis shard
    holds whole heads."""
    D, kv, F = cfg.n_embd, cfg.kv_dim, cfg.n_ffn
    qkv = []
    for s in range(tp):
        qkv += list(range(s * D // tp, (s + 1) * D // tp))
        qkv += list(range(D + s * kv // tp, D + (s + 1) * kv // tp))
        qkv += list(range(D + kv + s * kv // tp, D + kv + (s + 1) * kv // tp))
    gu = []
    for s in range(tp):
        gu += list(range(s * F // tp, (s + 1) * F // tp))
        gu += list(range(F + s * F // tp, F + (s + 1) * F // tp))
    return {
        "wqkv": jnp.asarray(qkv, jnp.int32),
        "w_gateup": jnp.asarray(gu, jnp.int32),
    }


def tp_permute_params(params: llama.Params, cfg: ModelConfig, tp: int):
    """Re-order the fused wqkv/w_gateup output rows shard-major.

    Pure relabeling — per-row quantization makes row permutation commute
    with quantization, so this works on dense arrays ([L, d_out, d_in],
    permute axis -2) and on "kn" QTensors ([L, .., d_out]-last, permute
    the last axis of data and scales) alike.
    """
    if tp == 1:
        return params
    # q4g row-parallel weights shard their K (packing) axis: a shard
    # boundary inside a pack group would make the per-shard kernel
    # re-derive the WRONG group size from its local K (codec
    # q4g_pack_group falls back 256 -> 128 whenever local K % 256 is
    # 128) and decode garbage SILENTLY — e.g. TinyLlama w_down
    # (K=5632) at tp=4. Refuse instead of corrupting.
    from tinyllama_tpu.quant.codec import q4g_pack_group

    for name in _ROW:
        w = params["layers"][name]
        if isinstance(w, QTensor) and w.kind == "q4g":
            K = w.shape[-1]
            pg = q4g_pack_group(K)
            if (K // tp) % pg:
                raise ValueError(
                    f"q4g weight '{name}' (K={K}, pack group {pg}) "
                    f"cannot shard over tp={tp}: the local K={K // tp} "
                    f"splits a pack group. Use a tp that divides "
                    f"{K // pg} group(s), or the q4/q8 policies."
                )
    perms = _fused_perm(cfg, tp)
    layers = dict(params["layers"])
    for name, perm in perms.items():
        w = layers[name]
        if isinstance(w, QTensor):
            assert w.layout == "kn", "TP permutation expects kernel layout"
            layers[name] = QTensor(
                data=w.data[..., perm], scales=w.scales[..., perm],
                kind=w.kind, layout=w.layout,
            )
        else:
            layers[name] = w[..., perm, :]
    return {**params, "layers": layers}


def tp_chunk_row_parallel(params: llama.Params, tp: int) -> llama.Params:
    """Re-stack the row-parallel weights (wo, w_down) for the overlapped
    ring all-reduce (`ring_row_parallel`): the output dim N splits into
    tp column chunks and the chunks stack onto the layer axis —
    [L, K, N] -> [L*tp, K, N/tp], so the Pallas kernel's existing
    scalar-prefetch layer indexing addresses (layer, chunk) pairs as
    ``li * tp + j`` with zero per-step HBM slicing. One-time physical
    relayout at param-prep; dequantized values are untouched (column
    grouping commutes with per-row block quantization)."""
    if tp == 1:
        return params
    layers = dict(params["layers"])
    for name in _ROW:
        w = layers[name]

        def chunk(a):
            L, R, N = a.shape
            assert N % tp == 0, (name, N, tp)
            return (
                a.reshape(L, R, tp, N // tp)
                .transpose(0, 2, 1, 3)
                .reshape(L * tp, R, N // tp)
            )

        if isinstance(w, QTensor):
            assert w.layout == "kn"
            layers[name] = QTensor(
                data=chunk(w.data), scales=chunk(w.scales),
                kind=w.kind, layout=w.layout,
            )
        else:
            # dense [L, N, K]: chunk the output rows
            L, N, K = w.shape
            layers[name] = (
                w.reshape(L, tp, N // tp, K).reshape(L * tp, N // tp, K)
            )
    return {**params, "layers": layers}


def ring_row_parallel(
    x: jnp.ndarray,  # [..., K_local] activations
    w: QTensor | jnp.ndarray,  # chunk-stacked ([L*tp, ..]) row-parallel weight
    li: jnp.ndarray,  # layer index
    axis: str,
    tp: int,
    use_pallas: bool,
) -> jnp.ndarray:
    """Row-parallel linear + all-reduce as a compute-interleaved
    reduce-scatter ring (+ final all-gather), replacing the bare psum.

    Each shard computes its local matmul in tp column chunks; the chunk
    headed for the most distant shard is computed first and the
    ppermute hop of the partial sum rides concurrently with the next
    chunk's matmul (XLA's async collective-permute + latency-hiding
    scheduler overlap them on real ICI — on this box the structure is
    validated by tests/test_tp.py's HLO interleaving assertion and the
    CPU-mesh equality dryrun). After tp-1 hops shard s holds the fully
    reduced chunk s; one tiled all-gather rebuilds the replicated
    activation row. Collective payload per hop is 1/tp of the psum's.
    """
    from tinyllama_tpu.ops.linear import linear

    me = jax.lax.axis_index(axis)

    def mm(j):
        return linear(x, w, use_pallas, layer=li * tp + j)

    # receive from the right neighbor each hop
    perm = [(i, (i - 1) % tp) for i in range(tp)]
    acc = mm((me + 1) % tp)
    for step in range(tp - 1):
        acc = jax.lax.ppermute(acc, axis, perm)
        acc = acc + mm((me + step + 2) % tp)
    # acc == sum over shards of chunk `me`; chunks concatenate in shard
    # order, which is chunk order
    return jax.lax.all_gather(acc, axis, axis=x.ndim - 1, tiled=True)


def param_partition_specs(params: llama.Params) -> "llama.Params":
    """PartitionSpec pytree for tp_permute_params output (shard_map
    in_specs / NamedSharding placement)."""

    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        param = next((n for n in names if n in (
            "embed", "norm", "lm_head", "attn_norm", "ffn_norm", *_COL, *_ROW
        )), None)
        quantized = any(n in ("data", "scales") for n in names)
        if param in _COL:  # shard (fused, shard-major) d_out
            return P(None, None, MODEL_AXIS) if quantized \
                else P(None, MODEL_AXIS, None)
        if param in _ROW:  # shard d_in
            return P(None, MODEL_AXIS, None) if quantized \
                else P(None, None, MODEL_AXIS)
        return P()  # embed / norms / lm_head replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def cache_specs(quantized: bool, batch_axis=DATA_AXIS) -> KVCache:
    """PartitionSpec pytree for a KVCache: kv-heads on "model", batch on
    the data axes — ("dcn", "data") on a multi-host mesh (`quantized` =
    int8 cache with scale planes)."""
    kv = P(None, batch_axis, MODEL_AXIS, None, None)
    sc = P(None, batch_axis, MODEL_AXIS, None)
    return KVCache(
        k=kv, v=kv,
        k_scale=sc if quantized else None,
        v_scale=sc if quantized else None,
    )


def cache_partition_specs(cache: KVCache) -> KVCache:
    return cache_specs(cache.k_scale is not None)


def paged_cache_specs(quantized: bool, batch_axis=DATA_AXIS):
    """PartitionSpec pytree for a PagedKVCache: the page pool shards its
    kv-heads on "model"; the page *table* shards its batch rows on the
    data axes, exactly like pos/tokens, so update_paged_at_layer and
    flash_paged index ``table[b]`` with the same shard-local b as every
    other batch-dim operand. The pool's page-id space replicates across
    data shards: each shard only ever reads pages its own rows wrote, so
    the replicated copies may diverge on other rows' pages without any
    shard observing it (the host allocator hands distinct physical pages
    to distinct rows globally)."""
    from tinyllama_tpu.runtime.paged import PagedKVCache

    kv = P(None, None, MODEL_AXIS, None, None)
    sc = P(None, None, MODEL_AXIS, None)
    return PagedKVCache(
        k=kv, v=kv,
        k_scale=sc if quantized else None,
        v_scale=sc if quantized else None,
        table=P(batch_axis),
    )


def place(mesh: Mesh, tree, specs):
    """device_put a pytree against a congruent PartitionSpec pytree."""
    return jax.tree.map(
        lambda x, s: None if x is None
        else jax.device_put(x, NamedSharding(mesh, s)),
        tree, specs, is_leaf=lambda x: x is None,
    )


def make_tp_step(
    cfg: ModelConfig,
    policy: DtypePolicy,
    mesh: Mesh,
    rope_tables,
    use_pallas: bool,
    params_template: llama.Params,
    cache_template: KVCache,
) -> Callable:
    """Compiled (params, cache, tokens [B,T], pos [B], last [B]) ->
    (logits [B, n_vocab] f32, cache), executing the single-chip program
    per shard with explicit collectives.

    `params_template`/`cache_template` fix the pytree structure for the
    shard_map specs; params must already be tp_permute_params'd and
    placed (see `place`).
    """
    tp = mesh.shape[MODEL_AXIS]
    lcfg = local_config(cfg, tp)
    pspecs = param_partition_specs(params_template)
    cspecs = cache_partition_specs(cache_template)

    def step_local(params, cache, tokens, pos, last):
        hidden, cache = llama.forward(
            lcfg, policy, params, tokens, cache, pos, rope_tables,
            use_pallas, tp_axis=MODEL_AXIS,
        )
        h_last = jnp.take_along_axis(
            hidden, last[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        logits = llama.lm_head_logits(params, h_last, use_pallas, policy.aq8)
        return logits, cache

    fn = shard_map(
        step_local,
        mesh=mesh,
        in_specs=(pspecs, cspecs, P(DATA_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None), cspecs),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))
