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
