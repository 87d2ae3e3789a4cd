"""Named sharding rules: Megatron-style tensor parallelism + data parallelism.

No reference counterpart (SURVEY.md §5 "Distributed communication
backend: none") — this is the TPU-native scale-out design:

* column-parallel: wqkv/w_gateup sharded on (fused) d_out over the
  "model" axis. Note the fused rows are laid out [q | k | v] /
  [gate | up], so a shard's rows are not one head-group's q,k,v — GSPMD
  inserts the resharding collectives for the post-split reshapes, which
  is correct everywhere and near-optimal for the decode-latency path
  (the collective is on tiny [B, T, .] activations),
* row-parallel: wo/w_down sharded on d_in — GSPMD inserts one psum per
  block on the residual path (2 all-reduces per layer, the Megatron
  minimum),
* KV cache sharded over kv-heads on "model" and batch on "data",
* embed/norms replicated (small); lm_head sharded on vocab so the logits
  matmul parallelizes and top-k gathers only [B, V] f32.

Quantized weights shard on the same *logical* axes, but their storage
layout is K-major ("kn", quant/codec.py): data/scales carry d_out on the
last axis and a d_in-derived axis at -2, the transpose of the dense [L,
d_out, d_in] layout — so quantized leaves get transposed specs. (The q4
packed-nibble and block-scale rows subdivide K by 2 and 32; sharding the
K-derived axis stays aligned as long as K/tp % 64 == 0, which holds for
every registered model at tp <= 8.)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinyllama_tpu.config import ModelConfig
from tinyllama_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tinyllama_tpu.runtime.kvcache import KVCache

#: PartitionSpec per layer-stacked param [L, d_out, d_in]-family.
#: Specs apply to dense leaves and to QTensor.data/.scales alike.
_COL_PARALLEL = ("wqkv", "w_gateup")  # shard (fused) d_out
_ROW_PARALLEL = ("wo", "w_down")  # shard d_in


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    param = next((n for n in names if n in (
        "embed", "norm", "lm_head", "attn_norm", "ffn_norm",
        *_COL_PARALLEL, *_ROW_PARALLEL,
    )), None)
    if param is None or param in ("embed", "norm", "attn_norm", "ffn_norm"):
        return P()
    # QTensor.data/.scales leaves surface as GetAttrKey path entries; their
    # storage is K-major ("kn") — the transpose of the dense layout.
    quantized = any(n in ("data", "scales") for n in names)
    if param == "lm_head":
        # shard the vocab so the logits matmul parallelizes
        return P(None, MODEL_AXIS) if quantized else P(MODEL_AXIS, None)
    if param in _COL_PARALLEL:  # shard d_out
        return P(None, None, MODEL_AXIS) if quantized \
            else P(None, MODEL_AXIS, None)
    if param in _ROW_PARALLEL:  # shard d_in
        return P(None, MODEL_AXIS, None) if quantized \
            else P(None, None, MODEL_AXIS)
    return P()


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedSharding pytree congruent with `params` (QTensor-aware)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def cache_sharding(mesh: Mesh, cfg: ModelConfig) -> NamedSharding:
    """KV cache [L, B, Kh, S, d]: batch on data, kv-heads on model."""
    tp = mesh.shape[MODEL_AXIS]
    kv_spec = MODEL_AXIS if cfg.n_kv_heads % tp == 0 and tp <= cfg.n_kv_heads \
        else None
    spec = P(None, DATA_AXIS, kv_spec, None, None)
    scale_spec = P(None, DATA_AXIS, kv_spec, None)
    return _CacheShardingRule(mesh, spec, scale_spec)


class _CacheShardingRule:
    """Applies KV-cache shardings to a KVCache pytree via device_put."""

    def __init__(self, mesh, spec, scale_spec):
        self.mesh = mesh
        self.spec = spec
        self.scale_spec = scale_spec

    def apply(self, cache: KVCache) -> KVCache:
        spec, scale_spec = self.spec, self.scale_spec
        dp = self.mesh.shape.get(DATA_AXIS, 1)
        if cache.batch % dp != 0:
            # batch too small to split over the data axis (e.g. single-prompt
            # generation on a dp>1 mesh): replicate over it instead.
            spec = P(*(None if ax == DATA_AXIS else ax for ax in spec))
            scale_spec = P(
                *(None if ax == DATA_AXIS else ax for ax in scale_spec)
            )
        ns = NamedSharding(self.mesh, spec)
        ss = NamedSharding(self.mesh, scale_spec)
        return KVCache(
            k=jax.device_put(cache.k, ns),
            v=jax.device_put(cache.v, ns),
            k_scale=None if cache.k_scale is None
            else jax.device_put(cache.k_scale, ss),
            v_scale=None if cache.v_scale is None
            else jax.device_put(cache.v_scale, ss),
        )
