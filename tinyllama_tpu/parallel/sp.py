"""Engine-level sequence-parallel prefill (context parallelism).

The kernel-level component (parallel/ring.py: causal ring GQA attention
under shard_map, SURVEY.md §5's long-context row) gets its Engine wiring
here: a FULL-MODEL prefill with the prompt's sequence dim sharded over
the mesh data axis. Every position-independent op (embedding gather,
norms, matmuls, rope, SwiGLU) runs on the local T-slice with zero
collectives; attention rotates KV blocks around the ring. The reference
has no counterpart (single host, dense ctx² scores, max_ctx 2048 —
/root/reference/gten/modules.cpp:180); this is the piece that makes
long-context presets (Llama-3 8K+) prefillable past one chip's
activation memory.

Decode stays single-stream after the handoff: each shard's K/V blocks
all-gather along T into the ordinary monolithic cache (one jitted
reshard — the standard context-parallel serving shape: prefill sharded,
KV redistributed, decode dense), so every decode kernel, scheduler and
sampler runs untouched.

Layout notes: the per-layer K/V produced on each shard ride the layer
scan as stacked ys ([L, B, Kh, Tl, d]); shard_map's out_specs then
declare them T-sharded, so the "all-gather" is XLA's resharding of the
output, not hand-written collectives. The last prompt token's hidden
row (the logits row) lives on one shard — a masked psum replicates it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tinyllama_tpu.config import DtypePolicy, ModelConfig
from tinyllama_tpu.models import llama
from tinyllama_tpu.ops.linear import embedding_lookup, linear
from tinyllama_tpu.ops.norms import rms_norm
from tinyllama_tpu.ops.rope import apply_rope_gathered, gather_rope
from tinyllama_tpu.parallel.mesh import DATA_AXIS
from tinyllama_tpu.parallel.ring import ring_gqa_attention


@functools.partial(
    jax.jit, static_argnames=("cfg", "policy", "mesh", "axis", "tp_axis")
)
def seq_parallel_prefill(
    cfg: ModelConfig,
    policy: DtypePolicy,
    params: llama.Params,
    tokens: jnp.ndarray,  # [1, T] int32, T % mesh.shape[axis] == 0
    rope_tables: tuple[jnp.ndarray, jnp.ndarray],
    mesh: Mesh,
    axis: str = DATA_AXIS,
    tp_axis: str | None = None,
):
    """Run the full model over a T-sharded prompt (B == 1, pos 0).

    ``cfg`` is the PER-SHARD architecture: the global one at tp == 1, or
    `parallel.tp.local_config`'s heads/ffn division when ``tp_axis``
    names a second (model) mesh axis — then `params` must already be
    tp-permuted shard-major and the block runs the Megatron-minimum two
    psums (after wo and w_down) over `tp_axis` while ring attention
    rotates KV over the sequence axis with the shard's LOCAL heads (the
    two parallelisms compose orthogonally: TP splits heads, SP splits
    each head's positions).

    Returns (hidden_last [1, D] f32 post-final-norm — replicated,
    k_all, v_all [L, 1, Kh, T, d] activation dtype — T-sharded (and
    Kh-sharded under tp) global arrays). Padding rows past the true
    prompt are causally inert (later positions) and their cache rows
    sit beyond the decode fill.
    """
    B, T = tokens.shape
    assert B == 1, "sequence-parallel prefill is a single-stream path"
    sp = mesh.shape[axis]
    assert T % sp == 0, (T, sp)
    adt = llama.act_dtype(policy)
    H, Kh, d = cfg.n_heads, cfg.n_kv_heads, cfg.d_head
    cos, sin = rope_tables
    q_pos = jnp.arange(T, dtype=jnp.int32)[None]
    cos_g, sin_g = gather_rope(q_pos, cos, sin)

    def shard_fn(params, tokens_l, cos_l, sin_l):
        layers = params["layers"]
        x = embedding_lookup(tokens_l, params["embed"], adt)

        def body(x, lp):
            h = rms_norm(x, lp["attn_norm"], cfg.norm_eps,
                         cfg.norm_eps_inside_sqrt)
            qkv = linear(h, lp["wqkv"], use_pallas=False)
            Tl = x.shape[1]
            q = qkv[..., : H * d].reshape(1, Tl, H, d)
            k = qkv[..., H * d : (H + Kh) * d].reshape(1, Tl, Kh, d)
            v = qkv[..., (H + Kh) * d :].reshape(1, Tl, Kh, d)
            q = apply_rope_gathered(q, cos_l, sin_l)
            k = apply_rope_gathered(k, cos_l, sin_l)
            attn = ring_gqa_attention(q, k, v, axis_name=axis)
            o = linear(
                attn.reshape(1, Tl, H * d).astype(x.dtype), lp["wo"],
                use_pallas=False,
            )
            if tp_axis is not None:  # row-parallel wo: reduce shards
                o = jax.lax.psum(o, tp_axis)
            x = x + o
            h = rms_norm(x, lp["ffn_norm"], cfg.norm_eps,
                         cfg.norm_eps_inside_sqrt)
            gu = linear(h, lp["w_gateup"], use_pallas=False)
            gate, up = gu[..., : cfg.n_ffn], gu[..., cfg.n_ffn :]
            inner = jax.nn.silu(gate.astype(jnp.float32)).astype(
                x.dtype
            ) * up
            dn = linear(inner, lp["w_down"], use_pallas=False)
            if tp_axis is not None:  # row-parallel w_down
                dn = jax.lax.psum(dn, tp_axis)
            x = x + dn
            # this layer's local K/V blocks ride the scan as stacked ys
            return x, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

        x, (k_all, v_all) = jax.lax.scan(body, x, layers)
        x = rms_norm(x, params["norm"], cfg.norm_eps,
                     cfg.norm_eps_inside_sqrt)

        # replicate the LAST local row's hidden state; the caller picks
        # the shard owning the last prompt token. A masked psum moves
        # one [1, D] row over the same ICI links the ring used.
        last_local = x[:, -1].astype(jnp.float32)  # [1, D]
        idx = jax.lax.axis_index(axis)
        hidden_by_shard = jax.lax.psum(
            jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0) == idx),
                last_local[None], 0.0,
            ),
            axis,
        )  # [sp, 1, D] — every shard's last row, replicated
        return x, k_all, v_all, hidden_by_shard

    if tp_axis is None:
        pspecs = jax.tree.map(lambda _: P(), params)
        kv_spec = P(None, None, None, axis, None)
    else:
        from tinyllama_tpu.parallel.tp import param_partition_specs

        pspecs = param_partition_specs(params)
        kv_spec = P(None, None, tp_axis, axis, None)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            pspecs,
            P(None, axis),
            P(None, axis, None),
            P(None, axis, None),
        ),
        out_specs=(
            P(None, axis, None),
            kv_spec,
            kv_spec,
            P(),
        ),
        check_vma=False,
    )
    hidden, k_all, v_all, hidden_by_shard = fn(params, tokens, cos_g, sin_g)
    return hidden, k_all, v_all, hidden_by_shard


def sp_prefill_into_cache(
    cfg: ModelConfig,
    policy: DtypePolicy,
    params: llama.Params,
    prompt: list[int],
    rope_tables,
    mesh: Mesh,
    cache,  # KVCache OR PagedKVCache (B == 1), written in place (donated)
    axis: str = DATA_AXIS,
    use_pallas: bool = False,
    tp_axis: str | None = None,
):
    """Sequence-parallel prefill of one prompt + KV handoff into the
    decode cache (monolithic or paged). Returns (logits [1, V] f32,
    cache). ``cfg`` is the per-shard architecture (local heads under tp,
    see seq_parallel_prefill).

    The prompt is padded to a multiple of (sp * 8) local rows; pad rows
    are causally downstream of every prompt row and land at cache
    positions >= len(prompt), which decode (fill = len(prompt)) never
    attends. In a paged cache, pad positions past the prompt's
    allocated pages fall through unmapped table entries onto the
    scratch page (0) — harmless by the pool's design.
    """
    from tinyllama_tpu.runtime.paged import PagedKVCache

    sp = mesh.shape[axis]
    n = len(prompt)
    T = -(-n // (sp * 8)) * (sp * 8)
    toks = jnp.asarray(
        [prompt + [0] * (T - n)], jnp.int32
    )
    hidden, k_all, v_all, hidden_by_shard = seq_parallel_prefill(
        cfg, policy, params, toks, rope_tables, mesh, axis, tp_axis,
    )
    Tl = T // sp
    owner, row = divmod(n - 1, Tl)
    if row == Tl - 1:
        h_last = hidden_by_shard[owner]  # the shard's replicated last row
    else:
        h_last = hidden[:, n - 1].astype(jnp.float32)  # sharded gather
    logits = llama.lm_head_logits(params, h_last, use_pallas, policy.aq8)

    writer = (
        _write_kv_paged if isinstance(cache, PagedKVCache) else _write_kv
    )
    cache = writer(cache, k_all, v_all, jnp.int32(n))
    return logits, cache


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_kv(cache, k_all, v_all, n_prompt):
    """One jitted handoff: reshard the T-sharded per-layer K/V into the
    dense decode cache (quantizing to its storage dtype on the way)."""
    from tinyllama_tpu.runtime.kvcache import update_cache_at_layer

    L = k_all.shape[0]
    pos0 = jnp.zeros((1,), jnp.int32)
    for li in range(L):
        cache = update_cache_at_layer(
            cache, jnp.int32(li),
            k_all[li].transpose(0, 2, 1, 3),  # [1, T, Kh, d]
            v_all[li].transpose(0, 2, 1, 3),
            pos0,
        )
    return cache


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_kv_paged(cache, k_all, v_all, n_prompt):
    """Paged handoff twin of _write_kv: each layer's T-sharded K/V lands
    in the row's pages through its table (update_paged_at_layer's whole-
    page writes; pad rows past the prompt's last mapped page fall onto
    the scratch page)."""
    from tinyllama_tpu.runtime.paged import update_paged_at_layer

    L = k_all.shape[0]
    pos0 = jnp.zeros((1,), jnp.int32)
    for li in range(L):
        cache = update_paged_at_layer(
            cache, jnp.int32(li),
            k_all[li].transpose(0, 2, 1, 3),  # [1, T, Kh, d]
            v_all[li].transpose(0, 2, 1, 3),
            pos0,
        )
    return cache
