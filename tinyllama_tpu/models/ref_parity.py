"""Reference-numerics emulation of the quantized (q8/q4) forward pass.

The reference's quantized modes store EVERY activation as block-32 q8
(ModuleDtype.adtype = kQint8, /root/reference/tinyllama.cpp:258-265):
each op dequantizes rows to f32, computes, and re-quantizes its output
row (gten/ops.h:40-96 read_row_to_float / write_row_from_float), and
matmuls run exact per-block *integer* dots scaled by the fp16 delta
product (gten/ops.h:224-316 vec_dot_product_q8, 319-479 ..._q8_q4).

This module reproduces those numerics exactly (modulo f32 reduction
order) so tools/parity_check.py can demand token-identical greedy output
at q8/q4 bit-widths, not just fp16. It is a correctness oracle, not a
fast path: everything runs in f32 with explicit fake-quantization at
every point the reference quantizes:

  embed(q8 copy / q4->q8 transcode, ops.h:514-533) -> [per block]
  rms_norm -> q8 -> {q,k,v} matmul -> q8 -> rope(in-place f32) -> q8 ->
  scores (int dots, 1/sqrt(d)) -> softmax f32 -> q8 (ops.h:930-1000) ->
  att @ dequant(V) f32 (ops.h:1003-1089) -> q8 -> o matmul -> q8 ->
  residual add f32 -> q8 -> ... -> lm_head -> f32 logits.

Quantization matches gten/quants.h:52-67: delta = absmax/127 in f32,
quantize with the f32 delta, dequantize with the fp16-rounded delta.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from tinyllama_tpu.config import ModelConfig
from tinyllama_tpu.models.llama import Params
from tinyllama_tpu.quant.codec import (
    BLOCK_SIZE, Q4_OFFSET, QTensor, unpack_q4_kn,
)


def _f16r(x):
    """fp16 round-trip (the reference stores deltas as fp16)."""
    return x.astype(jnp.float16).astype(jnp.float32)


def quantize_row(x: jnp.ndarray):
    """gten q8_quantize_row: per-32-block absmax/127 deltas.

    Returns (q int8 [..., K], delta_f16 [..., K//32]) — quantized with
    the f32 delta, dequantized later with the fp16-rounded delta,
    exactly like q8_quantize_block/q8_dequantize_block. Keeping q in
    int8 lets every block dot run as a native int8 MXU contraction
    (exact, like the reference's _mm_madd_epi16 integer accumulation).
    """
    blocks = x.reshape(*x.shape[:-1], -1, BLOCK_SIZE)
    absmax = jnp.max(jnp.abs(blocks), axis=-1)
    delta = absmax / 127.0
    inv = jnp.where(delta != 0.0, 1.0 / jnp.where(delta != 0.0, delta, 1.0),
                    0.0)
    q = jnp.round(blocks * inv[..., None]).astype(jnp.int8)
    return q.reshape(x.shape), _f16r(delta)


def deq(q: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * jnp.repeat(d, BLOCK_SIZE, axis=-1)


def fq(x: jnp.ndarray) -> jnp.ndarray:
    """Fake-quantize: the value the reference would read back."""
    return deq(*quantize_row(x))


def prep_weight(w: QTensor):
    """kn-layout QTensor -> (int values [N, K] int8-as-int8, fp16 deltas
    [N, K//32] f32). q4 values carry the -7 offset already applied."""
    assert w.layout == "kn", w.layout
    if w.kind == "q8":
        vals = jnp.swapaxes(w.data, -1, -2)
    else:
        vals = (
            jnp.swapaxes(unpack_q4_kn(w.data), -1, -2) - jnp.int8(Q4_OFFSET)
        )
    from tinyllama_tpu.quant.codec import _logical_scales

    scales = jnp.swapaxes(_logical_scales(w.scales), -1, -2)
    return vals.astype(jnp.int8), scales


def qmm(xq, xd, wq, wd):
    """Exact block-integer matmul: out[m,n] = sum_b (xq_b . wq_b) *
    xd[m,b] * wd[n,b] (vec_dot_product_q8 structure, ops.h:224-316).

    The per-block dot runs as a native int8 x int8 -> int32 MXU
    contraction — exact by construction, mirroring the reference's
    _mm_madd_epi16 integer accumulation. Only the f32 sum over blocks
    carries rounding, as in the reference.
    """
    M, K = xq.shape
    N = wq.shape[0]
    nb = K // BLOCK_SIZE
    xb = xq.reshape(M, nb, BLOCK_SIZE)
    wb = wq.reshape(N, nb, BLOCK_SIZE)
    # batch over blocks, contract the 32 in-block elements: [nb, M, N] i32
    p = jax.lax.dot_general(
        xb, wb, (((2,), (2,)), ((1,), (1,))),
        preferred_element_type=jnp.int32,
    )
    scaled = p.astype(jnp.float32) * (
        xd.T[:, :, None] * wd.T[:, None, :]
    )
    return jnp.sum(scaled, axis=0)  # [M, N] f32


def _rms_norm_ref(x: jnp.ndarray, w16: jnp.ndarray) -> jnp.ndarray:
    """x/(rms + 1e-6) * fp16(w) — eps outside the sqrt (ops.h rms_norm)."""
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    return x / (rms + 1e-6) * _f16r(w16)


def _rope_ref(x: jnp.ndarray, pos, d_head: int) -> jnp.ndarray:
    """In-place f32 half-rotation with per-pair pow/cos/sin
    (ops.h:714-760); applied to a dequantized row, requantized after."""
    H = x.shape[-1] // d_head
    xh = x.reshape(*x.shape[:-1], H, d_head)
    half = d_head // 2
    j = jnp.arange(half, dtype=jnp.float32)
    theta = pos.astype(jnp.float32)[..., None] * jnp.power(
        jnp.float32(10000.0), -(2.0 * j / d_head)
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x0 = xh[..., :half]
    x1 = xh[..., half:]
    shape = x0.shape
    cos = cos.reshape((1,) * (len(shape) - 2) + (1, half))
    sin = sin.reshape((1,) * (len(shape) - 2) + (1, half))
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.concatenate([o0, o1], axis=-1).reshape(x.shape)


def build_ref_step(cfg: ModelConfig, params: Params, s_max: int):
    """Compiled single-token step with reference-quantized numerics.

    Returns step(caches, token, pos) -> (logits [V] f32, caches), where
    caches = (kq, kd, vq, vd) padded to s_max positions:
      kq [L, S, kv_dim] f32-ints, kd [L, S, kv_dim/32] f32, v likewise.
    """
    H, Kh, d = cfg.n_heads, cfg.n_kv_heads, cfg.d_head
    D, F, V = cfg.n_embd, cfg.n_ffn, cfg.n_vocab
    G = cfg.q_heads_per_group
    scale = 1.0 / float(jnp.sqrt(jnp.float32(d)))

    lw = params["layers"]
    # weights travel as jit ARGUMENTS: closing over multi-GB arrays
    # embeds them as constants, which makes XLA compilation glacial
    weights = {
        name: prep_weight(lw[name])
        for name in ("wqkv", "wo", "w_gateup", "w_down")
    }
    weights["attn_norm"] = lw["attn_norm"].astype(jnp.float32)
    weights["ffn_norm"] = lw["ffn_norm"].astype(jnp.float32)
    weights["final_norm"] = params["norm"].astype(jnp.float32)
    weights["lm"] = prep_weight(params["lm_head"])

    embed = params["embed"]
    assert isinstance(embed, QTensor) and embed.layout == "nk"
    is_q8_embed = embed.kind == "q8"
    if is_q8_embed:
        # q8 -> q8 embed is a row memcpy (ops.h:519-521): the activation
        # keeps the weight's own q/delta
        weights["emb"] = (embed.data, embed.scales)
    else:
        weights["emb"] = (embed.data, embed.scales)  # q4 packed + deltas

    def layer_step(carry, layer):
        xq, xd, pos = carry
        (wqkv_q, wqkv_d), (wo_q, wo_d) = layer["wqkv"], layer["wo"]
        (wgu_q, wgu_d), (wd_q, wd_d) = layer["w_gateup"], layer["w_down"]
        kq_l, kd_l, vq_l, vd_l = (
            layer["kq"], layer["kd"], layer["vq"], layer["vd"]
        )

        x = deq(xq, xd)[None]  # [1, D]
        h = _rms_norm_ref(x, layer["attn_norm"])
        hq, hd = quantize_row(h)
        qkv = qmm(hq, hd, wqkv_q, wqkv_d)[0]  # [D + 2*kv]
        kv_dim = Kh * d
        q_rowq, q_rowd = quantize_row(qkv[:D])
        k_rowq, k_rowd = quantize_row(qkv[D:D + kv_dim])
        v_rowq, v_rowd = quantize_row(qkv[D + kv_dim:])
        # rope reads the quantized rows, rotates in f32, requantizes
        q_rot = _rope_ref(deq(q_rowq, q_rowd), pos, d)
        k_rot = _rope_ref(deq(k_rowq, k_rowd), pos, d)
        q_rowq, q_rowd = quantize_row(q_rot)
        k_rowq, k_rowd = quantize_row(k_rot)

        kq_l = jax.lax.dynamic_update_slice(kq_l, k_rowq[None], (pos, 0))
        kd_l = jax.lax.dynamic_update_slice(kd_l, k_rowd[None], (pos, 0))
        vq_l = jax.lax.dynamic_update_slice(vq_l, v_rowq[None], (pos, 0))
        vd_l = jax.lax.dynamic_update_slice(vd_l, v_rowd[None], (pos, 0))

        # scores: per-head 2-block integer dots q . k_s (qk_masked_softmax)
        nbh = d // BLOCK_SIZE
        qh = q_rowq.reshape(H, nbh, BLOCK_SIZE)
        qhd = q_rowd.reshape(H, nbh)
        ks = kq_l.reshape(s_max, Kh, nbh, BLOCK_SIZE)
        ksd = kd_l.reshape(s_max, Kh, nbh)
        kg = jnp.repeat(ks, G, axis=1)  # [S, H, nb, 32] int8
        kgd = jnp.repeat(ksd, G, axis=1)
        p = jax.lax.dot_general(  # [H, nb, S] i32, exact
            qh, kg, (((2,), (3,)), ((0, 1), (1, 2))),
            preferred_element_type=jnp.int32,
        )
        scores = jnp.sum(
            p.astype(jnp.float32) * qhd[..., None]
            * kgd.transpose(1, 2, 0),
            axis=1,
        ) * scale  # [H, S]
        key_pos = jnp.arange(s_max)
        scores = jnp.where(key_pos[None, :] <= pos, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)  # [H, S]
        # the probs row is stored quantized (qk_acv is q8, modules.cpp:180)
        probs = fq(probs)
        vdense = deq(vq_l, vd_l).reshape(s_max, Kh, d)  # dequant V, f32
        vg = jnp.repeat(vdense, G, axis=1)  # [S, H, d]
        att = jnp.einsum("hs,shd->hd", probs, vg,
                         precision=jax.lax.Precision.HIGHEST)
        attq, attd = quantize_row(att.reshape(D))
        o = qmm(attq[None], attd[None], wo_q, wo_d)[0]
        x1 = fq(x[0] + fq(o))  # residual add reads q8 rows, writes q8

        h2 = _rms_norm_ref(x1[None], layer["ffn_norm"])
        h2q, h2d = quantize_row(h2)
        gu = qmm(h2q, h2d, wgu_q, wgu_d)[0]
        gate = fq(gu[:F])
        up = fq(gu[F:])
        silu = fq(gate / (1.0 + jnp.exp(-gate)))
        prod = fq(silu * up)
        pq, pd = quantize_row(prod[None])
        down = qmm(pq, pd, wd_q, wd_d)[0]
        x2 = fq(x1 + fq(down))
        x2q, x2d = quantize_row(x2)
        return (x2q, x2d, pos), (kq_l, kd_l, vq_l, vd_l)

    @jax.jit
    def step(w, caches, token, pos):
        kq, kd, vq, vd = caches
        e_data, e_scales = w["emb"]
        if is_q8_embed:
            # the file's fp16 deltas read back to f32 on use (ops.h
            # q8_dequantize_block); the scan carry's delta slot is f32
            xq, xd = e_data[token], e_scales[token].astype(jnp.float32)
        else:
            row = QTensor(
                data=e_data[token][None],
                scales=e_scales[token][None],
                kind="q4",
            )
            from tinyllama_tpu.quant.codec import dequantize

            xq, xd = quantize_row(dequantize(row, jnp.float32)[0])

        layers = {
            "wqkv": w["wqkv"], "wo": w["wo"],
            "w_gateup": w["w_gateup"], "w_down": w["w_down"],
            "attn_norm": w["attn_norm"], "ffn_norm": w["ffn_norm"],
            "kq": kq, "kd": kd, "vq": vq, "vd": vd,
        }

        def body(carry, xs):
            carry, cache_l = layer_step(carry, xs)
            return carry, cache_l

        (xq, xd, _), (kq, kd, vq, vd) = jax.lax.scan(
            body, (xq, xd, pos), layers
        )
        x = _rms_norm_ref(deq(xq, xd)[None], w["final_norm"])
        xqf, xdf = quantize_row(x)
        lm_q, lm_d = w["lm"]
        logits = qmm(xqf, xdf, lm_q, lm_d)[0]  # f32, never quantized
        return logits, (kq, kd, vq, vd)

    def bound_step(caches, token, pos):
        return step(weights, caches, token, pos)

    return bound_step


def greedy_generate_with_logits(
    cfg: ModelConfig,
    params: Params,
    prompt_ids: list[int],
    n_predict: int,
    eos: int = 32002,
):
    """Like greedy_generate_ref_numerics but also returns the per-step
    logits array [n_steps, n_vocab] (for noise-envelope parity analysis
    against the reference probe, tools/ref_probe.cpp)."""
    import numpy as np

    s_max = -(-n_predict // BLOCK_SIZE) * BLOCK_SIZE
    kv_dim = cfg.kv_dim
    L = cfg.n_layers
    caches = (
        jnp.zeros((L, s_max, kv_dim), jnp.int8),
        jnp.zeros((L, s_max, kv_dim // BLOCK_SIZE), jnp.float32),
        jnp.zeros((L, s_max, kv_dim), jnp.int8),
        jnp.zeros((L, s_max, kv_dim // BLOCK_SIZE), jnp.float32),
    )
    step = build_ref_step(cfg, params, s_max)
    logits = None
    for i, t in enumerate(prompt_ids):
        logits, caches = step(caches, jnp.int32(t), jnp.int32(i))
    all_logits = [np.asarray(logits)]
    toks: list[int] = []
    pos = len(prompt_ids)
    while pos < n_predict:
        nxt = int(jnp.argmax(logits))
        toks.append(nxt)
        if nxt == eos:
            break
        logits, caches = step(caches, jnp.int32(nxt), jnp.int32(pos))
        all_logits.append(np.asarray(logits))
        pos += 1
    return toks, np.stack(all_logits)


def greedy_generate_ref_numerics(
    cfg: ModelConfig,
    params: Params,
    prompt_ids: list[int],
    n_predict: int,
    eos: int = 32002,
) -> list[int]:
    """Greedy generation with reference-quantized numerics, mirroring the
    sampler loop semantics (tinyllama.cpp:395-440): budget n_predict
    includes the prompt; first argmax comes after the full prompt."""
    # pad the context to a 32 multiple: the reference quantizes a score
    # row of length n_ctx with a partial last block whose absmax equals
    # our zero-padded full block's (masked probs are exactly 0)
    s_max = -(-n_predict // BLOCK_SIZE) * BLOCK_SIZE
    kv_dim = cfg.kv_dim
    L = cfg.n_layers
    caches = (
        jnp.zeros((L, s_max, kv_dim), jnp.int8),
        jnp.zeros((L, s_max, kv_dim // BLOCK_SIZE), jnp.float32),
        jnp.zeros((L, s_max, kv_dim), jnp.int8),
        jnp.zeros((L, s_max, kv_dim // BLOCK_SIZE), jnp.float32),
    )
    step = build_ref_step(cfg, params, s_max)
    logits = None
    for i, t in enumerate(prompt_ids):
        logits, caches = step(caches, jnp.int32(t), jnp.int32(i))
    out: list[int] = []
    pos = len(prompt_ids)
    while pos < n_predict:
        nxt = int(jnp.argmax(logits))
        if nxt == eos:
            break
        out.append(nxt)
        logits, caches = step(caches, jnp.int32(nxt), jnp.int32(pos))
        pos += 1
    return out
