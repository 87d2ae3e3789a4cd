"""Fused decode-layer kernels: norms and residuals inside the matmuls.

The reference's per-layer decode is one C++ pass over preallocated
buffers (/root/reference/gten/ops.h:613-670 attention/FFN matmuls,
762-814 rms_norm — all freestanding loops, but with zero dispatch cost
between them). On TPU the XLA glue between Pallas calls (norm kernels,
residual adds, their HBM round-trips) costs a measurable ~2-3 us per
layer at decode, where a whole layer's weight stream is only ~50 us.
These kernels match the reference's granularity by folding the
elementwise neighbors into the weight-streaming matmuls:

* ``fused_norm_qkv``:     rms_norm(x) -> wqkv blockdot, one call. The
  normed row is computed once into VMEM scratch on the first grid step
  and re-sliced per K-tile — x is read from HBM once and the normed
  activation never exists in HBM.
* ``fused_out_residual``: x + attn @ wo, one call. The output block
  accumulator is *initialized with the residual* instead of zeros.
* ``ffn_fused_normed`` (ops/pallas/ffn_fused.py): rms_norm -> gate/up ->
  SwiGLU -> down -> +residual, one call.

All three reuse the decode integer blockdot (`_block_dot_q`) and stream
exactly the same weight bytes as the unfused calls. Decode-only
(M <= 8); the M-large prefill path keeps separate kernels where dequant
amortizes differently. Numerics: norms and residual adds run in f32
inside the kernels (the unfused path's f32 norm matches; the residual
add gains a rounding step of precision over bf16 +).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyllama_tpu.ops.pallas.ffn_fused import (
    _FUSED_M,
    _pick_dot_q,
    _rms_normed,
)
from tinyllama_tpu.ops.pallas.qmatmul import (
    _SMALL_M, _load_scales, _pick_bk, _pick_bn,
)
from tinyllama_tpu.quant.codec import BLOCK_SIZE, QTensor


def _norm_qkv_kernel(
    li_ref, x_ref, nw_ref, w_ref, s_ref, o_ref, nx,
    *, kind: str, compute_dtype, bk: int, eps: float, inside: bool,
    dot_q,
):
    n = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when((n == 0) & (k == 0))
    def _():
        nx[:] = _rms_normed(x_ref[:].astype(jnp.float32), nw_ref[:], eps,
                            inside)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xb = nx[:, pl.ds(k * bk, bk)].astype(compute_dtype)
    o_ref[:] += dot_q(xb, w_ref[:], _load_scales(s_ref), kind,
                      compute_dtype)


@functools.partial(
    jax.jit, static_argnames=("kind", "eps", "inside", "bm", "interpret")
)
def _norm_qkv(x, nw, data, scales, li, kind, eps, inside, bm, interpret):
    D = x.shape[1]
    N = data.shape[-1]
    if scales.dtype == jnp.float16:
        scales = jax.lax.bitcast_convert_type(scales, jnp.int16)
    bn = _pick_bn(N)
    bk = _pick_bk(D, bn, kind)
    denom = 2 if kind in ("q4", "q4g") else 1
    grid = (pl.cdiv(N, bn), D // bk)
    kernel = functools.partial(
        _norm_qkv_kernel, kind=kind, compute_dtype=x.dtype, bk=bk,
        eps=eps, inside=inside, dot_q=_pick_dot_q(bm),
    )
    # nw is the [L, 1, D] *stacked* norm table — the layer is selected
    # by the prefetched scalar through a None leading block dim (the
    # same idiom as the weights), so no per-layer XLA dynamic-slice
    # feeds the call (a scan-sliced [D] row costs ~1 fusion op per
    # layer per token). Mosaic requires the block's last two dims to
    # equal the array's, hence the [L, 1, D] shape rather than [L, D].
    # A caller passing one [D] row with a nonzero li clamps to row 0
    # (an out-of-bounds block index is a device fault when compiled,
    # though interpret mode happens to tolerate it).
    nw_rows = nw.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda n, k, li: (0, 0)),
            pl.BlockSpec(
                (None, 1, D),
                lambda n, k, li: (jnp.minimum(li[0], nw_rows - 1), 0, 0),
            ),
            pl.BlockSpec((None, bk // denom, bn),
                         lambda n, k, li: (li[0], k, n)),
            pl.BlockSpec((None, bk // BLOCK_SIZE, bn),
                         lambda n, k, li: (li[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, k, li: (0, n)),
        scratch_shapes=[pltpu.VMEM((bm, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * D * N,
            bytes_accessed=(data.size + 2 * scales.size) // data.shape[0],
            transcendentals=0,
        ),
        interpret=interpret,
    )(li, x, nw, data, scales)


def _out_res_kernel(
    li_ref, x_ref, r_ref, w_ref, s_ref, o_ref,
    *, kind: str, compute_dtype, bk: int, dot_q,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = r_ref[:].astype(jnp.float32)

    xb = x_ref[:, pl.ds(k * bk, bk)]
    o_ref[:] += dot_q(xb, w_ref[:], _load_scales(s_ref), kind,
                      compute_dtype)


@functools.partial(jax.jit, static_argnames=("kind", "bm", "interpret"))
def _out_res(x, res, data, scales, li, kind, bm, interpret):
    K = x.shape[1]
    N = data.shape[-1]
    if scales.dtype == jnp.float16:
        scales = jax.lax.bitcast_convert_type(scales, jnp.int16)
    bn = _pick_bn(N)
    bk = _pick_bk(K, bn, kind)
    denom = 2 if kind in ("q4", "q4g") else 1
    grid = (pl.cdiv(N, bn), K // bk)
    kernel = functools.partial(
        _out_res_kernel, kind=kind, compute_dtype=x.dtype, bk=bk,
        dot_q=_pick_dot_q(bm),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda n, k, li: (0, 0)),
            pl.BlockSpec((bm, bn), lambda n, k, li: (0, n)),
            pl.BlockSpec((None, bk // denom, bn),
                         lambda n, k, li: (li[0], k, n)),
            pl.BlockSpec((None, bk // BLOCK_SIZE, bn),
                         lambda n, k, li: (li[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, k, li: (0, n)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * K * N,
            bytes_accessed=(data.size + 2 * scales.size) // data.shape[0],
            transcendentals=0,
        ),
        interpret=interpret,
    )(li, x, res, data, scales)


def decode_fused_eligible(cfg, lp, M: int, tp_axis, aq8: bool,
                          layer) -> bool:
    """The fused decode-layer path: quantized kn weights, latency or
    serving M (blockdot <= 8, tile-dequant <= 32), no TP collectives
    splitting the residual, layer-stacked params."""
    if M > _FUSED_M or tp_axis is not None or aq8 or layer is None:
        return False
    for name in ("wqkv", "wo", "w_gateup", "w_down"):
        w = lp.get(name)
        if not (isinstance(w, QTensor) and w.layout == "kn"):
            return False
    return cfg.n_embd <= 2048


def _prep(x: jnp.ndarray):
    B, T, D = x.shape
    M = B * T
    x2 = x.reshape(M, D)
    bm = _SMALL_M if M <= _SMALL_M else -(-M // 8) * 8
    if M < bm:
        x2 = jnp.pad(x2, ((0, bm - M), (0, 0)))
    return x2, M


def fused_norm_qkv(
    x: jnp.ndarray,  # [B, T, D] UNNORMED hidden, compute dtype
    norm_w: jnp.ndarray,  # [L, D] stacked (or [D] single-layer) f32
    w: QTensor,  # stacked [L, ...] kn
    li: jnp.ndarray,
    eps: float,
    inside: bool,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """rms_norm(x) @ dequant(wqkv) -> [B, T, N] in x.dtype, one kernel.

    A stacked [L, D] norm_w is layer-indexed inside the kernel via the
    prefetched scalar (no per-layer XLA slice)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, D = x.shape
    x2, M = _prep(x)
    nw = norm_w.astype(jnp.float32)
    nw = nw.reshape(-1, 1, D)  # [L, 1, D]; single-layer [D] -> [1, 1, D]
    out = _norm_qkv(
        x2, nw, w.data, w.scales,
        jnp.reshape(li, (1,)).astype(jnp.int32), w.kind, float(eps),
        bool(inside), x2.shape[0], interpret,
    )
    return out[:M].reshape(B, T, -1).astype(x.dtype)


def fused_out_residual(
    attn: jnp.ndarray,  # [B, T, D] attention output, compute dtype
    residual: jnp.ndarray,  # [B, T, D] the block input x
    w: QTensor,  # stacked wo, kn
    li: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """residual + attn @ dequant(wo) -> [B, T, D] in residual.dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, D = residual.shape
    a2, M = _prep(attn)
    r2, _ = _prep(residual)
    out = _out_res(
        a2, r2, w.data, w.scales,
        jnp.reshape(li, (1,)).astype(jnp.int32), w.kind,
        a2.shape[0], interpret,
    )
    return out[:M].reshape(B, T, D).astype(residual.dtype)
