"""Block-wise Q8_0 / Q4_0 weight quantization codec.

Capability parity with the reference's quantization formats
(/root/reference/gten/quants.h:17-31 and the offline quantizer
/root/reference/tinyllama_to_gten.py:24-91), re-designed for TPU:

* Q8_0: per-block-of-32 fp16 scale ``delta = absmax/127``, int8 values
  ``q = round(x/delta)``.
* Q4_0: per-block-of-32 fp16 scale ``delta = absmax/7``, values
  ``q = round(x/delta) + 7`` in [0, 14], two values per byte.

Storage layout differs from the reference on purpose.  gten interleaves
[fp16 delta | 32 int8] block structs in memory, which is hostile to TPU
vector loads.  Here a quantized 2-D weight ``[d_out, d_in]`` is a pair of
dense planes:

* ``data``: int8 ``[d_out, d_in]`` (q8) or uint8 ``[d_out, d_in//2]`` (q4)
* ``scales``: float32 ``[d_out, d_in//32]`` (exactly the fp16 delta values,
  upcast — fp16→fp32 is exact, so dequantized values match gten bit-for-bit)

Q4 nibble packing is *group-planar*: rows are split into groups of
``q4_group_size(d_in)`` (<= 512) elements; within a group, byte ``j`` holds
element ``j`` in its high nibble and element ``j + G//2`` in its low
nibble. Unpacking a group is two full-width vector ops and one
concatenate — no lane interleaving on the VPU — and a matmul kernel that
tiles the contraction dimension at multiples of G gets self-contained
tiles (both nibble planes and their scales live inside the tile). (gten
instead packs per half-*block* of 16, quants.h:78-90;
``gten_q4_pack``/``gten_q4_unpack`` below convert between the layouts for
checkpoint I/O.)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_SIZE = 32  # gten/quants.h:13 (globs::q8_block_size)
Q8_MAX = 127.0  # tinyllama_to_gten.py:38
Q4_MAX = 7.0  # tinyllama_to_gten.py:69
Q4_OFFSET = 7  # tinyllama_to_gten.py:79

#: Scale-block size of the TPU-native "q4g" serving format. Q4_0's
#: per-32 scales force depth-32 MXU dots in the decode kernel (each
#: pass at 25% depth utilization — the measured q4 floor, PERF.md);
#: one scale per 128 K-rows makes each nibble plane of a pack group a
#: single depth-128 dot at full MXU depth (kbench: the blockdot's
#: compute overhead over the pure-stream floor halves). No reference
#: counterpart — this is a deployment format (converted offline from
#: fp16/Q4_0 checkpoints), quality cost quantified in tools/eval_ppl.py.
Q4G_BLOCK = 128


def block_size(kind: str) -> int:
    """Scale-block length along K for a quant kind."""
    return Q4G_BLOCK if kind == "q4g" else BLOCK_SIZE


def q4g_pack_group(d_in: int) -> int:
    """q4g planar packing period along K: 256 where possible, so each
    nibble plane (group//2 = 128 rows) spans exactly one scale block
    and feeds one full-depth MXU dot; 128 for small test dims (both
    planes then share block g's scale). Every kernel K-tile is either
    a multiple of 256 or the whole K (qmatmul._pick_bk), so tiles
    re-derive the same group from their own row count."""
    if d_in % 256 == 0:
        return 256
    if d_in % 128 == 0:
        return 128
    raise ValueError(f"q4g requires d_in % 128 == 0, got {d_in}")

#: Runtime storage dtype for the per-block scales. gten stores fp16
#: deltas, so float16 holds the exact values at half the HBM stream
#: bytes of f32 (scales are 20% of a q4 weight stream); kernels upcast
#: in-register. Set to jnp.float32 if a backend lacks f16 VMEM support.
SCALE_DTYPE = jnp.float16


def _kernel_scales(scales: jax.Array) -> jax.Array:
    """Scales in the "kn" (kernel) layout carry fp16 BIT PATTERNS in an
    int16 array: Mosaic rejects f16 refs outright, and bitcasting at the
    kernel call boundary would materialize a copy of the whole stacked
    scale plane on every jitted step. The matmul kernel reconstructs f32
    in-register (ops/pallas/qmatmul.py _load_scales)."""
    if scales.dtype == jnp.float16:
        return jax.lax.bitcast_convert_type(scales, jnp.int16)
    return scales


def _logical_scales(scales: jax.Array) -> jax.Array:
    """Inverse of _kernel_scales: int16 bit patterns -> f32 values."""
    if scales.dtype == jnp.int16:
        scales = jax.lax.bitcast_convert_type(scales, jnp.float16)
    return scales.astype(jnp.float32)


#: q4 "kn" packing group: nibble planes interleave in sublane groups of
#: KN_GROUP K-rows (32 bytes hold rows [g, g+32) high / [g+32, g+64) low).
#: 64 keeps tensor-parallel K-sharding legal whenever K/tp % 64 == 0 and
#: lets the matmul kernel pick any K-tile that is a multiple of 64.
KN_GROUP = 64


@dataclass(frozen=True)
class QTensor:
    """A block-quantized tensor: packed integer data + per-block scales.

    Two storage layouts for a logical weight of shape [..., d_out, d_in]
    (a.k.a. [N, K]):

    layout="nk" (row-major; embedding gathers, checkpoint I/O):
      * kind="q8": data int8 [..., N, K]
      * kind="q4": data int8 [..., N, K//2] (group-planar nibble packed
        along K within each row; int8 rather than uint8 because Mosaic/TPU
        has no uint8 casts — nibble extraction uses arithmetic shift+mask)
      * scales: float32 [..., N, K//32]

    layout="kn" (K-major; the matmul hot path, ops/pallas/qmatmul.py):
      * kind="q8": data int8 [..., K, N]
      * kind="q4": data int8 [..., K//2, N]: packed row g*32+j holds
        K-row g*64+j in its high nibble and K-row g*64+32+j in its low
        nibble (KN_GROUP sublane groups), byte stored XOR 0x80 so
        ``byte & 0xF0`` read signed equals ``16*(v_hi-8)`` (see
        _pack_q4_kn)
      * scales: float32 [..., K//32, N]
      With N in lanes, in-kernel scale expansion is a sublane broadcast
      and nibble unpacking a sublane concat — no lane shuffles anywhere.

    Leading axes (e.g. a stacked layer axis) are allowed and preserved.
    """

    data: jax.Array
    scales: jax.Array
    kind: str
    layout: str = "nk"

    @property
    def shape(self) -> tuple[int, ...]:
        """Logical [..., d_out, d_in] regardless of layout."""
        if self.layout == "kn":
            # kn scales are always [K//32, N] (q4g stores each group
            # scale duplicated 4x so every tile/shard path matches q4)
            d_in = self.scales.shape[-2] * BLOCK_SIZE
            return (*self.data.shape[:-2], self.data.shape[-1], d_in)
        d_in = self.scales.shape[-1] * block_size(self.kind)
        return (*self.data.shape[:-1], d_in)


jax.tree_util.register_dataclass(
    QTensor, data_fields=("data", "scales"), meta_fields=("kind", "layout")
)


# -----------------------------------------------------------------------------
# Quantize (jnp; used by the converter and tests)
# -----------------------------------------------------------------------------


def _block_scales(x: jnp.ndarray, qmax: float) -> jnp.ndarray:
    """Per-block fp16 deltas, computed in f32 like tinyllama_to_gten.py:37-39."""
    blocks = x.reshape(*x.shape[:-1], x.shape[-1] // BLOCK_SIZE, BLOCK_SIZE)
    absmax = jnp.max(jnp.abs(blocks), axis=-1)
    return (absmax / qmax).astype(jnp.float32)


def _safe_inv(deltas: jnp.ndarray) -> jnp.ndarray:
    """1/delta with 0 -> 0 (tinyllama_to_gten.py:42-44)."""
    return jnp.where(deltas != 0, 1.0 / jnp.where(deltas != 0, deltas, 1.0), 0.0)


def quantize_q8(w: jax.Array, layout: str = "nk") -> QTensor:
    """Quantize along the last axis into block-32 int8 + fp16-exact scales."""
    assert w.shape[-1] % BLOCK_SIZE == 0, w.shape
    w = w.astype(jnp.float32)
    deltas = _block_scales(w, Q8_MAX)
    # Store scale at fp16 precision (gten stores fp16 deltas) but keep f32
    # runtime dtype so TPU dequant is native; fp16->f32 is exact.
    deltas_f16 = deltas.astype(jnp.float16)
    inv = _safe_inv(deltas)  # quantize with the f32 delta, like the reference
    blocks = w.reshape(*w.shape[:-1], -1, BLOCK_SIZE)
    q = jnp.round(blocks * inv[..., None]).astype(jnp.int8)
    qt = QTensor(
        data=q.reshape(w.shape), scales=deltas_f16.astype(SCALE_DTYPE),
        kind="q8",
    )
    return to_kn(qt) if layout == "kn" else qt


def q4_group_size(d_in: int) -> int:
    """Largest packing group (<= 512) dividing d_in; 512 is the kernel's
    K-tile quantum (ops/pallas/qmatmul.py)."""
    for g in (512, 256, 128, 64):
        if d_in % g == 0:
            return g
    raise ValueError(f"q4 requires d_in % 64 == 0, got {d_in}")


def quantize_q4(w: jax.Array, layout: str = "nk") -> QTensor:
    """Quantize along the last axis into block-32 4-bit (+7 offset), packed
    group-planar: within each group of G, byte j = (q[j] << 4) | q[j+G//2]."""
    d_in = w.shape[-1]
    G = q4_group_size(d_in)
    w = w.astype(jnp.float32)
    deltas = _block_scales(w, Q4_MAX)
    deltas_f16 = deltas.astype(jnp.float16)
    inv = _safe_inv(deltas)
    blocks = w.reshape(*w.shape[:-1], -1, BLOCK_SIZE)
    q = jnp.round(blocks * inv[..., None]) + Q4_OFFSET  # [0, 14]
    q = jnp.clip(q, 0, 14).astype(jnp.uint8)
    scales = deltas_f16.astype(SCALE_DTYPE)
    if layout == "kn":
        return QTensor(
            data=_pack_q4_kn(q.reshape(w.shape)),
            scales=_kernel_scales(jnp.swapaxes(scales, -1, -2)),
            kind="q4",
            layout="kn",
        )
    return QTensor(data=pack_q4_nk(q.reshape(w.shape)), scales=scales,
                   kind="q4")


def pack_q4_nk(vals: jax.Array, group: int | None = None) -> jax.Array:
    """Unpacked offset-7 uint8 values [.., d_in] -> "nk" group-planar
    packed int8 [.., d_in//2] (jnp; numpy twin: tpu_q4_pack)."""
    d_in = vals.shape[-1]
    G = group or q4_group_size(d_in)
    groups = vals.astype(jnp.uint8).reshape(*vals.shape[:-1], d_in // G, G)
    hi = groups[..., : G // 2]
    lo = groups[..., G // 2 :]
    packed = ((hi << 4) | (lo & 0x0F)).reshape(*vals.shape[:-1], d_in // 2)
    return jax.lax.bitcast_convert_type(packed, jnp.int8)


def quantize_q4g(w: jax.Array, layout: str = "nk") -> QTensor:
    """TPU-native "q4g": 4-bit offset-7 values with ONE fp16 scale per
    Q4G_BLOCK=128 elements (GPTQ/AWQ-style group size). Q4_0's per-32
    scales force depth-32 integer dots in the decode kernel (4 MXU
    passes per 128 K-rows, each at 25% depth utilization — the measured
    q4 floor, PERF.md); one scale per 128 lets both nibble planes of a
    kn packing group feed a single depth-128 dot at full MXU depth.

    The "nk" layout stores the true [.., N, K//128] scale plane; "kn"
    stores each group scale duplicated 4x into the same [K//32, N]
    plane q4 uses, so tiles, shardings, and loaders are layout-identical
    to q4 (the duplicated rows cost 5.6% model bytes over the ideal —
    accepted for zero new-layout risk)."""
    d_in = w.shape[-1]
    pg = q4g_pack_group(d_in)
    w = w.astype(jnp.float32)
    blocks = w.reshape(*w.shape[:-1], -1, Q4G_BLOCK)
    deltas = (jnp.max(jnp.abs(blocks), axis=-1) / Q4_MAX).astype(jnp.float32)
    deltas_f16 = deltas.astype(jnp.float16)
    inv = _safe_inv(deltas)
    q = jnp.round(blocks * inv[..., None]) + Q4_OFFSET  # [0, 14]
    q = jnp.clip(q, 0, 14).astype(jnp.uint8).reshape(w.shape)
    scales = deltas_f16.astype(SCALE_DTYPE)
    if layout == "kn":
        dup = jnp.repeat(scales, Q4G_BLOCK // BLOCK_SIZE, axis=-1)
        return QTensor(
            data=_pack_q4_kn(q, group=pg),
            scales=_kernel_scales(jnp.swapaxes(dup, -1, -2)),
            kind="q4g",
            layout="kn",
        )
    return QTensor(
        data=pack_q4_nk(q, group=pg), scales=scales, kind="q4g"
    )


def quantize(w: jax.Array, kind: str, layout: str = "nk") -> QTensor:
    if kind == "q8":
        return quantize_q8(w, layout)
    if kind == "q4":
        return quantize_q4(w, layout)
    if kind == "q4g":
        return quantize_q4g(w, layout)
    raise ValueError(f"unknown quant kind: {kind}")


def _pack_q4_kn(vals: jax.Array, group: int = KN_GROUP) -> jax.Array:
    """Unpacked offset-7 uint8 values [.., N, K] -> "kn" packed int8
    [.., K//2, N] (KN_GROUP sublane groups: packed row g*32+j = K-row
    g*64+j high nibble | K-row g*64+32+j low nibble).

    The stored byte is XOR 0x80 ("biased-hi"): with the high nibble
    stored as ``v_hi ^ 8``, the kernel reads ``byte & 0xF0`` as a SIGNED
    int8 and gets exactly ``16 * (v_hi - 8)`` — linear in the nibble, so
    unpacking is one AND per plane with no i32 cast, no shift, and the
    x16/offset algebra folds into the post-dot block scales
    (ops/pallas/qmatmul.py). The low nibble is untouched by the XOR.

    ``group`` is the planar packing period along K: KN_GROUP=64 for
    "q4" (2 scale blocks per group), Q4G_BLOCK=128 for "q4g" (the whole
    group shares one scale, enabling single depth-128 dots)."""
    K = vals.shape[-1]
    assert K % group == 0, (vals.shape, group)
    vT = jnp.swapaxes(vals.astype(jnp.uint8), -1, -2)  # [.., K, N]
    N = vT.shape[-1]
    g = vT.reshape(*vT.shape[:-2], K // group, group, N)
    hi = g[..., : group // 2, :]
    lo = g[..., group // 2 :, :]
    packed = (((hi << 4) | (lo & 0x0F)) ^ 0x80).reshape(
        *vT.shape[:-2], K // 2, N
    )
    return jax.lax.bitcast_convert_type(packed, jnp.int8)


def unpack_q4_kn(data: jax.Array, group: int = KN_GROUP) -> jax.Array:
    """"kn" packed int8 [.., K//2, N] -> int8-valued [.., K, N] still
    carrying the +7 offset (inverse of _pack_q4_kn, incl. the biased-hi
    XOR 0x80)."""
    K = data.shape[-2] * 2
    N = data.shape[-1]
    data = jnp.bitwise_xor(data, jnp.int8(-128))  # undo the hi-nibble bias
    grouped = data.reshape(*data.shape[:-2], K // group, group // 2, N)
    hi = ((grouped >> 4) & 0x0F).astype(jnp.int8)
    lo = (grouped & 0x0F).astype(jnp.int8)
    return jnp.concatenate([hi, lo], axis=-2).reshape(*data.shape[:-2], K, N)


def to_kn(qt: QTensor) -> QTensor:
    """Convert an "nk" QTensor to the "kn" matmul layout (values unchanged;
    scales become int16 fp16-bit-patterns — see _kernel_scales)."""
    if qt.layout == "kn":
        return qt
    scales = _kernel_scales(jnp.swapaxes(qt.scales, -1, -2))
    if qt.kind == "q8":
        return QTensor(
            data=jnp.swapaxes(qt.data, -1, -2), scales=scales,
            kind="q8", layout="kn",
        )
    if qt.kind == "q4g":
        pg = q4g_pack_group(qt.data.shape[-1] * 2)
        vals = jax.lax.bitcast_convert_type(
            unpack_q4(qt.data, group=pg), jnp.uint8)
        dup = _kernel_scales(jnp.repeat(
            jnp.swapaxes(qt.scales, -1, -2), Q4G_BLOCK // BLOCK_SIZE,
            axis=-2))
        return QTensor(data=_pack_q4_kn(vals, group=pg),
                       scales=dup, kind="q4g", layout="kn")
    vals = jax.lax.bitcast_convert_type(unpack_q4(qt.data), jnp.uint8)
    return QTensor(data=_pack_q4_kn(vals), scales=scales, kind="q4", layout="kn")


# -----------------------------------------------------------------------------
# Dequantize (jnp; the XLA fallback path — the hot path lives in ops/pallas)
# -----------------------------------------------------------------------------


def unpack_q4(data: jax.Array, group: int | None = None) -> jax.Array:
    """int8 packed [..., d_in//2] -> int8-valued [..., d_in] still carrying
    the +7 offset (inverse of the group-planar packing). Arithmetic shift +
    mask works for both nibbles regardless of the sign bit."""
    d_in = data.shape[-1] * 2
    G = group or q4_group_size(d_in)
    grouped = data.reshape(*data.shape[:-1], d_in // G, G // 2)
    hi = ((grouped >> 4) & 0x0F).astype(jnp.int8)
    lo = (grouped & 0x0F).astype(jnp.int8)
    return jnp.concatenate([hi, lo], axis=-1).reshape(*data.shape[:-1], d_in)


def expand_scales(scales: jax.Array) -> jax.Array:
    """[..., n_blocks] -> [..., n_blocks*32] by repeating each scale 32x."""
    return jnp.repeat(scales, BLOCK_SIZE, axis=-1)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Dense values in storage orientation: [.., N, K] for "nk",
    [.., K, N] for "kn"."""
    if qt.layout == "kn":
        if qt.kind == "q8":
            vals = qt.data.astype(jnp.float32)
        elif qt.kind == "q4g":
            vals = unpack_q4_kn(
                qt.data, group=q4g_pack_group(qt.data.shape[-2] * 2)
            ).astype(jnp.float32) - Q4_OFFSET
        else:
            vals = unpack_q4_kn(qt.data).astype(jnp.float32) - Q4_OFFSET
        # kn scales are [K//32, N] for every kind (q4g rows duplicated)
        sexp = jnp.repeat(_logical_scales(qt.scales), BLOCK_SIZE, axis=-2)
        return (vals * sexp).astype(dtype)
    if qt.kind == "q8":
        vals = qt.data.astype(jnp.float32)
    elif qt.kind == "q4":
        vals = unpack_q4(qt.data).astype(jnp.float32) - Q4_OFFSET
    elif qt.kind == "q4g":
        vals = unpack_q4(
            qt.data, group=q4g_pack_group(qt.data.shape[-1] * 2)
        ).astype(jnp.float32) - Q4_OFFSET
    else:
        raise ValueError(qt.kind)
    return (vals * jnp.repeat(
        _logical_scales(qt.scales), block_size(qt.kind), axis=-1,
    )).astype(dtype)


# -----------------------------------------------------------------------------
# NumPy reference implementations (oracles for tests + offline converter)
# -----------------------------------------------------------------------------


def np_quantize_q8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (int8 data [d_out, d_in], f16 deltas [d_out, nb]).

    Bit-exact re-derivation of tinyllama_to_gten.py:24-51 (absmax/127 in f32,
    round-half-even, store f16 delta)."""
    d_in = w.shape[-1]
    assert d_in % BLOCK_SIZE == 0
    blocks = w.astype(np.float32).reshape(*w.shape[:-1], -1, BLOCK_SIZE)
    deltas = np.abs(blocks).max(axis=-1) / np.float32(Q8_MAX)
    inv = np.where(deltas != 0, 1.0 / np.where(deltas != 0, deltas, 1), 0).astype(
        np.float32
    )
    q = np.round(blocks * inv[..., None]).astype(np.int8)
    return q.reshape(w.shape), deltas.astype(np.float16)


def np_quantize_q4(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (uint8 offset-7 values [d_out, d_in] UNPACKED, f16 deltas)."""
    d_in = w.shape[-1]
    assert d_in % BLOCK_SIZE == 0
    blocks = w.astype(np.float32).reshape(*w.shape[:-1], -1, BLOCK_SIZE)
    deltas = np.abs(blocks).max(axis=-1) / np.float32(Q4_MAX)
    inv = np.where(deltas != 0, 1.0 / np.where(deltas != 0, deltas, 1), 0).astype(
        np.float32
    )
    q = (np.round(blocks * inv[..., None]) + Q4_OFFSET).astype(np.uint8)
    assert q.max(initial=0) <= 14
    return q.reshape(w.shape), deltas.astype(np.float16)


def np_dequantize_q8(data: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    d = np.repeat(deltas.astype(np.float32), BLOCK_SIZE, axis=-1)
    return data.astype(np.float32) * d


def np_dequantize_q4_unpacked(vals: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    d = np.repeat(deltas.astype(np.float32), BLOCK_SIZE, axis=-1)
    return (vals.astype(np.float32) - Q4_OFFSET) * d


# -----------------------------------------------------------------------------
# gten <-> TPU layout converters (numpy; checkpoint I/O only)
# -----------------------------------------------------------------------------


def gten_q4_pack(vals: np.ndarray) -> np.ndarray:
    """Pack unpacked offset-7 values [.., d_in] into gten's per-half-block
    layout: within each 32-block, byte j = (q[j] << 4) | q[j+16]
    (tinyllama_to_gten.py:83-89)."""
    blocks = vals.reshape(*vals.shape[:-1], -1, BLOCK_SIZE)
    t0 = blocks[..., : BLOCK_SIZE // 2]
    t1 = blocks[..., BLOCK_SIZE // 2 :]
    packed = (t0 << 4) | (t1 & 0x0F)
    return packed.reshape(*vals.shape[:-1], vals.shape[-1] // 2).astype(np.uint8)


def gten_q4_unpack(packed: np.ndarray) -> np.ndarray:
    """Inverse of gten_q4_pack -> unpacked offset-7 values [.., d_in]."""
    half = packed.reshape(*packed.shape[:-1], -1, BLOCK_SIZE // 2)
    t0 = (half >> 4).astype(np.uint8)
    t1 = (half & 0x0F).astype(np.uint8)
    blocks = np.concatenate([t0, t1], axis=-1)  # [.., nb, 32]
    return blocks.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def tpu_q4_pack(vals: np.ndarray) -> np.ndarray:
    """Pack unpacked offset-7 values into the TPU group-planar int8 layout."""
    d_in = vals.shape[-1]
    G = q4_group_size(d_in)
    groups = vals.astype(np.uint8).reshape(*vals.shape[:-1], d_in // G, G)
    hi = groups[..., : G // 2]
    lo = groups[..., G // 2 :]
    return ((hi << 4) | (lo & 0x0F)).reshape(
        *vals.shape[:-1], d_in // 2
    ).astype(np.uint8).view(np.int8)


def tpu_q4_unpack(packed: np.ndarray) -> np.ndarray:
    d_in = packed.shape[-1] * 2
    G = q4_group_size(d_in)
    u8 = packed.view(np.uint8)
    grouped = u8.reshape(*packed.shape[:-1], d_in // G, G // 2)
    hi = (grouped >> 4).astype(np.uint8)
    lo = (grouped & 0x0F).astype(np.uint8)
    return np.concatenate([hi, lo], axis=-1).reshape(*packed.shape[:-1], d_in)
