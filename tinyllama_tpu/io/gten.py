"""`.gten` checkpoint format reader/writer.

Format parity with the reference (writer: /root/reference/
tinyllama_to_gten.py:94-201; loader: /root/reference/tinyllama.cpp:301-392):

* ``int64`` magic ``0x454c49464e455447`` (ASCII "GTENFILE"),
* per weight, a *layer header* ``[i32 name_len][name]`` followed by a
  *weight record* ``[i32 name_len][name][i32 payload_bytes][payload]``,
* strict fixed order: embed -> per block {q,k,v,o,gate,up,down,attn_norm,
  ffn_norm} -> final norm -> lm_head; norm weights are always fp16,
* payloads: fp16 = flat little-endian f16; q8 = per 32-block structs
  ``[f16 delta][32 x i8]``; q4 = ``[f16 delta][16 bytes]`` with gten's
  half-block nibble packing.

This module reads/writes those exact bytes but converts to/from the TPU
runtime layout (dense scale planes, half-row q4 packing — quant/codec.py)
at the file boundary.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from tinyllama_tpu.config import ModelConfig
from tinyllama_tpu.quant import codec

GTEN_MAGIC = 0x454C49464E455447  # "GTENFILE" little-endian
FILE_DTYPES = ("fp16", "q8", "q4")

_Q8_BLOCK = np.dtype([("delta", "<f2"), ("q", "i1", (codec.BLOCK_SIZE,))])
_Q4_BLOCK = np.dtype([("delta", "<f2"), ("q", "u1", (codec.BLOCK_SIZE // 2,))])

#: weight order within one transformer block (tinyllama.cpp:345-385) as
#: (HF/file name suffix, runtime layer-param name, is_norm)
_BLOCK_WEIGHTS = [
    ("self_attn.q_proj.weight", "wq", False),
    ("self_attn.k_proj.weight", "wk", False),
    ("self_attn.v_proj.weight", "wv", False),
    ("self_attn.o_proj.weight", "wo", False),
    ("mlp.gate_proj.weight", "w_gate", False),
    ("mlp.up_proj.weight", "w_up", False),
    ("mlp.down_proj.weight", "w_down", False),
    ("input_layernorm.weight", "attn_norm", True),
    ("post_attention_layernorm.weight", "ffn_norm", True),
]


def weight_shapes(cfg: ModelConfig) -> dict[str, tuple[int, ...]]:
    """Logical [d_out, d_in] / [d] shape of every runtime parameter."""
    shapes = {
        "embed": (cfg.n_vocab, cfg.n_embd),
        "norm": (cfg.n_embd,),
        "lm_head": (cfg.n_vocab, cfg.n_embd),
        "wq": (cfg.n_embd, cfg.n_embd),
        "wk": (cfg.kv_dim, cfg.n_embd),
        "wv": (cfg.kv_dim, cfg.n_embd),
        "wo": (cfg.n_embd, cfg.n_embd),
        "w_gate": (cfg.n_ffn, cfg.n_embd),
        "w_up": (cfg.n_ffn, cfg.n_embd),
        "w_down": (cfg.n_embd, cfg.n_ffn),
        "attn_norm": (cfg.n_embd,),
        "ffn_norm": (cfg.n_embd,),
    }
    return shapes


# -----------------------------------------------------------------------------
# Writing
# -----------------------------------------------------------------------------


def _encode_payload(w: np.ndarray, dtype: str) -> bytes:
    if dtype == "fp16":
        return np.ascontiguousarray(w.astype(np.float16)).tobytes()
    w2 = w.reshape(w.shape[0], -1) if w.ndim == 2 else w.reshape(1, -1)
    if dtype == "q8":
        q, deltas = codec.np_quantize_q8(w2)
        rec = np.empty(deltas.size, _Q8_BLOCK)
        rec["delta"] = deltas.reshape(-1)
        rec["q"] = q.reshape(-1, codec.BLOCK_SIZE)
        return rec.tobytes()
    if dtype == "q4":
        vals, deltas = codec.np_quantize_q4(w2)
        packed = codec.gten_q4_pack(vals)
        rec = np.empty(deltas.size, _Q4_BLOCK)
        rec["delta"] = deltas.reshape(-1)
        rec["q"] = packed.reshape(-1, codec.BLOCK_SIZE // 2)
        return rec.tobytes()
    raise ValueError(dtype)


def _write_record(f, name: str, w: np.ndarray, dtype: str) -> None:
    nb = name.encode()
    # layer header then weight record, both carrying the name
    # (tinyllama_to_gten.py:94-101 writes the name twice)
    f.write(struct.pack("<i", len(nb)))
    f.write(nb)
    f.write(struct.pack("<i", len(nb)))
    f.write(nb)
    payload = _encode_payload(w, dtype)
    f.write(struct.pack("<i", len(payload)))
    f.write(payload)


def write_gten(
    path: str | Path,
    cfg: ModelConfig,
    hf_weights: dict[str, np.ndarray],
    dtype: str,
) -> None:
    """Write HF-named f32/f16 weights as a .gten checkpoint.

    `hf_weights` maps HF parameter names (model.embed_tokens.weight, ...)
    to numpy arrays in [d_out, d_in] layout.
    """
    assert dtype in FILE_DTYPES, dtype
    with open(path, "wb") as f:
        f.write(struct.pack("<q", GTEN_MAGIC))
        _write_record(
            f, "model.embed_tokens.weight", hf_weights["model.embed_tokens.weight"],
            dtype,
        )
        for i in range(cfg.n_layers):
            for suffix, _, is_norm in _BLOCK_WEIGHTS:
                name = f"model.layers.{i}.{suffix}"
                _write_record(
                    f, name, hf_weights[name], "fp16" if is_norm else dtype
                )
        _write_record(f, "model.norm.weight", hf_weights["model.norm.weight"], "fp16")
        _write_record(f, "lm_head.weight", hf_weights["lm_head.weight"], dtype)


# -----------------------------------------------------------------------------
# Reading
# -----------------------------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def i32(self) -> int:
        (v,) = struct.unpack_from("<i", self.data, self.off)
        self.off += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from("<q", self.data, self.off)
        self.off += 8
        return v

    def name(self) -> str:
        n = self.i32()
        s = self.data[self.off : self.off + n].decode()
        self.off += n
        return s

    def payload(self) -> memoryview:
        n = self.i32()
        mv = memoryview(self.data)[self.off : self.off + n]
        self.off += n
        return mv


def _decode_payload(mv: memoryview, shape: tuple[int, ...], dtype: str):
    """-> np.ndarray (fp16/norms) or codec arrays in TPU layout.

    Uses the C++ native decoder (tinyllama_tpu/native.py) when available —
    GB-scale struct deinterleaving is ~10x faster there — with a numpy
    structured-array fallback producing identical bytes.
    """
    d_out, d_in = (shape if len(shape) == 2 else (1, shape[0]))
    if dtype == "fp16":
        w = np.frombuffer(mv, np.float16).reshape(shape)
        return w
    nb = d_in // codec.BLOCK_SIZE
    if dtype == "q8":
        from tinyllama_tpu import native

        out = native.q8_deinterleave(mv, d_out * nb)
        if out is not None:
            vals, deltas = out
            return (
                vals.reshape(d_out, d_in),
                deltas.reshape(d_out, nb).astype(np.float32),
            )
        rec = np.frombuffer(mv, _Q8_BLOCK).reshape(d_out, nb)
        data = rec["q"].reshape(d_out, d_in)
        scales = rec["delta"].astype(np.float32)
        return data.copy(), scales
    if dtype == "q4":
        from tinyllama_tpu import native

        out = native.q4_gten_to_planar(
            mv, d_out, d_in, codec.q4_group_size(d_in)
        )
        if out is not None:
            packed, deltas = out
            return packed, deltas.astype(np.float32)
        rec = np.frombuffer(mv, _Q4_BLOCK).reshape(d_out, nb)
        gten_packed = rec["q"].reshape(d_out, d_in // 2)
        vals = codec.gten_q4_unpack(gten_packed)
        data = codec.tpu_q4_pack(vals)
        scales = rec["delta"].astype(np.float32)
        return data, scales
    raise ValueError(dtype)


def sniff_dtype(path: str | Path, cfg: ModelConfig) -> str:
    """Infer the file dtype from the embed record's payload size."""
    with open(path, "rb") as f:
        head = f.read(8 + 4 + 256)
    r = _Reader(head)
    magic = r.i64()
    if magic != GTEN_MAGIC:
        raise ValueError(f"bad magic: {magic:#x} (expected {GTEN_MAGIC:#x})")
    name = r.name()
    r.name()  # duplicate
    with open(path, "rb") as f:
        f.seek(r.off)
        (payload_bytes,) = struct.unpack("<i", f.read(4))
    numel = cfg.n_vocab * cfg.n_embd
    per_block = {
        "fp16": codec.BLOCK_SIZE * 2,
        "q8": 2 + codec.BLOCK_SIZE,
        "q4": 2 + codec.BLOCK_SIZE // 2,
    }
    for dt, blk in per_block.items():
        if payload_bytes == numel // codec.BLOCK_SIZE * blk:
            return dt
    raise ValueError(f"cannot infer dtype from payload size {payload_bytes} of {name}")


def read_gten_records(path: str | Path, cfg: ModelConfig):
    """Parse a .gten file's structure WITHOUT decoding payloads.

    -> (file_dtype, {runtime_name or runtime_name.i:
        (payload memoryview, logical shape, payload dtype str)})

    The memoryviews are zero-copy windows into the file bytes — the
    device-decode loader (io/checkpoint.py) ships them to the chip raw
    and deinterleaves the block structs with jnp ops there, because on
    this class of host a single numpy pass over the payloads costs more
    than the whole HBM-side decode.
    """
    data = Path(path).read_bytes()
    r = _Reader(data)
    magic = r.i64()
    if magic != GTEN_MAGIC:
        raise ValueError(f"bad magic: {magic:#x}")
    shapes = weight_shapes(cfg)
    file_dtype = sniff_dtype(path, cfg)

    out: dict[str, tuple] = {}

    def read_one(runtime_name: str, is_norm: bool, key: str | None = None):
        r.name()  # layer header
        wname = r.name()
        mv = r.payload()
        dt = "fp16" if is_norm else file_dtype
        out[key or runtime_name] = (mv, shapes[runtime_name], dt)
        return wname

    read_one("embed", False)
    for i in range(cfg.n_layers):
        for suffix, rname, is_norm in _BLOCK_WEIGHTS:
            got = read_one(rname, is_norm, key=f"{rname}.{i}")
            expect = f"model.layers.{i}.{suffix}"
            if got != expect:
                raise ValueError(f"weight order mismatch: {got} != {expect}")
    read_one("norm", True)
    read_one("lm_head", False)
    assert r.off == len(data), (r.off, len(data))
    return file_dtype, out


def read_gten(path: str | Path, cfg: ModelConfig):
    """Parse a .gten file -> (file_dtype, flat {runtime_name or
    runtime_name.i: array|/(data, scales)/} in TPU layout, numpy)."""
    data = Path(path).read_bytes()
    r = _Reader(data)
    magic = r.i64()
    if magic != GTEN_MAGIC:
        raise ValueError(f"bad magic: {magic:#x}")
    shapes = weight_shapes(cfg)
    file_dtype = sniff_dtype(path, cfg)

    out: dict[str, object] = {}

    def read_one(runtime_name: str, is_norm: bool, key: str | None = None):
        r.name()  # layer header
        wname = r.name()
        mv = r.payload()
        dt = "fp16" if is_norm else file_dtype
        decoded = _decode_payload(mv, shapes[runtime_name], dt)
        out[key or runtime_name] = decoded
        return wname

    read_one("embed", False)
    for i in range(cfg.n_layers):
        for suffix, rname, is_norm in _BLOCK_WEIGHTS:
            got = read_one(rname, is_norm, key=f"{rname}.{i}")
            expect = f"model.layers.{i}.{suffix}"
            if got != expect:
                raise ValueError(f"weight order mismatch: {got} != {expect}")
    read_one("norm", True)
    read_one("lm_head", False)
    assert r.off == len(data), (r.off, len(data))
    return file_dtype, out
