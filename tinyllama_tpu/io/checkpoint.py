"""Checkpoint loading: .gten files -> runtime parameter pytrees.

Replaces the reference's fixed-order fread loader (/root/reference/
tinyllama.cpp:301-392) with a parse + device_put pipeline that can place
every weight against a sharding spec (parallel/sharding.py) while staying
zero-copy on the host side.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tinyllama_tpu.config import DtypePolicy, ModelConfig, POLICIES
from tinyllama_tpu.io import gten
from tinyllama_tpu.models.llama import Params
from tinyllama_tpu.quant.codec import QTensor, to_kn

_LAYER_PARAMS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "attn_norm", "ffn_norm")

_FILE_TO_POLICY = {"fp16": "f16", "q8": "q8", "q4": "q4"}


def _to_jnp(decoded, kind: str, wdtype, device_put=lambda name, a: jnp.asarray(a)):
    if isinstance(decoded, tuple):  # quantized (data, scales)
        data, scales = decoded
        return QTensor(
            data=device_put("data", data), scales=device_put("scales", scales),
            kind=kind,
        )
    return device_put("w", decoded)


def load_gten_checkpoint(
    path: str | Path,
    cfg: ModelConfig,
    policy: DtypePolicy | None = None,
    device_decode: bool = True,
) -> tuple[Params, DtypePolicy]:
    """Load a .gten file into the runtime params pytree (layers stacked on a
    leading axis for lax.scan). Returns (params, effective policy).

    Norm weights (always fp16 in the file, tinyllama.cpp:380-388) become
    f32 — exact. Dense fp16 weights are stored in the policy's wdtype.

    ``device_decode`` (default) ships the raw record payloads to the
    accelerator and deinterleaves/packs them with jnp ops there; the
    numpy path (False) decodes on the host. Identical results; on this
    host the device path loads the 2.2 GB fp16 file in seconds where
    host-side numpy passes took minutes (file reads and host->device
    DMA stream at ~1.5 GB/s, but any userspace numpy pass crawls).
    """
    if device_decode:
        return _load_gten_device(path, cfg, policy)
    file_dtype, flat = gten.read_gten(path, cfg)
    if policy is None:
        policy = POLICIES[_FILE_TO_POLICY[file_dtype]]
    kind = policy.wdtype if policy.is_quantized else None
    if (file_dtype == "q8") != (policy.wdtype == "q8") or (
        (file_dtype == "q4") != (policy.wdtype == "q4")
    ):
        if file_dtype != "fp16" or policy.is_quantized:
            raise ValueError(
                f"file dtype {file_dtype} incompatible with policy {policy.wdtype}"
            )

    wdt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}.get(
        policy.wdtype
    )

    def dense(a: np.ndarray, norm: bool = False):
        return jnp.asarray(a.astype(np.float32) if norm else a, dtype=jnp.float32
                           if norm else wdt)

    def weight(decoded, kn: bool = False):
        if isinstance(decoded, tuple):
            data, scales = decoded
            from tinyllama_tpu.quant.codec import SCALE_DTYPE

            qt = QTensor(jnp.asarray(data),
                         jnp.asarray(scales.astype(np.float16), SCALE_DTYPE),
                         kind=file_dtype
                         if file_dtype in ("q8", "q4") else "q8")
            # matmul weights are re-laid-out K-major for the Pallas kernel
            # (quant/codec.py "kn"); dequantized values are unchanged.
            return to_kn(qt) if kn else qt
        return dense(decoded)

    #: runtime params fuse q/k/v and gate/up along d_out
    #: (models/llama.py _LAYER_LINEARS); block quantization is per-row, so
    #: concatenating pre-quantized rows preserves every dequantized value.
    merges = {
        "wqkv": ("wq", "wk", "wv"),
        "wo": ("wo",),
        "w_gateup": ("w_gate", "w_up"),
        "w_down": ("w_down",),
        "attn_norm": ("attn_norm",),
        "ffn_norm": ("ffn_norm",),
    }

    layers = {}
    for name, parts in merges.items():
        per_layer = [
            [flat[f"{p}.{i}"] for p in parts] for i in range(cfg.n_layers)
        ]
        L = cfg.n_layers
        if name.endswith("norm"):
            layers[name] = jnp.asarray(
                np.stack([p[0].astype(np.float32) for p in per_layer])
            )
        elif isinstance(per_layer[0][0], tuple):
            # quantized (data, scales) pairs: write each part straight
            # into its slice of ONE preallocated stacked array — a
            # concat-then-stack would copy every byte twice, which
            # dominates load time on slow hosts
            dp0 = per_layer[0]
            rows = [t[0].shape[0] for t in dp0]
            total = sum(rows)
            data = np.empty((L, total, *dp0[0][0].shape[1:]),
                            dp0[0][0].dtype)
            # runtime scale storage follows codec.SCALE_DTYPE (default
            # fp16 — the file's deltas are fp16, so that cast is exact;
            # the jnp.float32 escape hatch must apply here too)
            from tinyllama_tpu.quant.codec import SCALE_DTYPE

            scales = np.empty(
                (L, total, *dp0[0][1].shape[1:]), np.dtype(SCALE_DTYPE)
            )
            for i, ps in enumerate(per_layer):
                r0 = 0
                for (d, s) in ps:
                    data[i, r0:r0 + d.shape[0]] = d
                    scales[i, r0:r0 + d.shape[0]] = s
                    r0 += d.shape[0]
            layers[name] = to_kn(QTensor(
                data=jnp.asarray(data), scales=jnp.asarray(scales),
                kind=file_dtype,
            ))
        else:
            dp0 = per_layer[0]
            total = sum(p.shape[0] for p in dp0)
            out = np.empty((L, total, *dp0[0].shape[1:]), dp0[0].dtype)
            for i, ps in enumerate(per_layer):
                r0 = 0
                for p in ps:
                    out[i, r0:r0 + p.shape[0]] = p
                    r0 += p.shape[0]
            layers[name] = jnp.asarray(out, dtype=wdt)

    params: Params = {
        "embed": weight(flat["embed"]),
        "layers": layers,
        "norm": jnp.asarray(flat["norm"].astype(np.float32)),
        "lm_head": weight(flat["lm_head"], kn=True),
    }
    return params, policy


# ---------------------------------------------------------------- device decode


def _dev_bytes(mv) -> jnp.ndarray:
    """Raw payload bytes -> device uint8 (one zero-copy host view + one
    host->device DMA; no numpy pass over the data)."""
    return jnp.asarray(np.frombuffer(mv, np.uint8))


def _dev_fp16(mv, shape) -> jnp.ndarray:
    u8 = _dev_bytes(mv)
    return jax.lax.bitcast_convert_type(
        u8.reshape(-1, 2), jnp.float16
    ).reshape(shape)


def _dev_q_blocks(mv, shape, dt):
    """Interleaved gten block structs -> (vals, f16 deltas), on device.

    q8: blocks of [f16 delta | 32 x i8]  -> vals int8 [d_out, d_in]
    q4: blocks of [f16 delta | 16 x u8]  -> vals uint8 [d_out, d_in]
        UNPACKED offset-7 values (gten packs per half-block of 16:
        byte j = q[j] << 4 | q[j+16], tinyllama_to_gten.py:83-89)
    """
    from tinyllama_tpu.quant.codec import BLOCK_SIZE

    d_out, d_in = shape if len(shape) == 2 else (1, shape[0])
    nb = d_in // BLOCK_SIZE
    stride = 2 + (BLOCK_SIZE if dt == "q8" else BLOCK_SIZE // 2)
    u8 = _dev_bytes(mv).reshape(d_out * nb, stride)
    deltas = jax.lax.bitcast_convert_type(
        u8[:, :2].reshape(d_out, nb, 2), jnp.float16
    ).reshape(d_out, nb)
    qb = u8[:, 2:]
    if dt == "q8":
        vals = jax.lax.bitcast_convert_type(qb, jnp.int8).reshape(
            d_out, d_in
        )
    else:
        hi = qb >> 4
        lo = qb & 0x0F
        vals = jnp.concatenate([hi, lo], axis=1).reshape(d_out, d_in)
    return vals, deltas


def _load_gten_device(
    path: str | Path, cfg: ModelConfig, policy: DtypePolicy | None
) -> tuple[Params, DtypePolicy]:
    """Device-side gten decode: payloads travel raw; deinterleave, nibble
    unpack, layout packing, and layer stacking are all jnp ops in HBM."""
    from tinyllama_tpu.quant.codec import (
        SCALE_DTYPE, _kernel_scales, _pack_q4_kn, pack_q4_nk,
    )

    file_dtype, recs = gten.read_gten_records(path, cfg)
    if policy is None:
        policy = POLICIES[_FILE_TO_POLICY[file_dtype]]
    canon = {"fp16": None, "q8": "q8", "q4": "q4"}[file_dtype]
    #: load-time requantization: an fp16 file serves ANY policy (the
    #: reference needs one offline-converted file per dtype,
    #: tinyllama_to_gten.py; here dequant+requant are jnp ops in HBM),
    #: and q8/q4 files serve the "q4g" deployment format (the published
    #: Q4_0 artifact is the natural source — one extra 4-bit rounding).
    requant = policy.is_quantized and policy.wdtype != canon
    if requant and not (file_dtype == "fp16" or policy.wdtype == "q4g"):
        raise ValueError(
            f"file dtype {file_dtype} incompatible with policy "
            f"{policy.wdtype}"
        )
    if canon is not None and not policy.is_quantized:
        raise ValueError(
            f"file dtype {file_dtype} incompatible with policy "
            f"{policy.wdtype}"
        )
    quant = file_dtype in ("q8", "q4")
    wdt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
           "f16": jnp.float16}.get(policy.wdtype)

    def decode(key):
        mv, shape, dt = recs[key]
        if dt == "fp16":
            return _dev_fp16(mv, shape)
        return _dev_q_blocks(mv, shape, dt)

    def densify(decoded) -> jnp.ndarray:
        """Any decoded record -> dense f32 (exactly the file's values)."""
        if not isinstance(decoded, tuple):
            return decoded.astype(jnp.float32)
        vals, deltas = decoded
        from tinyllama_tpu.quant.codec import BLOCK_SIZE, Q4_OFFSET

        v = vals.astype(jnp.float32)
        if file_dtype == "q4":
            v = v - Q4_OFFSET
        return v * jnp.repeat(
            deltas.astype(jnp.float32), BLOCK_SIZE, axis=-1
        )

    def qt_kn(vals, deltas) -> QTensor:
        scales = _kernel_scales(
            jnp.swapaxes(deltas.astype(SCALE_DTYPE), -1, -2)
        )
        if file_dtype == "q4":
            return QTensor(_pack_q4_kn(vals), scales, "q4", "kn")
        return QTensor(jnp.swapaxes(vals, -1, -2), scales, "q8", "kn")

    def qt_nk(vals, deltas) -> QTensor:
        scales = deltas.astype(SCALE_DTYPE)
        if file_dtype == "q4":
            return QTensor(pack_q4_nk(vals), scales, "q4")
        return QTensor(vals, scales, "q8")

    merges = {
        "wqkv": ("wq", "wk", "wv"),
        "wo": ("wo",),
        "w_gateup": ("w_gate", "w_up"),
        "w_down": ("w_down",),
        "attn_norm": ("attn_norm",),
        "ffn_norm": ("ffn_norm",),
    }
    from tinyllama_tpu.quant.codec import quantize

    layers = {}
    for name, parts in merges.items():
        per = [[decode(f"{p}.{i}") for p in parts]
               for i in range(cfg.n_layers)]
        if name.endswith("norm"):
            layers[name] = jnp.stack(
                [p[0].astype(jnp.float32) for p in per]
            )
        elif requant:
            dense = jnp.stack(
                [jnp.concatenate([densify(d) for d in ps], axis=0)
                 for ps in per]
            )
            layers[name] = quantize(dense, policy.wdtype, layout="kn")
        elif quant:
            vals = jnp.stack(
                [jnp.concatenate([d for d, _ in ps], axis=0)
                 for ps in per]
            )
            deltas = jnp.stack(
                [jnp.concatenate([s for _, s in ps], axis=0)
                 for ps in per]
            )
            layers[name] = qt_kn(vals, deltas)
        else:
            layers[name] = jnp.stack(
                [jnp.concatenate(ps, axis=0) for ps in per]
            ).astype(wdt)

    def top(key, kn: bool):
        d = decode(key)
        if requant:
            return quantize(
                densify(d), policy.wdtype, layout="kn" if kn else "nk"
            )
        if quant:
            return qt_kn(*d) if kn else qt_nk(*d)
        return d.astype(wdt)

    params: Params = {
        "embed": top("embed", kn=False),
        "layers": layers,
        "norm": decode("norm").astype(jnp.float32),
        "lm_head": top("lm_head", kn=True),
    }
    return jax.block_until_ready(params), policy


#: HF parameter names composing each (fused) runtime layer weight
_HF_LAYER = {
    "wqkv": ("self_attn.q_proj.weight", "self_attn.k_proj.weight",
             "self_attn.v_proj.weight"),
    "wo": ("self_attn.o_proj.weight",),
    "w_gateup": ("mlp.gate_proj.weight", "mlp.up_proj.weight"),
    "w_down": ("mlp.down_proj.weight",),
    "attn_norm": ("input_layernorm.weight",),
    "ffn_norm": ("post_attention_layernorm.weight",),
}


def _load_hf_state_dict(path: Path) -> dict[str, np.ndarray]:
    """HF checkpoint file or directory -> {name: np.ndarray}.

    Supports .safetensors (single or index.json-sharded) and torch .bin.
    """
    if path.is_dir():
        idx = path / "model.safetensors.index.json"
        if idx.exists():
            import json

            from safetensors.numpy import load_file

            weight_map = json.loads(idx.read_text())["weight_map"]
            out: dict[str, np.ndarray] = {}
            for shard in sorted(set(weight_map.values())):
                out.update(load_file(path / shard))
            return out
        for name in ("model.safetensors", "pytorch_model.bin"):
            if (path / name).exists():
                return _load_hf_state_dict(path / name)
        raise FileNotFoundError(f"no checkpoint found under {path}")
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    with open(path, "rb") as f:
        ckpt = torch.load(f, map_location="cpu", weights_only=True)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.float().numpy() for k, v in ckpt.items()}


def load_hf_checkpoint(
    path: str | Path,
    cfg: ModelConfig,
    policy: DtypePolicy,
) -> Params:
    """Load a HuggingFace Llama-family checkpoint directly into the
    runtime params pytree (no .gten intermediate), quantizing/casting per
    the dtype policy. Handles tied lm_head (cfg.tie_lm_head or a missing
    lm_head.weight falls back to the embedding table).

    The reference's only ingestion path is HF -> .gten -> load
    (tinyllama_to_gten.py); this covers architectures beyond the .gten
    format's fixed TinyLlama layout (config.py MODEL_REGISTRY).
    """
    from tinyllama_tpu.quant.codec import quantize

    sd = _load_hf_state_dict(Path(path))
    wdt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}.get(
        policy.wdtype
    )

    def conv(w: np.ndarray, layout: str):
        if policy.is_quantized:
            return quantize(jnp.asarray(w, jnp.float32), policy.wdtype,
                            layout=layout)
        return jnp.asarray(w, wdt)

    layers: dict[str, object] = {}
    # one merged name at a time bounds peak host memory to ~one stack
    for rname, parts in _HF_LAYER.items():
        per_layer = []
        for i in range(cfg.n_layers):
            arrs = [
                np.asarray(sd[f"model.layers.{i}.{parts_j}"], np.float32)
                for parts_j in parts
            ]
            per_layer.append(
                arrs[0] if len(arrs) == 1 else np.concatenate(arrs, axis=0)
            )
        stacked = np.stack(per_layer)
        del per_layer
        if rname.endswith("norm"):
            layers[rname] = jnp.asarray(stacked, jnp.float32)
        else:
            layers[rname] = conv(stacked, "kn")
        del stacked

    embed = np.asarray(sd["model.embed_tokens.weight"], np.float32)
    lm_name = "lm_head.weight"
    tied = cfg.tie_lm_head or lm_name not in sd
    lm = embed if tied else np.asarray(sd[lm_name], np.float32)
    return {
        "embed": conv(embed, "nk"),
        "layers": layers,
        "norm": jnp.asarray(sd["model.norm.weight"], np.float32),
        "lm_head": conv(lm, "kn"),
    }


def save_gten_checkpoint(
    path: str | Path,
    cfg: ModelConfig,
    dense_params: Params,
    dtype: str,
) -> None:
    """Write runtime dense params (f32/bf16 arrays, layers stacked) to .gten.

    The converter counterpart (tinyllama_to_gten.py parity) for round-trip
    tests and for producing quantized checkpoints from dense ones.
    """
    D, kv = cfg.n_embd, cfg.kv_dim
    # runtime layers are fused (wqkv, w_gateup); the file keeps the
    # reference's separate tensors — split rows back out
    name_map = {
        "wqkv": (
            ("self_attn.q_proj.weight", 0, D),
            ("self_attn.k_proj.weight", D, D + kv),
            ("self_attn.v_proj.weight", D + kv, D + 2 * kv),
        ),
        "wo": (("self_attn.o_proj.weight", 0, D),),
        "w_gateup": (
            ("mlp.gate_proj.weight", 0, cfg.n_ffn),
            ("mlp.up_proj.weight", cfg.n_ffn, 2 * cfg.n_ffn),
        ),
        "w_down": (("mlp.down_proj.weight", 0, D),),
        "attn_norm": (("input_layernorm.weight", 0, D),),
        "ffn_norm": (("post_attention_layernorm.weight", 0, D),),
    }
    hf: dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(
            dense_params["embed"], dtype=np.float32
        ),
        "model.norm.weight": np.asarray(dense_params["norm"], dtype=np.float32),
        "lm_head.weight": np.asarray(dense_params["lm_head"], dtype=np.float32),
    }
    for rname, pieces in name_map.items():
        stacked = np.asarray(dense_params["layers"][rname], dtype=np.float32)
        for i in range(cfg.n_layers):
            for suffix, lo, hi in pieces:
                w = stacked[i]
                hf[f"model.layers.{i}.{suffix}"] = (
                    w if w.ndim == 1 else w[lo:hi]
                )
    gten.write_gten(path, cfg, hf, dtype)
