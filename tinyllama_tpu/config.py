"""Model / dtype / generation configuration.

Replaces the reference's hardcoded hyperparameter struct
(/root/reference/tinyllama.cpp:12-20) and dtype policy
(/root/reference/tinyllama.cpp:258-265) with typed, multi-model configs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    """Llama-family architecture hyperparameters.

    Defaults mirror TinyLlama-1.1B-Chat-v0.4 as hardcoded in the reference
    (tinyllama.cpp:12-20): n_vocab=32003, max_ctx=2048, n_embd=2048,
    n_ffn=5632, n_layers=22, n_heads=32, n_query_groups=4.
    """

    name: str = "tinyllama-1.1b-chat-v0.4"
    n_vocab: int = 32003
    max_ctx: int = 2048
    n_embd: int = 2048
    n_ffn: int = 5632
    n_layers: int = 22
    n_heads: int = 32
    n_kv_heads: int = 4  # "n_query_groups" in the reference
    rope_theta: float = 10000.0
    # RMSNorm epsilon. The reference adds eps to the *root* mean square
    # (x / (rms + eps) * w, gten/ops.h rms_norm_vec_f32), unlike HF Llama
    # which uses x * rsqrt(mean_sq + eps). `norm_eps_inside_sqrt` selects
    # the HF convention for non-TinyLlama models.
    norm_eps: float = 1e-6
    norm_eps_inside_sqrt: bool = False
    # Whether lm_head weights are tied to the embedding table.
    tie_lm_head: bool = False
    # Explicit head dim; None derives n_embd // n_heads. Set by
    # parallel/tp.py local_config, where per-shard head counts shrink but
    # the head dim must not.
    head_dim: int | None = None

    @property
    def d_head(self) -> int:
        return self.head_dim or self.n_embd // self.n_heads

    @property
    def q_heads_per_group(self) -> int:
        return self.n_heads // self.n_kv_heads

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.d_head

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# --- Model registry ---------------------------------------------------------

TINYLLAMA_1_1B = ModelConfig()

# Larger Llama-family presets (BASELINE.json configs list Llama-3-8B/70B as
# multi-chip targets). These use the HF norm convention and large rope theta.
LLAMA_3_8B = ModelConfig(
    name="llama-3-8b",
    n_vocab=128256,
    max_ctx=8192,
    n_embd=4096,
    n_ffn=14336,
    n_layers=32,
    n_heads=32,
    n_kv_heads=8,
    rope_theta=500000.0,
    norm_eps=1e-5,
    norm_eps_inside_sqrt=True,
)

LLAMA_3_70B = ModelConfig(
    name="llama-3-70b",
    n_vocab=128256,
    max_ctx=8192,
    n_embd=8192,
    n_ffn=28672,
    n_layers=80,
    n_heads=64,
    n_kv_heads=8,
    rope_theta=500000.0,
    norm_eps=1e-5,
    norm_eps_inside_sqrt=True,
)

MODEL_REGISTRY: dict[str, ModelConfig] = {
    m.name: m for m in (TINYLLAMA_1_1B, LLAMA_3_8B, LLAMA_3_70B)
}


def tiny_test_config(**overrides) -> ModelConfig:
    """A miniature config for fast unit tests (shapes stay TPU-tileable)."""
    base = dict(
        name="tiny-test",
        n_vocab=512,
        max_ctx=128,
        n_embd=128,
        n_ffn=256,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
    )
    base.update(overrides)
    return ModelConfig(**base)


# --- Dtype policy ------------------------------------------------------------

#: Supported weight formats. "q8"/"q4" are block-32 weight-only quantization
#: (gten/quants.h:17-31 equivalents); "q4g" is the TPU-native group-128
#: 4-bit serving format (quant/codec.py quantize_q4g — full-depth MXU
#: dots, no reference counterpart); f32/bf16/f16 are dense.
WEIGHT_DTYPES = ("f32", "bf16", "f16", "q8", "q4", "q4g")
#: Supported activation compute dtypes.
ACT_DTYPES = ("f32", "bf16", "f16")
#: Supported KV-cache storage dtypes ("i8" = per-(pos,head) scaled int8).
KV_DTYPES = ("f32", "bf16", "f16", "i8")


@dataclass(frozen=True)
class DtypePolicy:
    """Weight/activation/KV-cache dtype policy.

    Mirrors the reference's ModuleDtype policy (tinyllama.cpp:258-265):
    fp16 -> {w: f16, a: f16}; q8 -> {w: q8}; q4 -> {w: q4}. The reference
    also quantizes *activations* to q8 for quantized models; on TPU the
    idiomatic (and faster) choice is weight-only quantization with bf16/f32
    activations, which BASELINE.json's north star specifies.
    """

    wdtype: str = "bf16"
    adtype: str = "bf16"
    kv_dtype: str = "bf16"
    #: quantize matmul activations to per-32-block int8 inside the decode
    #: kernel (int8 MXU dots) — the reference's q8 activation scheme
    #: (tinyllama.cpp:258-265). Weight-only quantization stays the default.
    aq8: bool = False

    def __post_init__(self):
        assert self.wdtype in WEIGHT_DTYPES, self.wdtype
        assert self.adtype in ACT_DTYPES, self.adtype
        assert self.kv_dtype in KV_DTYPES, self.kv_dtype

    @property
    def is_quantized(self) -> bool:
        return self.wdtype in ("q8", "q4", "q4g")


#: Named dtype policies matching the reference CLI flags -f16/-q8/-q4
#: (tinyllama.cpp:152-162) plus TPU-native bf16/f32.
POLICIES: dict[str, DtypePolicy] = {
    "f32": DtypePolicy("f32", "f32", "f32"),
    "bf16": DtypePolicy("bf16", "bf16", "bf16"),
    "f16": DtypePolicy("f16", "bf16", "bf16"),
    "q8": DtypePolicy("q8", "bf16", "bf16"),
    "q4": DtypePolicy("q4", "bf16", "bf16"),
    # int8-KV variants (the reference's quantized modes also quantize the
    # activation cache to q8, tinyllama.cpp:258-265): 2-4x KV memory
    # headroom for long context / large batch at ~5% decode cost at b=1.
    "q8-kvi8": DtypePolicy("q8", "bf16", "i8"),
    "q4-kvi8": DtypePolicy("q4", "bf16", "i8"),
    # activation-quantized variants: int8 MXU *decode* dots, activations
    # quantized per 32-block like the reference's q8 activation cache
    # (prefill keeps bf16 activations — the throughput kernel dequantizes
    # weight tiles instead). Slower than weight-only at 1.1B shapes; kept
    # for reference-faithful numerics and larger-model experiments.
    "q8a8": DtypePolicy("q8", "bf16", "bf16", aq8=True),
    "q4a8": DtypePolicy("q4", "bf16", "bf16", aq8=True),
    # TPU-native group-128 4-bit serving format: same packed bytes per
    # weight as Q4_0 but one scale per 128 elements, so the decode
    # kernel runs full-depth-128 MXU dots (quant/codec.py quantize_q4g).
    # A deployment format, not a parity format — quality deltas vs q4
    # are measured by tools/eval_ppl.py.
    "q4g": DtypePolicy("q4g", "bf16", "bf16"),
    "q4g-kvi8": DtypePolicy("q4g", "bf16", "i8"),
}


@dataclass(frozen=True)
class GenerationConfig:
    """Sampler settings; defaults match the reference CLI
    (tinyllama.cpp:140-143: n_predict=768, temp=0.9, topk=50)."""

    n_predict: int = 768
    temperature: float = 0.9
    top_k: int = 50
    greedy: bool = False
    eos_token: int = 32002  # tokenizer.h:26
    seed: int = 0
    #: tokens generated per device call. The decode loop runs on device
    #: (lax.scan over steps, sampling fused in); the host sees one array of
    #: `chunk_size` tokens per round-trip — essential when the chip sits
    #: behind a high-latency link, and good practice everywhere.
    chunk_size: int = 32
