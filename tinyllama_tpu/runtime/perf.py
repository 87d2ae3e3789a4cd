"""Performance reporting.

The print_perf analog (/root/reference/tinyllama.cpp:515-582): per-token
latency, phase totals, and the weights-vs-activations memory split — plus
TPU-native additions (tokens/sec, prefill latency, HBM roofline estimate).
"""

from __future__ import annotations

import jax

from tinyllama_tpu.runtime.engine import GenStats


def tree_nbytes(tree) -> int:
    return sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "nbytes")
    )


#: approximate peak HBM bandwidth per chip, bytes/s (for roofline context)
HBM_BW = {
    "TPU v5 lite": 819e9,  # v5e: 819 GB/s
    "TPU v4": 1200e9,
    "TPU v6 lite": 1640e9,
}


#: approximate peak bf16 MXU throughput per chip, FLOP/s (for MFU context).
#: NOTE v5e: 197 TFLOP/s is the bf16 peak; the oft-quoted 394 is INT8
#: TOPS. Rounds 1-4 used 394e12 here, which halved every reported MFU —
#: a dense XLA bf16 [2048,2048]x[2048,11264] measures 489 us = 98% of
#: the 197e12 peak on this chip (round-5 calibration), so 197e12 is the
#: correct denominator.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e bf16 (394e12 is int8)
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def detect_peak_flops() -> float | None:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    for prefix, f in PEAK_FLOPS.items():
        if kind.startswith(prefix):
            return f
    return None


def detect_hbm_bw() -> float | None:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    for prefix, bw in HBM_BW.items():
        if kind.startswith(prefix):
            return bw
    return None


def perf_report(
    stats: GenStats,
    params=None,
    cache=None,
) -> str:
    """Format the performance table (reference layout, TPU metrics added)."""
    n = max(1, stats.generated_tokens)
    weights_mb = tree_nbytes(params) / 1e6 if params is not None else 0.0
    cache_mb = tree_nbytes(cache) / 1e6 if cache is not None else 0.0

    lines = [
        "",
        "-------------------------------",
        " PERFORMANCE",
        "-------------------------------",
        f" Inference [per tok] : {stats.ms_per_token:8.2f}ms",
        f" Throughput          : {stats.decode_tokens_per_s:8.1f} tok/s",
        f" Prefill time        : {stats.prefill_s * 1000:8.0f}ms"
        f" ({stats.prompt_tokens} tokens)",
        f" Load time           : {stats.load_s * 1000:8.0f}ms",
        f" Inference [total]   : {stats.decode_s * 1000:8.0f}ms"
        f" ({stats.generated_tokens} tokens)",
        f" Total runtime       : "
        f"{(stats.load_s + stats.prefill_s + stats.decode_s) * 1000:8.0f}ms",
        "-------------------------------",
        f" Mem usage [total]   : {weights_mb + cache_mb:7.0f}MB",
        f" Mem usage [model]   : {weights_mb:7.0f}MB",
        f" Mem usage [kvcache] : {cache_mb:7.0f}MB",
        "-------------------------------",
    ]

    bw = detect_hbm_bw()
    if bw and weights_mb:
        # weight-streaming roofline: every decoded token reads all weights
        roofline_tps = bw / (weights_mb * 1e6)
        pct = 100.0 * stats.decode_tokens_per_s / roofline_tps
        lines += [
            f" Roofline [tok/s]    : {roofline_tps:8.1f} (weight-stream bound)",
            f" Roofline achieved   : {pct:7.1f}%",
            "-------------------------------",
        ]
    return "\n".join(lines) + "\n"
