"""Benchmark: TinyLlama-1.1B decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, ...}

The reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` reports the fraction of the weight-streaming HBM roofline
achieved (BASELINE.json north star: >= 0.80). Policy defaults to q4g —
the framework's fastest 4-bit serving format (group-128 scales,
616 MB ≈ Q4_0's 619 MB; the headline config is "tokens/sec/chip at
1.1B Q4" and q4g is that config with a TPU-native scale grouping).
BENCH_POLICY=q4 measures the byte-exact reference Q4_0 format.

Weights are random — decode throughput is weight-value-independent.
"""

import json
import os
import sys
import time


def _metric_model(cfg) -> str:
    """Model tag for metric names; the flagship keeps its historical
    short name so BENCH_r* files stay comparable across rounds."""
    return ("tinyllama1.1b" if cfg.name == "tinyllama-1.1b-chat-v0.4"
            else cfg.name)


def _bench_cfg_params(policy_name: str):
    """(cfg, policy, params) for the benched model: BENCH_MODEL selects
    the preset; large presets materialize straight into quantized
    storage (llama.init_quantized_params — an 8B f32 staging tree
    exceeds this chip's HBM)."""
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import (
        MODEL_REGISTRY, POLICIES, TINYLLAMA_1_1B,
    )
    from tinyllama_tpu.models import llama

    cfg = MODEL_REGISTRY[os.environ.get("BENCH_MODEL", TINYLLAMA_1_1B.name)]
    policy = POLICIES[policy_name]
    key = jax.random.PRNGKey(0)
    if cfg is TINYLLAMA_1_1B or not policy.is_quantized:
        dense = llama.init_dense_params(cfg, key, dtype=jnp.float32)
        params = llama.convert_params(dense, policy)
        del dense
    else:
        params = llama.init_quantized_params(cfg, key, policy)
    return cfg, policy, jax.block_until_ready(params)


def main() -> int:
    policy_name = os.environ.get("BENCH_POLICY", "q4g")
    # 1536 tokens measures steady-state decode: the two unavoidable
    # host<->device tunnel round-trips (~45 ms total on this box) are
    # <4% of the run instead of ~12% at 384
    n_tokens = int(os.environ.get("BENCH_TOKENS", "1536"))
    # 384-token device-resident chunks amortize the host round-trip
    # (the chip sits behind a high-latency tunnel here): +4% vs 192,
    # +0.3% more at 768 — the dispatch cost is fully hidden by 384
    chunk = int(os.environ.get("BENCH_CHUNK", "384"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    if os.environ.get("BENCH_SERVE"):
        return serve_bench(policy_name, batch if batch > 1 else 32, chunk)
    if os.environ.get("BENCH_PREFILL"):
        return prefill_bench(policy_name, int(os.environ["BENCH_PREFILL"]))
    if batch > 1:
        return batched_bench(policy_name, batch, chunk)

    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import GenerationConfig
    from tinyllama_tpu.runtime.engine import Engine
    from tinyllama_tpu.runtime.perf import detect_hbm_bw, tree_nbytes

    cfg, policy, params = _bench_cfg_params(policy_name)

    # long-context mode: BENCH_CTX overrides max_ctx (4096/8192 exercise
    # _ctx_bucket growth, page tables and the staging path past the
    # reference's 2048 cap — tinyllama.cpp:14), BENCH_PROMPT sets the
    # prefill length so decode runs at deep fill, BENCH_PAGED uses the
    # paged engine for the single stream
    max_ctx = int(os.environ.get("BENCH_CTX", "0")) or None
    prompt_len = int(os.environ.get("BENCH_PROMPT", "32"))
    engine = Engine(cfg, policy, params, max_ctx=max_ctx,
                    paged=bool(os.environ.get("BENCH_PAGED")))
    prompt = [2 + (i % 2000) for i in range(prompt_len)]
    gen = GenerationConfig(
        n_predict=n_tokens + len(prompt), greedy=True, eos_token=-1,
        chunk_size=chunk,
    )

    spec = int(os.environ.get("BENCH_SPEC", "0"))  # draft_len; 0 = off

    def run():
        if spec:
            return engine.generate_speculative(prompt, gen, draft_len=spec)
        return engine.generate(prompt, gen)

    # cold run (compile), then timed warm run
    run()
    t0 = time.perf_counter()
    out, stats = run()
    wall = time.perf_counter() - t0

    tok_s = stats.decode_tokens_per_s
    weights_bytes = tree_nbytes(params)
    bw = detect_hbm_bw() or 819e9  # v5e default
    roofline = bw / weights_bytes  # every decoded token streams all weights

    suffix = f"_spec{spec}" if spec else ""
    result = {
        "metric": f"decode_tok_s_{_metric_model(cfg)}_{policy_name}_b1{suffix}",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline, 4),
        "detail": {
            "policy": policy_name,
            "max_ctx": engine.max_ctx,
            "prompt_len": len(prompt),
            "paged": engine.paged,
            "tokens": stats.generated_tokens,
            **(
                {"n_verify": stats.decode_token_times[0],
                 "tokens_per_verify": round(
                     stats.generated_tokens
                     / max(1, stats.decode_token_times[0]), 2)}
                if spec and stats.decode_token_times else {}
            ),
            "ms_per_token": round(stats.ms_per_token, 3),
            "prefill_ms": round(stats.prefill_s * 1000, 1),
            "weights_mb": round(weights_bytes / 1e6, 1),
            "roofline_tok_s": round(roofline, 1),
            "wall_s": round(wall, 2),
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))
    return 0


def batched_bench(policy_name: str, batch: int, chunk: int) -> int:
    """Aggregate decode throughput at BENCH_BATCH sequences (the serving
    regime: weight streaming amortizes across the batch)."""
    import time

    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.runtime.engine import Engine
    from tinyllama_tpu.runtime.perf import detect_hbm_bw, tree_nbytes

    cfg, policy, params = _bench_cfg_params(policy_name)

    from tinyllama_tpu.runtime.engine import _ctx_bucket

    max_ctx = int(os.environ.get("BENCH_CTX", "0")) or None
    engine = Engine(cfg, policy, params, max_batch=batch, max_ctx=max_ctx)
    cache = engine.new_cache(batch)
    logits, cache, lens = engine.prefill(cache, [list(range(2, 34))] * batch)
    # per-round fill-bucketed chunks, exactly as generate_batch
    # dispatches them (round k decodes positions up to 33 + (k+1)*chunk)
    start = int(lens.max())
    rounds = 3
    steps = [
        engine._chunk_fn(
            chunk, True, 50,
            ctx_bound=_ctx_bucket(start + (k + 1) * chunk, engine.max_ctx),
        )
        for k in range(rounds + 1)
    ]
    pos = jnp.asarray(lens, jnp.int32)
    key = jax.random.PRNGKey(0)
    args = (jnp.int32(-1), jnp.float32(1.0))
    toks, done, logits, cache, pos, key = steps[0](
        params, cache, logits, pos, key, *args
    )
    jax.block_until_ready(toks)
    for st in steps[1:]:  # AOT-compile the later bounds outside the timing
        st.lower(params, cache, logits, pos, key, *args).compile()
    n = 0
    t0 = time.perf_counter()
    for k in range(rounds):
        toks, done, logits, cache, pos, key = steps[k + 1](
            params, cache, logits, pos, key, *args
        )
        n += toks.size
    jax.block_until_ready(toks)
    wall = time.perf_counter() - t0

    tok_s = n / wall
    bw = detect_hbm_bw() or 819e9
    roofline = bw / tree_nbytes(params) * batch  # perfect weight amortization
    print(json.dumps({
        "metric": f"decode_tok_s_{_metric_model(cfg)}_{policy_name}_b{batch}",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline, 4),
        "detail": {
            "policy": policy_name, "batch": batch,
            "ms_per_step": round(wall / rounds / chunk * 1000, 3),
            "per_seq_tok_s": round(tok_s / batch, 2),
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
    }))
    return 0


def prefill_bench(policy_name: str, T: int) -> int:
    """Prefill throughput + MFU at context length T (device time from a
    profiler trace — wall clock includes the host<->device dispatch
    latency, which dwarfs nothing at T=2048 but is still ~30%). Enable
    with BENCH_PREFILL=T."""
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.runtime import trace
    from tinyllama_tpu.runtime.engine import Engine
    from tinyllama_tpu.runtime.perf import detect_peak_flops

    cfg, policy, params = _bench_cfg_params(policy_name)
    engine = Engine(cfg, policy, params)
    prompt = list(range(2, 2 + T))

    cache = engine.new_cache(1)
    logits, cache, _ = engine.prefill(cache, [prompt])  # compile
    jax.block_until_ready(logits)

    def run():
        c = engine.new_cache(1)
        out, c, _ = engine.prefill(c, [prompt])
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    try:
        events = trace.profile_device_events(run)
        # control-flow wrappers (the layer-scan while) span their
        # children, which are traced separately — skip to avoid double
        # counting the whole scan body
        dev_s = sum(
            e.dur_us for e in events
            if not e.name.startswith(("while", "conditional"))
        ) / 1e6
    except Exception:
        dev_s = 0.0

    # matmul FLOPs only (the MFU convention): 2 * params_in_matmuls * T
    per_layer = (
        (cfg.n_embd + 2 * cfg.kv_dim) * cfg.n_embd
        + cfg.n_embd * cfg.n_embd
        + 2 * cfg.n_ffn * cfg.n_embd
        + cfg.n_embd * cfg.n_ffn
    )
    n_mat = cfg.n_layers * per_layer + cfg.n_vocab * cfg.n_embd
    flops = 2 * n_mat * T
    peak = detect_peak_flops() or 394e12
    base = dev_s or wall
    print(json.dumps({
        "metric": f"prefill_tok_s_{_metric_model(cfg)}_{policy_name}_T{T}",
        "value": round(T / base, 1),
        "unit": "tok/s",
        "vs_baseline": round(flops / base / peak, 4),  # MFU
        "detail": {
            "policy": policy_name, "T": T,
            "device_ms": round(dev_s * 1e3, 1),
            "wall_ms": round(wall * 1e3, 1),
            "mfu": round(flops / base / peak, 4),
            "matmul_tflop": round(flops / 1e12, 3),
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
    }))
    return 0


def serve_bench(policy_name: str, batch: int, chunk: int) -> int:
    """Continuous-batching serving benchmark (BASELINE config 3: "Q4_0 +
    INT8 KV-cache, continuous batching at batch 32"): aggregate decode
    throughput + p50 TTFT across BENCH_REQS requests through BENCH_BATCH
    slots. Enable with BENCH_SERVE=1."""
    import statistics
    import time

    import jax

    from tinyllama_tpu.config import GenerationConfig
    from tinyllama_tpu.runtime.engine import Engine
    from tinyllama_tpu.runtime.perf import detect_hbm_bw, tree_nbytes
    from tinyllama_tpu.runtime.scheduler import ContinuousBatcher

    cfg, policy, params = _bench_cfg_params(policy_name)
    n_reqs = int(os.environ.get("BENCH_REQS", str(batch * 3)))
    prompt_len = int(os.environ.get("BENCH_PROMPT", "33"))
    max_new = int(os.environ.get("BENCH_MAXNEW", "64"))
    # a chunk longer than any request's budget decodes parked garbage
    # for (chunk - max_new) steps per wave — clamp
    chunk = min(chunk, max_new)

    import jax.numpy as jnp  # noqa: F401

    max_ctx = int(os.environ.get("BENCH_CTX", "0")) or None
    engine = Engine(cfg, policy, params, max_batch=batch, max_ctx=max_ctx)
    gen = GenerationConfig(greedy=True, eos_token=-1, chunk_size=chunk)

    paged = bool(os.environ.get("BENCH_PAGED"))
    n_pages = None
    page_size = None
    if paged:
        from tinyllama_tpu.runtime.paged import default_page_size

        page_size = (
            int(os.environ.get("BENCH_PAGESIZE", "0"))
            or default_page_size(cfg.max_ctx)
        )
        # size the pool to the actual working set (+1 scratch page)
        per_req = -(-(prompt_len + max_new + chunk) // page_size)
        n_pages = 1 + batch * per_req

    # bucket downshift (paged only): BENCH_DOWNSHIFT=0 pins chunks at
    # full width to measure the parked-slot ride cost it removes
    downshift = paged and os.environ.get("BENCH_DOWNSHIFT", "1") != "0"

    def run_round():
        sched = ContinuousBatcher(
            engine, gen, max_batch=batch, paged=paged, n_pages=n_pages,
            page_size=page_size, downshift=downshift,
            ttft_chunk=int(os.environ.get("BENCH_TTFT_CHUNK", "0")),
        )
        for i in range(n_reqs):
            sched.submit(
                [2 + (i + j) % 1000 for j in range(prompt_len)],
                max_new=max_new,
            )
        t0 = time.perf_counter()
        results = sched.run()
        wall = time.perf_counter() - t0
        toks = sum(len(r.output) for r in results.values())
        ttfts = [
            r.first_token_s - r.submitted_s for r in results.values()
            if r.first_token_s is not None
        ]
        return toks, wall, ttfts

    run_round()  # compile (prefill buckets, chunk, insert)
    toks, wall, ttfts = run_round()

    print(json.dumps({
        "metric": f"serve_tok_s_{_metric_model(cfg)}_{policy_name}_b{batch}",
        "value": round(toks / wall, 2),
        "unit": "tok/s",
        "vs_baseline": round(
            toks / wall
            / ((detect_hbm_bw() or 819e9) / tree_nbytes(params) * batch),
            4,
        ),
        "detail": {
            "policy": policy_name, "slots": batch, "requests": n_reqs,
            "paged": paged, "n_pages": n_pages, "downshift": downshift,
            "prompt_len": prompt_len, "max_new": max_new,
            "generated": toks, "wall_s": round(wall, 2),
            "ttft_p50_ms": round(
                statistics.median(ttfts) * 1000, 1) if ttfts else None,
            "ttft_max_ms": round(max(ttfts) * 1000, 1) if ttfts else None,
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
