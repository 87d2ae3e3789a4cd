"""Profile the decode step: per-kernel device time from a real trace.

The kernel-tuning workhorse: runs a chunked decode on the current backend
under jax.profiler.trace and prints the print_perf-style device-time
bucket table (runtime/trace.py). Wall-clock per-op timing is meaningless
behind the axon tunnel (~20-40ms RTT); this reads the device track.

Usage:
    python tools/profile_decode.py --policy q4 --steps 64 [--batch 1]
    python tools/profile_decode.py --policy q4 --prefill 2048   # prefill MFU
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--policy", default="q4")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--paged", action="store_true",
                    help="profile the paged-KV decode path")
    ap.add_argument("--ctx-bound", type=int, default=None,
                    help="fill-bucketed attention grid bound (see "
                         "runtime/engine._ctx_bucket)")
    ap.add_argument("--model", default="tinyllama-1.1b-chat-v0.4")
    ap.add_argument("--prefill", type=int, default=0,
                    help="profile one prefill of this length instead of decode")
    ap.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (default: tmp)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import (
        MODEL_REGISTRY, POLICIES, GenerationConfig, tiny_test_config,
    )
    from tinyllama_tpu.models import llama
    from tinyllama_tpu.runtime.engine import Engine
    from tinyllama_tpu.runtime import trace

    cfg = (tiny_test_config() if args.model == "tiny-test"
           else MODEL_REGISTRY[args.model])
    policy = POLICIES[args.policy]
    dense = llama.init_dense_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    params = jax.block_until_ready(llama.convert_params(dense, policy))
    del dense

    engine = Engine(cfg, policy, params, max_batch=args.batch,
                    paged=args.paged)

    if args.prefill:
        prompts = [list(range(2, 2 + args.prefill))] * args.batch
        cache = engine.new_cache(args.batch)
        logits, cache, lens = engine.prefill(cache, prompts)  # compile
        jax.block_until_ready(logits)

        def run():
            cache2 = engine.new_cache(args.batch)
            out, cache2, _ = engine.prefill(cache2, prompts)
            jax.block_until_ready(out)

        steps = 1
    else:
        prompts = [list(range(2, 34))] * args.batch
        cache = engine.new_cache(args.batch)
        logits, cache, lens = engine.prefill(cache, prompts)
        chunk = engine._chunk_fn(args.steps, True, 50, paged=args.paged,
                                 ctx_bound=args.ctx_bound)
        pos = jnp.asarray(lens, jnp.int32)
        key = jax.random.PRNGKey(0)
        eos, temp = jnp.int32(-1), jnp.float32(1.0)
        state = chunk(params, cache, logits, pos, key, eos, temp)  # compile
        jax.block_until_ready(state[0])

        def run():
            toks, done, lg, c2, p2, k2 = chunk(
                params, state[3], state[2], state[4], state[5], eos, temp
            )
            jax.block_until_ready(toks)

        steps = args.steps

    events = trace.profile_device_events(run, args.trace_dir)
    rep = trace.bucket_report(events, steps=steps)
    print(trace.format_bucket_table(rep, top_n=24))

    if args.prefill:
        # prefill MFU: model FLOPs / device time / peak
        from tinyllama_tpu.runtime.perf import detect_peak_flops

        T = args.prefill
        flops = 2 * param_matmul_count(cfg) * T * args.batch
        dev_s = rep.total_us / 1e6
        peak = detect_peak_flops() or 394e12
        print(f"prefill T={T}: device {dev_s * 1e3:.1f}ms, "
              f"MFU {flops / dev_s / peak * 100:.1f}% "
              f"(matmul FLOPs {flops / 1e12:.2f} TF)")
    return 0


def param_matmul_count(cfg) -> int:
    """Matmul weight-parameter count (embed excluded, lm_head included)."""
    per_layer = (
        (cfg.n_embd + 2 * cfg.kv_dim) * cfg.n_embd  # wqkv
        + cfg.n_embd * cfg.n_embd  # wo
        + 2 * cfg.n_ffn * cfg.n_embd  # gate+up
        + cfg.n_embd * cfg.n_ffn  # down
    )
    return cfg.n_layers * per_layer + cfg.n_vocab * cfg.n_embd


if __name__ == "__main__":
    sys.exit(main())
