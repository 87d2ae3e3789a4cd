"""Chat CLI.

Flag and behavior parity with the reference CLI (/root/reference/
tinyllama.cpp:114-298): ``-f16/-q8/-q4``, ``-p PROMPT`` (single prompt) or
a chat REPL, ``-greedy``, ``--temp``, ``--npred``, ``--topk``; generated
text streams to stderr, the performance table prints to stdout after a
greedy run. TPU-native extras: ``--bf16/--f32``, ``--kv i8``, ``--model``
presets, ``--random-weights`` (synthetic smoke runs), ``--platform cpu``,
``--chunk`` (tokens per device round-trip), ``--tp`` (tensor-parallel
degree over a device mesh), ``--paged`` (paged KV cache), ``--spec K``
(speculative decoding).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

USAGE_EXTRA = """
Examples:
  python -m tinyllama_tpu.cli
  python -m tinyllama_tpu.cli -q8 --npred 1000
  python -m tinyllama_tpu.cli -p "Give three tips for staying healthier."
  python -m tinyllama_tpu.cli --random-weights --model tiny-test -p "smoke"
"""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tinyllama-tpu",
        description="TPU-native TinyLlama chat (reference-compatible flags).",
        epilog=USAGE_EXTRA,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    g = p.add_mutually_exclusive_group()
    g.add_argument("-f16", action="store_const", dest="dtype", const="f16",
                   help="float-16 model (2.2GB). [default]")
    g.add_argument("-q8", action="store_const", dest="dtype", const="q8",
                   help="8-bit quantized model (1.1GB).")
    g.add_argument("-q4", action="store_const", dest="dtype", const="q4",
                   help="4-bit quantized model (0.62GB).")
    g.add_argument("-q4g", action="store_const", dest="dtype", const="q4g",
                   help="4-bit group-128 TPU serving format (0.62GB; "
                        "fastest decode — requantized from the checkpoint "
                        "at load).")
    g.add_argument("--bf16", action="store_const", dest="dtype", const="bf16",
                   help="bfloat16 weights (TPU-native dense).")
    g.add_argument("--f32", action="store_const", dest="dtype", const="f32",
                   help="float32 weights (parity/debug).")
    p.set_defaults(dtype="f16")
    p.add_argument("-p", dest="prompt", default="", metavar="PROMPT",
                   help="single prompt (otherwise: chat REPL)")
    p.add_argument("-greedy", action="store_true", help="greedy sampling")
    p.add_argument("--temp", type=float, default=0.9,
                   help="sampling temperature (> 0). [default=0.9]")
    p.add_argument("--npred", type=int, default=768, metavar="N",
                   help="number of tokens to generate, 1..2048. [default=768]")
    p.add_argument("--topk", type=int, default=50, metavar="K",
                   help="top-k for sampling. [default=50]")
    p.add_argument("--ckpt", default=None, help=".gten checkpoint path "
                   "(default: models/tinyllama.<dtype>.gten, auto-download)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer.bin path (default: ./tokenizer.bin)")
    p.add_argument("--model", default="tinyllama-1.1b-chat-v0.4",
                   help="architecture preset or 'tiny-test'")
    p.add_argument("--kv", default=None, choices=("f32", "bf16", "f16", "i8"),
                   help="KV-cache dtype (default: policy default)")
    p.add_argument("--chunk", type=int, default=32,
                   help="decode tokens per device round-trip")
    p.add_argument("--paged", action="store_true",
                   help="paged KV cache (page-pool + page-table flash "
                        "decode kernel; the serving cache layout)")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decoding with K-token n-gram drafts "
                        "(greedy only; output identical to plain greedy)")
    p.add_argument("--max-ctx", type=int, default=None,
                   help="context window override")
    p.add_argument("--sp", type=int, default=1, metavar="N",
                   help="sequence-parallel prefill ways (parallel/sp.py):"
                        " shard the prompt's T dim over N devices with"
                        " ring attention; decode stays single-stream")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (shards weights/KV on a mesh)")
    p.add_argument("--tp-overlap", action="store_true",
                   help="overlap TP all-reduces with compute: the two "
                        "per-block psums become chunked reduce-scatter "
                        "rings whose ppermute hops ride concurrently "
                        "with the next chunk's matmul")
    p.add_argument("--tp-mode", default="shard_map",
                   choices=("shard_map", "gspmd"),
                   help="TP execution path: shard_map (explicit collectives; "
                        "runs the Pallas kernels per shard — the production "
                        "path) or gspmd (NamedSharding + jit; XLA fallback "
                        "ops only). [default=shard_map]")
    p.add_argument("--random-weights", action="store_true",
                   help="random-initialized weights (no checkpoint; smoke runs)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="force a JAX platform")
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed (default: time-based, like the reference's "
                        "random_device)")
    p.add_argument("--no-perf", action="store_true",
                   help="suppress the performance table")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of generation to DIR "
                        "(view with tensorboard/xprof)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN, the "
                        "TPU analog of the reference's GTEN_ASSERT "
                        "invariant checks)")
    return p


def validate(args) -> None:
    if not (1 <= args.npred <= 2048):
        raise SystemExit("npred must be greater than 1 and less than 2048.")
    if args.temp <= 0.0:
        raise SystemExit("temp value must be greater than zero.")
    if not (1 <= args.topk <= 32003):
        raise SystemExit("topk must be gte 1 and lte 32003.")
    if args.tp < 1:
        raise SystemExit("tp must be >= 1.")
    if args.spec and not args.greedy:
        raise SystemExit("--spec requires -greedy (exact greedy acceptance).")
    if args.spec and args.paged:
        raise SystemExit("--spec uses the monolithic cache (drop --paged).")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    validate(args)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from tinyllama_tpu.config import (
        GenerationConfig, MODEL_REGISTRY, POLICIES, tiny_test_config,
    )
    from tinyllama_tpu.io.hf_tokenizer import load_tokenizer
    from tinyllama_tpu.models import llama
    from tinyllama_tpu.runtime.engine import Engine
    from tinyllama_tpu.runtime.perf import perf_report

    cfg = (tiny_test_config() if args.model == "tiny-test"
           else MODEL_REGISTRY[args.model])
    if args.max_ctx:
        cfg = cfg.replace(max_ctx=args.max_ctx)
    policy = POLICIES[args.dtype]
    if args.kv:
        import dataclasses

        policy = dataclasses.replace(policy, kv_dtype=args.kv)

    load_t0 = time.perf_counter()
    if args.random_weights:
        import jax.numpy as jnp

        dense = llama.init_dense_params(cfg, jax.random.PRNGKey(0),
                                        dtype=jnp.float32)
        params = llama.convert_params(dense, policy)
        del dense
    elif args.ckpt and (
        Path(args.ckpt).is_dir()
        or Path(args.ckpt).suffix in (".safetensors", ".bin", ".pt")
    ):
        # HF checkpoint (file or sharded directory), loaded directly
        from tinyllama_tpu.io.checkpoint import load_hf_checkpoint

        params = load_hf_checkpoint(Path(args.ckpt), cfg, policy)
    else:
        from tinyllama_tpu.io.checkpoint import load_gten_checkpoint

        ckpt = args.ckpt
        if ckpt is None:
            from tinyllama_tpu.io.download import download_model

            # q4g is requantized at load from the published Q4_0 artifact
            model_id = {"f16": "fp16", "q8": "q8", "q4": "q4",
                        "q4g": "q4"}.get(args.dtype)
            if model_id is None:
                raise SystemExit(
                    f"--{args.dtype} has no prebuilt checkpoint; pass --ckpt"
                )
            try:
                ckpt = download_model(model_id)
            except RuntimeError as e:
                raise SystemExit(f"Error: {e}")
        params, policy = load_gten_checkpoint(Path(ckpt), cfg, policy)
    load_s = time.perf_counter() - load_t0

    shardings = cache_sharding = None
    tp = 1
    if args.tp > 1 and args.tp_mode == "gspmd":
        from tinyllama_tpu.parallel.mesh import make_mesh
        from tinyllama_tpu.parallel.sharding import (
            cache_sharding as mk_cache_sharding, param_sharding,
        )

        mesh = make_mesh(tp=args.tp)
        shardings = param_sharding(mesh, params)
        cache_sharding = mk_cache_sharding(mesh, cfg)
    elif args.tp > 1:
        tp = args.tp

    engine = Engine(
        cfg, policy, params,
        max_ctx=args.max_ctx,
        param_sharding=shardings,
        cache_sharding=cache_sharding,
        tp=tp,
        paged=args.paged,
        tp_overlap=args.tp_overlap,
        sp=args.sp,
    )

    tok_path = args.tokenizer or (
        "tokenizer.bin" if Path("tokenizer.bin").exists()
        else "/root/reference/tokenizer.bin"
    )
    use_tokenizer = not args.random_weights or Path(tok_path).exists()
    tokenizer = load_tokenizer(tok_path) if use_tokenizer else None

    seed = args.seed if args.seed is not None else int(time.time_ns() % 2**31)
    gen = GenerationConfig(
        n_predict=args.npred, temperature=args.temp, top_k=args.topk,
        greedy=args.greedy, seed=seed, chunk_size=args.chunk,
        eos_token=tokenizer.eos if tokenizer else -1,
    )

    def run_once(prompt: str) -> None:
        if tokenizer:
            from tinyllama_tpu.io.tokenizer import safe_piece

            tokens = tokenizer.encode(prompt)
            # first generated piece decodes with prev=BOS, which strips
            # its leading sentencepiece space (tinyllama.cpp:431)
            prev = [1]

            def stream(t: int) -> None:
                # safe_piece drops unprintable raw bytes, like the
                # reference's safe_printf (tokenizer.h:114-126)
                piece = safe_piece(tokenizer.decode(prev[0], t))
                prev[0] = t
                sys.stderr.buffer.write(piece)
                sys.stderr.flush()
        else:
            tokens = [1] + [ord(c) % engine.cfg.n_vocab for c in prompt]

            def stream(t: int) -> None:
                sys.stderr.write(f"{t} ")
                sys.stderr.flush()

        if args.profile:
            import contextlib

            prof_cm = jax.profiler.trace(args.profile)
        else:
            import contextlib

            prof_cm = contextlib.nullcontext()
        with prof_cm:
            if args.spec:
                # the speculative loop is one device call: stream the
                # tokens as they come back instead of per-chunk
                out, stats = engine.generate_speculative(
                    tokens, gen, draft_len=args.spec
                )
                for t in out:
                    stream(t)
            else:
                out, stats = engine.generate(tokens, gen, stream=stream)
        stats.load_s = load_s
        sys.stderr.write("\n")
        if args.greedy and not args.no_perf:
            # the reference prints perf after greedy runs (tinyllama.cpp:439)
            sys.stdout.write(
                perf_report(stats, engine.params, engine.new_cache(1))
            )
            if args.spec and stats.decode_token_times:
                nv = stats.decode_token_times[0]
                sys.stdout.write(
                    f" speculative : {stats.generated_tokens} tokens / "
                    f"{nv} verify forwards = "
                    f"{stats.generated_tokens / max(1, nv):.2f} tok per "
                    f"weight-stream (draft K={args.spec})\n"
                )
        if args.profile:
            # per-module *device-time* breakdown — the print_perf
            # linear/attention/other buckets (tinyllama.cpp:565-581) fed
            # by trace events instead of RAII wall-clock timers
            from tinyllama_tpu.runtime import trace

            try:
                events = trace.parse_device_events(args.profile)
                rep = trace.bucket_report(
                    events, steps=max(1, stats.generated_tokens)
                )
                sys.stdout.write(trace.format_bucket_table(rep))
            except FileNotFoundError:
                sys.stderr.write(
                    f"[profile] no trace files found under {args.profile}\n"
                )

    if args.prompt:
        run_once(args.prompt)
    else:
        print("Chat interface. Write your prompt and press enter to submit. "
              "Enter q or press ctrl+c to quit.")
        while True:
            try:
                sys.stderr.write("\n\n[You]: ")
                sys.stderr.flush()
                prompt = input()
            except (EOFError, KeyboardInterrupt):
                break
            if prompt == "q":
                break
            sys.stderr.write("\n[Tinyllama-Chat]: \n\n")
            run_once(prompt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
