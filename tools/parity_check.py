"""Greedy-output parity check against the reference C++ engine.

The reference (/root/reference) is CPU-only C++17 with no external deps,
so it can be compiled and run right here — no network, no published
checkpoint needed: both engines consume the same locally generated
random-weight .gten file and must produce the same greedy continuation
(BASELINE.md north star: token-identical greedy output at matching
bit-width; the fp16 mode has no quantization noise, so text must match
exactly modulo late-sequence accumulation-order drift).

Usage:
    python tools/parity_check.py [--dtype fp16|q8|q4] [--npred 16]
        [--prompt "..."] [--workdir /tmp/parity] [--model tiny-ref]

Notes:
  * `--model tiny-ref` is rejected — the reference hardcodes
    TinyLlama-1.1B's hyperparameters (tinyllama.cpp:12-20), so parity
    runs use the full-size architecture with random weights (~2.2GB
    fp16 file; the reference needs ~1-2 s/token on one CPU core).
  * The reference streams decoded text to stderr and the perf table to
    stdout (tinyllama.cpp:432/506 vs 565-581); we compare the stderr
    text after the prompt echo.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

if str(REPO) not in sys.path:  # allow `python tools/parity_check.py`
    sys.path.insert(0, str(REPO))


def build_reference(workdir: Path) -> Path:
    """Compile the reference engine (AVX/F16C when the host has them)."""
    exe = workdir / "tinyllama"
    if exe.exists():
        return exe
    flags = ["-std=c++17", "-O3", "-fopenmp"]
    cpuinfo = Path("/proc/cpuinfo").read_text()
    if " avx " in cpuinfo or " avx2 " in cpuinfo:
        flags += ["-mavx"]
        if " f16c " in cpuinfo:
            flags += ["-mf16c"]
    cmd = ["g++", *flags, str(REFERENCE / "tinyllama.cpp"), "-o", str(exe)]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REFERENCE)
    return exe


def generate_checkpoint(workdir: Path, dtype: str, seed: int) -> Path:
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import TINYLLAMA_1_1B
    from tinyllama_tpu.io.checkpoint import save_gten_checkpoint
    from tinyllama_tpu.models import llama

    out = workdir / "models" / f"tinyllama.{dtype}.gten"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    print(f"generating random {dtype} checkpoint at {out} ...", flush=True)
    with jax.default_device(jax.devices("cpu")[0]):
        dense = llama.init_dense_params(
            TINYLLAMA_1_1B, jax.random.PRNGKey(seed), jnp.float32
        )
        save_gten_checkpoint(out, TINYLLAMA_1_1B, dense, dtype)
    return out


def run_reference(exe: Path, workdir: Path, dtype: str, prompt: str,
                  npred: int, seed: int) -> str:
    # the reference run is expensive on this host — cache its output per
    # (dtype, npred, prompt, seed)
    key = f"{dtype}.{npred}.{seed}.{abs(hash(prompt)) % 10**10}"
    cache = workdir / f"ref_out.{key}.txt"
    if cache.exists():
        print(f"using cached reference output {cache}", flush=True)
        return cache.read_text()
    for aux in ("tokenizer.bin", "model_dl.py"):
        if not (workdir / aux).exists():
            shutil.copy(REFERENCE / aux, workdir / aux)
    flag = {"fp16": "-f16", "q8": "-q8", "q4": "-q4"}[dtype]
    cmd = [str(exe), flag, "-p", prompt, "-greedy", "--npred", str(npred)]
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(
        cmd, cwd=workdir, capture_output=True, text=True, timeout=14400
    )
    if proc.returncode != 0:
        print(proc.stdout)
        print(proc.stderr)
        raise RuntimeError(f"reference exited {proc.returncode}")
    # generated text streams to stderr; strip the trailing newline the
    # REPL prints after generation
    cache.write_text(proc.stderr)
    return proc.stderr


def run_ours(ckpt: Path, dtype: str, prompt: str, npred: int,
             emulate: bool = True) -> str:
    from tinyllama_tpu.config import (
        DtypePolicy, GenerationConfig, TINYLLAMA_1_1B,
    )
    from tinyllama_tpu.io.checkpoint import load_gten_checkpoint
    from tinyllama_tpu.io.tokenizer import Tokenizer
    from tinyllama_tpu.runtime.engine import Engine

    # match the reference's activation storage per mode: fp16 keeps f16
    # activations (tinyllama.cpp:258-265); quantized modes use q8
    # activations — run the exact-numerics emulation
    # (models/ref_parity.py) for token-identical q8/q4 comparison, or
    # the production engine (bf16 activations) with --no-emulate.
    policy = {
        "fp16": DtypePolicy("f16", "f16", "f16"),
        "q8": DtypePolicy("q8", "bf16", "bf16"),
        "q4": DtypePolicy("q4", "bf16", "bf16"),
    }[dtype]
    cfg = TINYLLAMA_1_1B
    params, _ = load_gten_checkpoint(ckpt, cfg, policy)
    tok = Tokenizer(REFERENCE / "tokenizer.bin")
    ids = tok.encode(prompt)
    if dtype in ("q8", "q4") and emulate:
        from tinyllama_tpu.models.ref_parity import (
            greedy_generate_ref_numerics,
        )

        out_ids = greedy_generate_ref_numerics(
            cfg, params, ids, npred, eos=tok.eos
        )
        return tok.decode_sequence(out_ids)
    engine = Engine(cfg, policy, params)
    gen = GenerationConfig(n_predict=npred, greedy=True)
    out_ids, _ = engine.generate(ids, gen)
    # stream semantics: the first generated piece decodes with prev=BOS
    # (tinyllama.cpp:431 `prev_token = (i == 0) ? 1 : tokens.back()`)
    return tok.decode_sequence(out_ids)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dtype", default="fp16", choices=("fp16", "q8", "q4"))
    ap.add_argument("--npred", type=int, default=32,
                    help="generation budget INCLUDING the prompt tokens. "
                    "Must be >= 32: the reference sizes its context to "
                    "npred (tinyllama.cpp:267) and computes corrupted "
                    "logits below 32 (buffer/block-size assumption; "
                    "verified bit-identical for every n_ctx >= 32)")
    ap.add_argument("--prompt", default="Who is Karl Marx?")
    ap.add_argument("--workdir", default="/tmp/parity")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-emulate", action="store_true",
                    help="q8/q4: compare the production engine (bf16 "
                         "activations) instead of the reference-numerics "
                         "emulation — expect drift after ~10 tokens")
    args = ap.parse_args(argv)
    if args.npred < 32:
        ap.error("--npred must be >= 32 (see help)")

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    exe = build_reference(workdir)
    ckpt = generate_checkpoint(workdir, args.dtype, args.seed)
    ref_text = run_reference(
        exe, workdir, args.dtype, args.prompt, args.npred, args.seed
    ).strip("\n")
    our_text = run_ours(
        ckpt, args.dtype, args.prompt, args.npred,
        emulate=not args.no_emulate,
    ).strip("\n")

    print(f"\nreference: {ref_text!r}")
    print(f"ours     : {our_text!r}")
    if ref_text == our_text:
        print("PARITY OK: greedy outputs identical")
        return 0
    # report longest common prefix for diagnosis
    n = 0
    for a, b in zip(ref_text, our_text):
        if a != b:
            break
        n += 1
    print(f"PARITY MISMATCH after {n} common chars")
    return 1


if __name__ == "__main__":
    sys.exit(main())
