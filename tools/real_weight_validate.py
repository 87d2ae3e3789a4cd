"""One-command real-weight validation (runs the day weights land).

This box has zero egress, so the real TinyLlama checkpoints can't be
fetched; everything here is wired and waiting. Given a real
``models/tinyllama.fp16.gten`` (and optionally the q8/q4 files) it:

1. runs the Karl-Marx golden greedy fixture — the reference's own exact
   token-id oracle (/root/reference/tinyllama.cpp:95-104; also embedded
   in tests/test_golden.py, which auto-activates on the same file),
2. reports perplexity deltas f16 vs q8 vs q4 on a real-text paragraph
   (random-weight deltas are machinery checks only; these are the real
   quality numbers),
3. optionally cross-checks greedy output against the compiled reference
   binary via tools/parity_check.py.

Usage:
    python tools/real_weight_validate.py [--ckpt-dir models] [--platform tpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", default="models")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tokenizer", default="/root/reference/tokenizer.bin")
    ap.add_argument("--skip-ppl", action="store_true")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    ckpt_dir = Path(args.ckpt_dir)
    fp16 = ckpt_dir / "tinyllama.fp16.gten"
    if not fp16.exists():
        print(f"SKIP: no real checkpoint at {fp16} (zero-egress box); "
              "download tinyllama.fp16.gten there to run validation")
        return 0

    from tests.test_golden import GOLDEN_OUTPUT_TOKENS, GOLDEN_PROMPT_TOKENS
    from tinyllama_tpu.config import POLICIES, TINYLLAMA_1_1B, GenerationConfig
    from tinyllama_tpu.io.checkpoint import load_gten_checkpoint
    from tinyllama_tpu.runtime.engine import Engine

    print(f"[1/2] golden greedy fixture ({fp16}) ...")
    params, policy = load_gten_checkpoint(fp16, TINYLLAMA_1_1B,
                                          POLICIES["f16"])
    engine = Engine(TINYLLAMA_1_1B, policy, params)
    gen = GenerationConfig(
        n_predict=len(GOLDEN_PROMPT_TOKENS) + len(GOLDEN_OUTPUT_TOKENS),
        greedy=True, eos_token=2,
    )
    out, _ = engine.generate(GOLDEN_PROMPT_TOKENS, gen)
    if out == GOLDEN_OUTPUT_TOKENS:
        print("  PASS: greedy output token-identical to the reference "
              "oracle (tinyllama.cpp:103-104)")
    else:
        div = next(
            (i for i, (a, b) in enumerate(zip(out, GOLDEN_OUTPUT_TOKENS))
             if a != b),
            min(len(out), len(GOLDEN_OUTPUT_TOKENS)),
        )
        print(f"  FAIL: diverges at position {div}: got {out[:div + 3]}...")
        return 1

    if args.skip_ppl:
        return 0

    print("[2/2] perplexity deltas f16 / q8 / q4 ...")
    from tools.eval_ppl import main as ppl_main

    rc = ppl_main([
        "--ckpt", str(fp16), "--compare", "f16,q8,q4",
        "--tokenizer", args.tokenizer,
        *(("--platform", args.platform) if args.platform else ()),
    ])
    if rc:
        return rc
    print("done: golden PASS + ppl deltas above (expect q8 within ~0.5% "
          "and q4 within ~2% of f16 on real weights)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
