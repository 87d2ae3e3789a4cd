"""Perplexity evaluation — the quantization-quality harness.

BASELINE.md's quality gate for the quantized paths is a bounded
perplexity delta vs fp16/f32 on the same text. The reference has no
evaluation tooling at all; this computes token-level perplexity with the
teacher-forced forward (all positions in one prefill pass per window).

Usage:
    python tools/eval_ppl.py --ckpt models/tinyllama.q4.gten --text FILE
    python tools/eval_ppl.py --random-weights --policy q4 --text FILE
    python tools/eval_ppl.py --ckpt ... --compare f16,q8,q4 --text FILE

Prints one JSON line per policy: {"policy", "ppl", "nll", "tokens"}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def window_nll(cfg, policy, params, ids, window: int, use_pallas: bool):
    """Sum of next-token negative log-likelihoods over `ids`, plus the
    per-position greedy argmax ids (for cross-policy top-1 agreement —
    the sharpest quantization-quality signal available without the real
    checkpoint: how often does quantization flip the argmax?)."""
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.models import llama
    from tinyllama_tpu.ops.rope import rope_table
    from tinyllama_tpu.runtime.kvcache import init_cache

    ropes = rope_table(cfg.max_ctx, cfg.d_head, cfg.rope_theta)

    @jax.jit
    def nll_window(params, tokens, n_valid):
        """tokens [1, W+1]: predict tokens[1:] from tokens[:-1]."""
        cache = init_cache(cfg, 1, policy.kv_dtype)
        hidden, _ = llama.forward(
            cfg, policy, params, tokens[:, :-1], cache,
            jnp.zeros((1,), jnp.int32), ropes, use_pallas,
        )
        logits = llama.lm_head_logits(params, hidden[0], use_pallas, policy.aq8)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # clip so tiny-vocab smoke configs don't hit the NaN fill of OOB
        # gathers; real vocabs never clip
        tgt = jnp.clip(tokens[0, 1:], 0, logp.shape[-1] - 1)
        tok_nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        mask = jnp.arange(tok_nll.shape[0]) < n_valid
        return (
            jnp.sum(jnp.where(mask, tok_nll, 0.0)),
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
        )

    import numpy as np

    total, count = 0.0, 0
    argmaxes = []
    step = window
    for start in range(0, max(1, len(ids) - 1), step):
        chunk = ids[start : start + window + 1]
        if len(chunk) < 2:
            break
        n_valid = len(chunk) - 1
        padded = chunk + [0] * (window + 1 - len(chunk))
        nll, am = nll_window(
            params, jnp.asarray([padded], jnp.int32), jnp.int32(n_valid)
        )
        total += float(nll)
        argmaxes.append(np.asarray(am)[:n_valid])
        count += n_valid
    return total, count, np.concatenate(argmaxes) if argmaxes else np.zeros(0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None, help=".gten / HF checkpoint")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--text", default=None,
                    help="UTF-8 text file (default: a built-in paragraph)")
    ap.add_argument("--compare", default=None,
                    help="comma-separated policies to evaluate (each "
                    "re-quantizes from the checkpoint)")
    ap.add_argument("--policy", default="q4")
    ap.add_argument("--model", default="tinyllama-1.1b-chat-v0.4")
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--tokenizer", default="/root/reference/tokenizer.bin")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import math

    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import MODEL_REGISTRY, POLICIES, tiny_test_config
    from tinyllama_tpu.io.tokenizer import Tokenizer
    from tinyllama_tpu.models import llama

    cfg = (tiny_test_config() if args.model == "tiny-test"
           else MODEL_REGISTRY[args.model])

    text = (Path(args.text).read_text() if args.text else
            "Karl Marx was a German philosopher, economist, historian and "
            "political theorist whose work laid the foundation of modern "
            "socialist thought. " * 8)
    tok = Tokenizer(args.tokenizer)
    ids = [1] + tok.encode_raw(text)

    policies = (args.compare.split(",") if args.compare else [args.policy])
    dense = None
    base_argmax = None
    for pname in policies:
        policy = POLICIES[pname]
        if args.random_weights:
            if dense is None:
                dense = llama.init_dense_params(
                    cfg, jax.random.PRNGKey(0), jnp.float32
                )
            params = llama.convert_params(dense, policy)
        else:
            from tinyllama_tpu.io.checkpoint import (
                load_gten_checkpoint, load_hf_checkpoint,
            )

            p = Path(args.ckpt)
            if p.suffix == ".gten":
                try:
                    params, policy = load_gten_checkpoint(p, cfg, policy)
                except ValueError:
                    # fp16 .gten + quantized policy: the loader has no
                    # re-quantization path, so load dense once and
                    # quantize per compared policy
                    if dense is None:
                        dense, _ = load_gten_checkpoint(
                            p, cfg, POLICIES["f32"]
                        )
                    params = llama.convert_params(dense, policy)
            else:
                params = load_hf_checkpoint(p, cfg, policy)
        use_pallas = jax.default_backend() == "tpu" and policy.is_quantized
        if use_pallas:
            # same param prep as the Engine: whole lm_head N-tiles (the
            # ragged 32003 boundary tile at M=window rows overflows the
            # 16M scoped VMEM by a hair)
            params = llama.pad_lm_head_vocab(params)
        nll, n, am = window_nll(
            cfg, policy, params, ids, min(args.window, cfg.max_ctx - 1),
            use_pallas,
        )
        if base_argmax is None:
            base_argmax = am  # first compared policy is the reference
        agree = (
            float((am == base_argmax).mean()) if am.size else 1.0
        )
        print(json.dumps({
            "policy": pname,
            "ppl": round(math.exp(nll / max(n, 1)), 4),
            "nll": round(nll / max(n, 1), 5),
            "top1_agree_vs_first": round(agree, 4),
            "tokens": n,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
