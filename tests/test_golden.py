"""Real-weight golden-token fixture.

The reference documents an exact greedy oracle for TinyLlama-1.1B-Chat
fp16 (/root/reference/tinyllama.cpp:95-104): the chat-templated prompt
"Who is Karl Marx?" must greedily continue with a specific token-id
sequence. This box has zero network egress, so the real checkpoint is
unavailable — the test auto-skips today and fires automatically the day
``models/tinyllama.fp16.gten`` lands (tools/real_weight_validate.py runs
the same check plus perplexity deltas in one command).
"""

from pathlib import Path

import pytest

# chat template applied to "Who is Karl Marx?" (tinyllama.cpp:101-102)
GOLDEN_PROMPT_TOKENS = [
    1, 32001, 1404, 13, 22110, 338, 8425, 28579, 29973, 32002, 29871, 13,
    32001, 20255, 13,
]
# expected greedy continuation, fp16 weights (tinyllama.cpp:103-104)
GOLDEN_OUTPUT_TOKENS = [
    24115, 29880, 28579, 338, 263, 5332, 8578, 359, 13434, 322, 7766, 391,
    1058, 338, 5545, 697, 310, 278, 1556, 4100, 13994, 297, 278, 5849, 310,
    28579, 391, 6368, 322, 6944,
]

CKPT = Path(__file__).resolve().parent.parent / "models" / "tinyllama.fp16.gten"


@pytest.mark.skipif(
    not CKPT.exists(),
    reason=f"real weights unavailable (no egress); drop the checkpoint at "
           f"{CKPT} to activate",
)
def test_karl_marx_golden_tokens():
    from tinyllama_tpu.config import POLICIES, TINYLLAMA_1_1B, GenerationConfig
    from tinyllama_tpu.io.checkpoint import load_gten_checkpoint
    from tinyllama_tpu.runtime.engine import Engine

    params, policy = load_gten_checkpoint(CKPT, TINYLLAMA_1_1B, POLICIES["f16"])
    engine = Engine(TINYLLAMA_1_1B, policy, params)
    gen = GenerationConfig(
        n_predict=len(GOLDEN_PROMPT_TOKENS) + len(GOLDEN_OUTPUT_TOKENS),
        greedy=True, eos_token=2,
    )
    out, _ = engine.generate(GOLDEN_PROMPT_TOKENS, gen)
    assert out == GOLDEN_OUTPUT_TOKENS


def test_golden_prompt_matches_chat_template():
    """The embedded prompt ids must equal our tokenizer+template encoding
    (runs today: only needs tokenizer.bin, not weights)."""
    tok_path = Path("/root/reference/tokenizer.bin")
    if not tok_path.exists():
        pytest.skip("reference tokenizer.bin not present")
    from tinyllama_tpu.io.tokenizer import Tokenizer

    tok = Tokenizer(str(tok_path))
    assert tok.encode("Who is Karl Marx?") == GOLDEN_PROMPT_TOKENS
