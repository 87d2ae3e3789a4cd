"""Tokenizer parity tests against golden fixtures embedded in the reference
(tinyllama.cpp:85-104 and tokenizer.h:287-311)."""

from pathlib import Path

import pytest

from tinyllama_tpu.io.tokenizer import (
    POST_PROMPT_TOKENS,
    PRE_PROMPT_TOKENS,
    Tokenizer,
)

TOKENIZER_BIN = Path("/root/reference/tokenizer.bin")

pytestmark = pytest.mark.skipif(
    not TOKENIZER_BIN.exists(), reason="reference tokenizer.bin not available"
)


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(TOKENIZER_BIN)


# Golden fixture: tinyllama.cpp:101-102
KARL_MARX_PROMPT = "Who is Karl Marx?"
KARL_MARX_TOKENS = [1, 32001, 1404, 13, 22110, 338, 8425, 28579, 29973,
                    32002, 29871, 13, 32001, 20255, 13]


def test_karl_marx_golden_encode(tok):
    assert tok.encode(KARL_MARX_PROMPT) == KARL_MARX_TOKENS


def test_template_frame(tok):
    toks = tok.encode("hi")
    assert tuple(toks[:2]) == PRE_PROMPT_TOKENS
    assert tuple(toks[-6:]) == POST_PROMPT_TOKENS


def test_token_table_fixture(tok):
    """Token table from the reference comment (tinyllama.cpp:89-99)."""
    assert tok.piece_to_id[b"\n".replace(b"\n", b"<0x0A>")] == 13
    # 'user' piece appears at the start of the template body: encode_raw("user\n")
    assert tok.encode_raw("user\n")[:2] == [1404, 13]


def test_decode_karl_marx_output(tok):
    """Decode fixture from tokenizer.h:300-307."""
    toks = [1, 24115, 29880, 28579, 313, 29896, 29947, 29896, 29900, 297,
            5115, 29892, 9556, 448, 29871, 29896, 29947, 29947, 29941]
    text = tok.decode_sequence(toks[1:], prev=toks[0])
    assert text == "Karl Marx (1810 in Berlin, Germany - 1883"


def test_decode_strips_space_after_bos(tok):
    tid = tok.piece_to_id[b" Karl"]
    assert tok.decode(1, tid) == b"Karl"
    assert tok.decode(0, tid) == b" Karl"


def test_byte_token_decode(tok):
    assert tok.decode(0, 13) == b"\n"  # <0x0A>


def test_byte_fallback_encoding(tok):
    # A codepoint unlikely to be in the 32k vocab -> encoded as bytes+3
    text = "\U0001f600"  # emoji, 4 UTF-8 bytes
    toks = tok.encode_raw(text)
    raw = text.encode("utf-8")
    assert toks[1:] == [b + 3 for b in raw]


def test_empty_prompt(tok):
    # template still applies; "user\n" body still encoded
    toks = tok.encode("")
    assert tuple(toks[:2]) == PRE_PROMPT_TOKENS
    assert tuple(toks[-6:]) == POST_PROMPT_TOKENS


def test_encode_decode_roundtrip(tok):
    text = "The quick brown fox jumps over the lazy dog! 123"
    toks = tok.encode_raw(text)
    assert tok.decode_sequence(toks, prev=1) == text
