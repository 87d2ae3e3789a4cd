"""HF tokenizer.json byte-level BPE reader vs the `tokenizers` library.

No Llama-3 tokenizer.json can be downloaded here (zero egress), so the
test trains a small byte-level BPE with the exact Llama-3 pre-tokenizer
stack (Split(llama3 regex) + ByteLevel) using the HF `tokenizers`
library, saves it as tokenizer.json, and demands our self-contained
reader produce identical ids and round-trip text.
"""

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tinyllama_tpu.io.hf_tokenizer import (  # noqa: E402
    LLAMA3_SPLIT, HFTokenizer, load_tokenizer,
)

CORPUS = (
    "Karl Marx was a German philosopher, economist and political theorist. "
    "The quick brown fox jumps over the lazy dog 1234567890 times!\n"
    "TPUs multiply matrices efficiently — die Königin sagte "
    "überüberraschung. 你好世界! def f(x):\n"
    "    return x ** 2  # comment\n"
) * 4

SPECIALS = [
    "<|begin_of_text|>", "<|end_of_text|>", "<|eot_id|>",
    "<|start_header_id|>", "<|end_header_id|>",
]


@pytest.fixture(scope="module")
def tok_file(tmp_path_factory):
    from tokenizers import Regex, Tokenizer, decoders, models
    from tokenizers import pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_SPLIT), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=420,
        special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator([CORPUS], trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return path


CASES = [
    "Who is Karl Marx?",
    "The quick brown fox jumps over the lazy dog",
    "  leading spaces and\nnewlines\n\n",
    "numbers 1234567890 and punctuation!!! ...",
    "Königin überraschung 你好",
    "def f(x):\n    return x ** 2",
    "",
]


@pytest.mark.parametrize("text", CASES)
def test_encode_matches_tokenizers_library(tok_file, text):
    from tokenizers import Tokenizer

    lib = Tokenizer.from_file(str(tok_file))
    ours = HFTokenizer(tok_file)
    assert ours.encode_raw(text) == lib.encode(text).ids, text


@pytest.mark.parametrize("text", CASES)
def test_decode_round_trips(tok_file, text):
    ours = HFTokenizer(tok_file)
    assert ours.decode_ids(ours.encode_raw(text)) == text


def test_chat_template_structure(tok_file):
    t = HFTokenizer(tok_file)
    ids = t.encode("hello")
    assert ids[0] == t.bos
    assert t.special["<|start_header_id|>"] in ids
    assert t.eot in ids
    # template ends with the assistant header, ready for generation
    text = t.decode_ids(ids)
    assert text.startswith("<|begin_of_text|><|start_header_id|>user")
    assert text.endswith("<|end_header_id|>\n\n")
    assert t.eos == t.eot


def test_streaming_decode_matches_sequence(tok_file):
    t = HFTokenizer(tok_file)
    ids = t.encode_raw("The quick brown fox, 42 times!")
    joined = b"".join(t.decode(0, i) for i in ids).decode("utf-8")
    assert joined == t.decode_ids(ids)


def test_load_tokenizer_dispatch(tok_file):
    assert isinstance(load_tokenizer(tok_file), HFTokenizer)
    from tinyllama_tpu.io.tokenizer import Tokenizer as BinTok

    assert isinstance(
        load_tokenizer("/root/reference/tokenizer.bin"), BinTok
    )
