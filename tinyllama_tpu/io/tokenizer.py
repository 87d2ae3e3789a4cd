"""SentencePiece-vocab BPE tokenizer.

Behavioral parity with the reference tokenizer
(/root/reference/tokenizer.h:24-283, itself adapted from karpathy/llama2.c):

* same binary vocab file format: ``[u32 max_token_len]`` then per token
  ``[f32 score][i32 len][len bytes]`` (tokenizer.h:64-85),
* same greedy highest-score pair-merge BPE (tokenizer.h:252-280),
* same dummy-prefix, byte-fallback (``byte + 3``) and UTF-8 codepoint
  grouping (tokenizer.h:197-249),
* same hardcoded ChatML-like chat template: ``[1, 32001]`` + BPE("user\\n" +
  prompt) + ``[32002, 29871, 13, 32001, 20255, 13]`` (tokenizer.h:141-143),
* same decode rules: post-BOS leading-space strip and ``<0xXX>`` raw-byte
  pieces (tokenizer.h:98-112).

Implementation is new (dict-based lookup instead of qsort/bsearch; bytes
instead of C strings). If the optional C++ native extension is built
(native/), encode hot loops can be offloaded; this module is the always-
available pure-Python path.
"""

from __future__ import annotations

import struct
from pathlib import Path

BOS_TOKEN = 1
EOS_TOKEN = 32002  # <|im_end|>, tokenizer.h:26
IM_START = 32001
#: chat template frame, tokenizer.h:141-143
PRE_PROMPT_TOKENS = (BOS_TOKEN, IM_START)
POST_PROMPT_TOKENS = (32002, 29871, 13, 32001, 20255, 13)

VOCAB_SIZE = 32000  # tinyllama.cpp:270


class Tokenizer:
    """BPE tokenizer over a llama2.c-format binary vocab file.

    Encode hot loops run in the C++ native library when available
    (native/tinyllama_native.cpp, bit-identical output); decode and the
    chat template stay in Python.
    """

    eos = EOS_TOKEN

    def __init__(
        self,
        path: str | Path,
        vocab_size: int = VOCAB_SIZE,
        use_native: bool = True,
    ):
        self.vocab_size = vocab_size
        self.vocab: list[bytes] = []
        self.scores: list[float] = []
        data = Path(path).read_bytes()
        (self.max_token_length,) = struct.unpack_from("<I", data, 0)
        off = 4
        for _ in range(vocab_size):
            score, length = struct.unpack_from("<fi", data, off)
            off += 8
            piece = data[off : off + length]
            off += length
            self.vocab.append(piece)
            self.scores.append(score)
        # exact-match lookup (replaces sorted_vocab_ + bsearch,
        # tokenizer.h:128-133). On duplicate pieces keep the first id, which
        # is also what the lowest-address bsearch hit would resolve to for
        # scoring purposes (scores of duplicates are distinct entries; the
        # reference's bsearch picks an unspecified one — vocabs are unique
        # in practice).
        self.piece_to_id: dict[bytes, int] = {}
        for i, piece in enumerate(self.vocab):
            self.piece_to_id.setdefault(piece, i)
        self._byte_pieces = [bytes([b]) for b in range(256)]
        self._native = None
        if use_native:
            try:
                from tinyllama_tpu import native

                if native.available():
                    self._native = native.NativeTokenizerEncoder(
                        path, vocab_size
                    )
            except Exception:
                self._native = None

    # ------------------------------------------------------------------ encode

    def encode_raw(self, text: str | bytes) -> list[int]:
        """BPE-encode raw text with dummy prefix + byte fallback; no chat
        template (tokenizer.h:172-283)."""
        if isinstance(text, str):
            text = text.encode("utf-8")
        if self._native is not None:
            return self._native.encode_raw(text)
        tokens: list[int] = []
        if text:
            tokens.append(self.piece_to_id[b" "])  # dummy prefix, :197-200

        # group bytes into UTF-8 codepoints (≤4 bytes), vocab lookup with
        # byte fallback (:211-249)
        i = 0
        n = len(text)
        while i < n:
            j = i + 1
            # extend while continuation bytes, max 4 total (:218-231)
            while j < n and (text[j] & 0xC0) == 0x80 and (j - i) < 4:
                j += 1
            chunk = text[i:j]
            tid = self.piece_to_id.get(chunk)
            if tid is not None:
                tokens.append(tid)
            else:
                # byte fallback: first 3 vocab entries are <unk>,<s>,</s>
                tokens.extend(b + 3 for b in chunk)
            i = j

        # greedy merge loop: repeatedly merge the adjacent pair whose
        # concatenation has the highest vocab score (:252-280). Like the
        # reference, ties resolve to the leftmost occurrence (strict >).
        vocab, scores, lookup = self.vocab, self.scores, self.piece_to_id
        while True:
            best_score = -1e10
            best_id = -1
            best_idx = -1
            for k in range(len(tokens) - 1):
                merged = vocab[tokens[k]] + vocab[tokens[k + 1]]
                tid = lookup.get(merged)
                if tid is not None and scores[tid] > best_score:
                    best_score = scores[tid]
                    best_id = tid
                    best_idx = k
            if best_idx == -1:
                return tokens
            tokens[best_idx : best_idx + 2] = [best_id]

    def encode(self, prompt: str) -> list[int]:
        """Encode a chat turn with the reference's hardcoded template
        (tokenizer.h:136-169): <|im_start|>user\\nPROMPT<|im_end|>\\n
        <|im_start|>assistant\\n."""
        body = self.encode_raw("user\n" + prompt)
        return [*PRE_PROMPT_TOKENS, *body, *POST_PROMPT_TOKENS]

    # ------------------------------------------------------------------ decode

    def decode(self, prev_token: int, token: int) -> bytes:
        """Piece bytes for `token` given the previous token
        (tokenizer.h:98-112)."""
        if token >= self.vocab_size or token < 0:
            return b""
        piece = self.vocab[token]
        # following BOS, sentencepiece strips one leading whitespace
        if prev_token == BOS_TOKEN and piece.startswith(b" "):
            piece = piece[1:]
        # raw-byte tokens look like '<0x0A>'
        if len(piece) == 6 and piece.startswith(b"<0x") and piece.endswith(b">"):
            try:
                return self._byte_pieces[int(piece[3:5], 16)]
            except ValueError:
                pass
        return piece

    def decode_sequence(self, tokens: list[int], prev: int = BOS_TOKEN) -> str:
        """Decode a full token sequence to text (UTF-8, replacing errors)."""
        out = bytearray()
        for t in tokens:
            out += self.decode(prev, t)
            prev = t
        return out.decode("utf-8", errors="replace")


def safe_piece(piece: bytes) -> bytes:
    """Filter single-byte non-printable pieces like the reference's
    safe_printf (tokenizer.h:114-126)."""
    if len(piece) == 1:
        b = piece[0]
        if not (32 <= b < 127 or b in (9, 10, 13, 11, 12)):
            return b""
    return piece
