"""C++ native runtime parity tests (skipped if the .so can't build)."""

import numpy as np
import pytest

from tinyllama_tpu import native
from tinyllama_tpu.quant import codec

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

TOKENIZER_BIN = "/root/reference/tokenizer.bin"


def test_tokenizer_encode_parity():
    import pathlib

    if not pathlib.Path(TOKENIZER_BIN).exists():
        pytest.skip("tokenizer.bin unavailable")
    from tinyllama_tpu.io.tokenizer import Tokenizer

    py = Tokenizer(TOKENIZER_BIN, use_native=False)
    nat = Tokenizer(TOKENIZER_BIN, use_native=True)
    assert nat._native is not None
    for text in [
        "Who is Karl Marx?", "user\nhello", "", " ", "a",
        "héllo wörld \U0001f600", "line\nbreaks\n\nhere", "123 456!",
    ]:
        assert py.encode_raw(text) == nat.encode_raw(text), text
        # full chat template path too
        assert py.encode(text) == nat.encode(text), text


def test_q8_deinterleave_parity():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 128)).astype(np.float32)
    q, d = codec.np_quantize_q8(w)
    rec = np.empty(d.size, [("delta", "<f2"), ("q", "i1", (32,))])
    rec["delta"] = d.reshape(-1)
    rec["q"] = q.reshape(-1, 32)
    vals, deltas = native.q8_deinterleave(rec.tobytes(), d.size)
    np.testing.assert_array_equal(vals.reshape(16, 128), q)
    np.testing.assert_array_equal(deltas.reshape(d.shape), d)


def test_q4_gten_to_planar_parity():
    rng = np.random.default_rng(2)
    for d_in in (128, 512, 1024):
        w = rng.standard_normal((8, d_in)).astype(np.float32)
        vals4, d4 = codec.np_quantize_q4(w)
        gten_packed = codec.gten_q4_pack(vals4)
        rec = np.empty(d4.size, [("delta", "<f2"), ("q", "u1", (16,))])
        rec["delta"] = d4.reshape(-1)
        rec["q"] = gten_packed.reshape(-1, 16)
        packed, deltas = native.q4_gten_to_planar(
            rec.tobytes(), 8, d_in, codec.q4_group_size(d_in)
        )
        np.testing.assert_array_equal(packed, codec.tpu_q4_pack(vals4))
        np.testing.assert_array_equal(deltas, d4)
