"""Randomized-shape codec round-trips and gten parser robustness.

The reference's only guard is runtime asserts (SURVEY.md §4); here the
codec is exercised over randomized shapes/values (including the edge
cases its math must handle exactly: zero blocks, absmax-saturating
values, denormal-scale magnitudes) and the .gten parser over corrupted
inputs, which must fail loudly, never misparse.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.quant.codec import (
    BLOCK_SIZE,
    dequantize,
    np_dequantize_q4_unpacked,
    np_dequantize_q8,
    np_quantize_q4,
    np_quantize_q8,
    quantize,
)

RNG = np.random.default_rng(7)


def _cases():
    # q4 requires d_in % 64 == 0 (group-planar nibble packing)
    shapes = [(1, 64), (3, 192), (8, 512), (5, 1600), (2, 2048)]
    scales = [1e-8, 1e-3, 1.0, 3e3]
    return [(s, sc) for s in shapes for sc in scales]


@pytest.mark.parametrize("shape,scale", _cases())
@pytest.mark.parametrize("kind", ["q8", "q4"])
def test_codec_roundtrip_matches_numpy_oracle(shape, scale, kind):
    w = (RNG.standard_normal(shape) * scale).astype(np.float32)
    # inject exact-zero blocks and saturating values
    w[0, :BLOCK_SIZE] = 0.0
    w[-1, -1] = scale * 8

    qt = quantize(jnp.asarray(w), kind, layout="nk")
    got = np.asarray(dequantize(qt, jnp.float32))
    if kind == "q8":
        data, deltas = np_quantize_q8(w)
        want = np_dequantize_q8(data, deltas)
    else:
        vals, deltas = np_quantize_q4(w)
        want = np_dequantize_q4_unpacked(vals, deltas)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("kind", ["q8", "q4"])
def test_kn_layout_same_values(kind):
    for shape in [(4, 128), (6, 320), (2, 1024)]:
        w = (RNG.standard_normal(shape)).astype(np.float32)
        nk = dequantize(quantize(jnp.asarray(w), kind, layout="nk"))
        kn = dequantize(quantize(jnp.asarray(w), kind, layout="kn"))
        np.testing.assert_array_equal(np.asarray(nk), np.asarray(kn).T)


def _tiny_gten_bytes():
    from tinyllama_tpu.config import tiny_test_config
    from tinyllama_tpu.io.checkpoint import save_gten_checkpoint
    from tinyllama_tpu.models import llama
    import tempfile
    from pathlib import Path

    cfg = tiny_test_config()
    dense = llama.init_dense_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "t.gten"
        save_gten_checkpoint(p, cfg, dense, "q8")
        return cfg, p.read_bytes()


@pytest.fixture(scope="module")
def tiny_gten():
    return _tiny_gten_bytes()


@pytest.mark.parametrize("mutate", [
    "truncate_half", "truncate_1", "bad_magic", "zero_len", "garbage_tail",
])
def test_gten_parser_rejects_corruption(tiny_gten, mutate, tmp_path):
    from tinyllama_tpu.io import gten

    cfg, data = tiny_gten
    if mutate == "truncate_half":
        data = data[: len(data) // 2]
    elif mutate == "truncate_1":
        data = data[:-1]
    elif mutate == "bad_magic":
        data = b"\x00" * 8 + data[8:]
    elif mutate == "zero_len":
        data = data[:8] + b"\x00\x00\x00\x00" + data[12:]
    elif mutate == "garbage_tail":
        data = data + b"\xde\xad\xbe\xef" * 4
    p = tmp_path / "bad.gten"
    p.write_bytes(data)
    with pytest.raises((ValueError, AssertionError, IndexError,
                        Exception)):
        gten.read_gten(p, cfg)


def test_gten_parser_accepts_clean_file(tiny_gten, tmp_path):
    from tinyllama_tpu.io import gten

    cfg, data = tiny_gten
    p = tmp_path / "ok.gten"
    p.write_bytes(data)
    dtype, flat = gten.read_gten(p, cfg)
    assert dtype == "q8" and "embed" in flat and "lm_head" in flat
