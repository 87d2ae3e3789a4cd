"""Pallas dequant-matmul kernel vs jnp fallback (interpret mode on CPU).

The kernel dequantizes exactly like quant/codec.dequantize (int->f32,
*scale in f32, round to compute dtype), so outputs must match the fallback
to f32-accumulation reordering noise — and exactly for small K.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.ops.pallas.qmatmul import qmatmul
from tinyllama_tpu.quant import codec


def _mk(kind, M, K, N, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((N, K)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    return x, codec.quantize(w, kind, layout="kn")


@pytest.mark.parametrize("kind", ["q8", "q4"])
@pytest.mark.parametrize(
    "M,K,N",
    [
        (1, 2048, 256),  # decode-shaped
        (7, 512, 300),  # ragged N, sub-tile M
        (130, 1024, 512),  # multi-tile M
        (4, 5632, 128),  # n_ffn-sized K (q4 group 512, 11 K-tiles)
        (2, 64, 64),  # minimum sizes
    ],
)
def test_matches_jnp_dequant_matmul(kind, M, K, N):
    x, qt = _mk(kind, M, K, N)
    ref = jnp.einsum(
        "mk,kn->mn", x, codec.dequantize(qt, jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = qmatmul(x, qt, out_dtype=jnp.float32, interpret=True)
    assert out.shape == (M, N)
    rel = float(jnp.abs(out - ref).max()) / (float(jnp.abs(ref).max()) + 1e-9)
    assert rel < 1e-5, rel


@pytest.mark.parametrize("kind", ["q8", "q4"])
def test_leading_batch_dims(kind):
    x, qt = _mk(kind, 6, 256, 128)
    x3 = x.reshape(2, 3, 256)
    out = qmatmul(x3, qt, interpret=True)
    flat = qmatmul(x, qt, interpret=True)
    assert out.shape == (2, 3, 128)
    np.testing.assert_array_equal(
        np.asarray(out.reshape(6, 128)), np.asarray(flat)
    )


def test_out_dtype_default_is_input_dtype():
    x, qt = _mk("q8", 4, 256, 128)
    assert qmatmul(x, qt, interpret=True).dtype == jnp.bfloat16
    assert qmatmul(x, qt, out_dtype=jnp.float32, interpret=True).dtype == jnp.float32


def test_exact_vs_fallback_single_ktile():
    """One K-tile -> identical accumulation order -> bit-exact match."""
    x, qt = _mk("q4", 8, 512, 256)
    ref = jnp.einsum(
        "mk,kn->mn", x, codec.dequantize(qt, jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = qmatmul(x, qt, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
