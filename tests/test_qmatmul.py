"""Pallas dequant-matmul kernel vs jnp fallback (interpret mode on CPU).

Two kernel variants (ops/pallas/qmatmul.py): the decode path (M <= 8)
keeps integer-exact block values on the MXU and applies scales to the
partial products (more precise than bf16-dequantized weights); the
prefill path dequantizes tiles to the compute dtype like the fallback.
Both must match an f32-dequant reference to accumulation-order noise,
and the bf16 fallback to bf16 weight-rounding noise.
"""

import jax
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


@pytest.mark.parametrize("kind", ["q8", "q4", "q4g"])
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
    if kind == "q4g" and K % 128:
        pytest.skip("q4g requires K % 128 == 0")
    x, qt = _mk(kind, M, K, N)
    ref_f32 = jnp.einsum(
        "mk,kn->mn", x.astype(jnp.float32), codec.dequantize(qt, jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ref_bf16 = jnp.einsum(
        "mk,kn->mn", x, codec.dequantize(qt, jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = qmatmul(x, qt, out_dtype=jnp.float32, interpret=True)
    assert out.shape == (M, N)
    scale = float(jnp.abs(ref_f32).max()) + 1e-9
    # decode variant (M<=8) is f32-exact modulo accumulation order;
    # prefill variant rounds weights to bf16 like the fallback
    if M <= 8:
        assert float(jnp.abs(out - ref_f32).max()) / scale < 1e-4
    else:
        assert float(jnp.abs(out - ref_bf16).max()) / scale < 1e-4
    assert float(jnp.abs(out - ref_bf16).max()) / scale < 2e-2


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


def test_prefill_variant_exact_vs_fallback_single_ktile():
    """Prefill kernel (M>8), one K-tile: same bf16 dequant + one dot as
    the fallback -> bit-exact match."""
    x, qt = _mk("q4", 16, 512, 256)
    ref = jnp.einsum(
        "mk,kn->mn", x, codec.dequantize(qt, jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = qmatmul(x, qt, out_dtype=jnp.float32, bm=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_decode_variant_beats_bf16_dequant_precision():
    """The decode path keeps integer-exact products and f32 block scaling
    (reference ops.h:249-287 structure): it must be at least as close to
    the f64 oracle as the bf16-dequant fallback."""
    rng = np.random.default_rng(3)
    K, N = 1024, 256
    w = rng.standard_normal((N, K)) * 0.05
    qt = codec.quantize(jnp.asarray(w, jnp.float32), "q4", layout="kn")
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    oracle = np.asarray(x, np.float64) @ np.asarray(
        codec.dequantize(qt, jnp.float32), np.float64
    )
    out = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32, interpret=True))
    fb = np.asarray(
        jnp.einsum(
            "mk,kn->mn", x, codec.dequantize(qt, jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    err_kernel = np.abs(out - oracle).max()
    err_fb = np.abs(fb - oracle).max()
    assert err_kernel <= err_fb * 1.05, (err_kernel, err_fb)


@pytest.mark.parametrize("kind", ["q8", "q4"])
def test_aq8_activation_quantized_dots(kind):
    """aq8 quantizes activations per 32-block to int8 (the reference's q8
    activation scheme) and runs integer dots; error vs the f32 oracle is
    bounded by the activation quantization step (~1%)."""
    x, qt = _mk(kind, 4, 512, 256, seed=9)
    ref = jnp.einsum(
        "mk,kn->mn", x.astype(jnp.float32), codec.dequantize(qt, jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = qmatmul(x, qt, out_dtype=jnp.float32, aq8=True, interpret=True)
    scale = float(jnp.abs(ref).max()) + 1e-9
    rel = float(jnp.abs(out - ref).max()) / scale
    assert rel < 3e-2, rel
    # and it must differ from the weight-only path (sanity that the flag
    # actually switches the math)
    wo = qmatmul(x, qt, out_dtype=jnp.float32, aq8=False, interpret=True)
    assert not np.array_equal(np.asarray(out), np.asarray(wo))


def test_lm_head_vocab_pad_exact():
    """pad_lm_head_vocab must leave logits bit-identical: zero scales null
    the pad columns (q4's -7 offset is scale-multiplied) and
    lm_head_logits slices back to the embedding's vocab size."""
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import DtypePolicy, tiny_test_config
    from tinyllama_tpu.models import llama

    # ragged vocab like the real model's 32003
    cfg = tiny_test_config(n_vocab=515)
    for kind in ("q4", "q8"):
        policy = DtypePolicy(kind, "f32", "f32")
        params = llama.convert_params(
            llama.init_dense_params(cfg, jax.random.PRNGKey(0)), policy
        )
        padded = llama.pad_lm_head_vocab(params, multiple=512)
        assert padded["lm_head"].data.shape[-1] == 1024
        h = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.n_embd),
                              jnp.float32)
        want = llama.lm_head_logits(params, h, use_pallas=True)
        got = llama.lm_head_logits(padded, h, use_pallas=True)
        assert got.shape == (3, cfg.n_vocab)
        import numpy as np

        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
