"""Fused SwiGLU FFN kernel vs the separate gateup/silu/mul/down path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import tiny_test_config
from tinyllama_tpu.ops.pallas.ffn_fused import ffn_fused, ffn_fused_eligible
from tinyllama_tpu.quant.codec import quantize

# shapes exercising multiple gate/up column tiles and down K-tiles
CFG = tiny_test_config(n_embd=256, n_ffn=1024)


@pytest.mark.parametrize("kind", ["q4", "q8", "q4g"])
@pytest.mark.parametrize("M", [1, 8, 17, 32])  # >8 = tile-dequant body
def test_fused_matches_separate(kind, M):
    key = jax.random.PRNGKey(0)
    L, D, F = 3, CFG.n_embd, CFG.n_ffn
    wgu = quantize(
        jax.random.normal(key, (L, 2 * F, D), jnp.float32) * 0.05,
        kind, layout="kn",
    )
    wdown = quantize(
        jax.random.normal(jax.random.fold_in(key, 1), (L, D, F),
                          jnp.float32) * 0.05,
        kind, layout="kn",
    )
    h = (jax.random.normal(jax.random.fold_in(key, 2), (1, M, D),
                           jnp.float32) * 0.3).astype(jnp.bfloat16)
    assert ffn_fused_eligible(CFG, wgu, wdown, M)

    for li in range(L):
        got = ffn_fused(h, wgu, wdown, jnp.int32(li), CFG)

        from tinyllama_tpu.quant.codec import QTensor, dequantize

        gu_l = QTensor(wgu.data[li], wgu.scales[li], kind, "kn")
        wd_l = QTensor(wdown.data[li], wdown.scales[li], kind, "kn")
        gu = jnp.einsum(
            "btk,kn->btn", h.astype(jnp.float32),
            dequantize(gu_l, jnp.float32),
        )
        gate, up = gu[..., :F], gu[..., F:]
        act = jax.nn.silu(gate) * up
        want = jnp.einsum(
            "btf,fd->btd", act, dequantize(wd_l, jnp.float32)
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            rtol=3e-2, atol=3e-2,
        )


def test_eligibility_gates():
    wgu = quantize(jnp.zeros((2, 2 * CFG.n_ffn, CFG.n_embd)), "q4",
                   layout="kn")
    wd = quantize(jnp.zeros((2, CFG.n_embd, CFG.n_ffn)), "q4", layout="kn")
    assert ffn_fused_eligible(CFG, wgu, wd, 8)
    assert not ffn_fused_eligible(CFG, wgu, wd, 64)  # big M -> prefill path
    assert not ffn_fused_eligible(CFG, jnp.zeros((2, 4, 4)), wd, 1)
