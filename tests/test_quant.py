"""Quant codec tests: round-trip accuracy, parity with the reference's
quantizer math (tinyllama_to_gten.py:24-91), and layout conversions."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyllama_tpu.quant import codec


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


# ---- reference math oracle: replicate torch round-trip exactly in numpy ----


def torch_style_q8(w):
    """Independent re-derivation of q8_quantize (tinyllama_to_gten.py:24-51)
    using torch itself, as the strongest available oracle."""
    import torch

    t = torch.from_numpy(w).to(torch.float32)
    d_out, d_in = t.shape
    nb = d_in // 32
    t = t.reshape(nb * d_out, 32)
    absmax = t.abs().amax(dim=1)
    deltas = (absmax / 127.0).to(torch.float32)
    scalars = deltas.clone()
    nz = scalars != 0
    scalars[nz] = 1.0 / scalars[nz]
    q = torch.round(t * scalars.view(-1, 1)).to(torch.int8)
    return (
        q.reshape(d_out, d_in).numpy(),
        deltas.to(torch.float16).reshape(d_out, nb).numpy(),
    )


def torch_style_q4(w):
    import torch

    t = torch.from_numpy(w).to(torch.float32)
    d_out, d_in = t.shape
    nb = d_in // 32
    t = t.reshape(nb * d_out, 32)
    absmax = t.abs().amax(dim=1)
    deltas = (absmax / 7.0).to(torch.float32)
    scalars = deltas.clone()
    nz = scalars != 0
    scalars[nz] = 1.0 / scalars[nz]
    q = (torch.round(t * scalars.view(-1, 1)) + 7).to(torch.uint8)
    assert q.max() <= 14 and q.min() >= 0
    return (
        q.reshape(d_out, d_in).numpy(),
        deltas.to(torch.float16).reshape(d_out, nb).numpy(),
    )


class TestQ8:
    def test_matches_torch_oracle(self):
        w = _rand((8, 64), seed=1)
        q_ref, d_ref = torch_style_q8(w)
        q_np, d_np = codec.np_quantize_q8(w)
        np.testing.assert_array_equal(q_np, q_ref)
        np.testing.assert_array_equal(d_np, d_ref)

    def test_jnp_matches_numpy(self):
        w = _rand((16, 128), seed=2)
        qt = codec.quantize_q8(jnp.asarray(w))
        q_np, d_np = codec.np_quantize_q8(w)
        np.testing.assert_array_equal(np.asarray(qt.data), q_np)
        np.testing.assert_array_equal(
            np.asarray(qt.scales), d_np.astype(np.float32)
        )

    def test_roundtrip_error_bound(self):
        w = _rand((32, 256), seed=3, scale=2.0)
        qt = codec.quantize_q8(jnp.asarray(w))
        deq = np.asarray(codec.dequantize(qt))
        # max error per element is delta/2; delta = absmax/127
        blocks = w.reshape(-1, 32)
        max_delta = (np.abs(blocks).max(axis=-1) / 127.0).max()
        assert np.abs(deq - w).max() <= max_delta * 0.51 + 1e-6

    def test_zero_block(self):
        w = np.zeros((2, 64), np.float32)
        qt = codec.quantize_q8(jnp.asarray(w))
        assert np.all(np.asarray(qt.data) == 0)
        np.testing.assert_array_equal(np.asarray(codec.dequantize(qt)), w)


class TestQ4:
    def test_matches_torch_oracle(self):
        w = _rand((8, 64), seed=4)
        q_ref, d_ref = torch_style_q4(w)
        q_np, d_np = codec.np_quantize_q4(w)
        np.testing.assert_array_equal(q_np, q_ref)
        np.testing.assert_array_equal(d_np, d_ref)

    def test_gten_pack_unpack_roundtrip(self):
        w = _rand((4, 128), seed=5)
        vals, _ = codec.np_quantize_q4(w)
        packed = codec.gten_q4_pack(vals)
        np.testing.assert_array_equal(codec.gten_q4_unpack(packed), vals)

    def test_gten_pack_matches_torch_layout(self):
        """gten_q4_pack must produce exactly the reference's byte layout
        (tinyllama_to_gten.py:83-89)."""
        import torch

        w = _rand((4, 64), seed=6)
        vals, _ = codec.np_quantize_q4(w)
        t = torch.from_numpy(vals.reshape(-1, 32)).view(-1, 2, 16)
        t0, t1 = t[:, 0], t[:, 1]
        ref_packed = ((t0 << 4) | (t1 & 0x0F)).reshape(4, 32).numpy()
        np.testing.assert_array_equal(codec.gten_q4_pack(vals), ref_packed)

    def test_tpu_pack_unpack_roundtrip(self):
        w = _rand((4, 128), seed=7)
        vals, _ = codec.np_quantize_q4(w)
        packed = codec.tpu_q4_pack(vals)
        np.testing.assert_array_equal(codec.tpu_q4_unpack(packed), vals)

    def test_jnp_quantize_matches_tpu_pack(self):
        w = _rand((8, 128), seed=8)
        qt = codec.quantize_q4(jnp.asarray(w))
        vals, deltas = codec.np_quantize_q4(w)
        np.testing.assert_array_equal(np.asarray(qt.data), codec.tpu_q4_pack(vals))
        np.testing.assert_array_equal(
            np.asarray(qt.scales), deltas.astype(np.float32)
        )

    def test_dequantize_matches_reference_dequant(self):
        """jnp dequantize(tpu layout) == reference q4 dequant math
        (gten/quants.h:78-90: (value - 7) * delta_f16)."""
        w = _rand((8, 128), seed=9)
        qt = codec.quantize_q4(jnp.asarray(w))
        vals, deltas = codec.np_quantize_q4(w)
        ref = codec.np_dequantize_q4_unpacked(vals, deltas)
        np.testing.assert_allclose(np.asarray(codec.dequantize(qt)), ref, rtol=0, atol=0)

    def test_roundtrip_error_bound(self):
        w = _rand((16, 256), seed=10)
        qt = codec.quantize_q4(jnp.asarray(w))
        deq = np.asarray(codec.dequantize(qt))
        blocks = w.reshape(-1, 32)
        max_delta = (np.abs(blocks).max(axis=-1) / 7.0).max()
        assert np.abs(deq - w).max() <= max_delta * 0.51 + 1e-6


class TestStackedLayers:
    """Quantization must support a leading stacked-layers axis (scan layout)."""

    @pytest.mark.parametrize("kind", ["q8", "q4", "q4g"])
    def test_leading_axis(self, kind):
        w = _rand((3, 8, 64 if kind != "q4g" else 256), seed=11)
        qt = codec.quantize(jnp.asarray(w), kind)
        deq = np.asarray(codec.dequantize(qt))
        assert deq.shape == w.shape
        # per-layer quantization must equal quantizing each layer separately
        for i in range(3):
            qi = codec.quantize(jnp.asarray(w[i]), kind)
            np.testing.assert_array_equal(np.asarray(qt.data[i]), np.asarray(qi.data))
            np.testing.assert_array_equal(
                np.asarray(qt.scales[i]), np.asarray(qi.scales)
            )


class TestKNLayout:
    """The K-major ("kn") matmul layout must be a pure re-layout: same
    dequantized values, transposed orientation."""

    @pytest.mark.parametrize("kind", ["q8", "q4", "q4g"])
    @pytest.mark.parametrize("shape", [(8, 64), (16, 512), (4, 8, 128)])
    def test_dequant_matches_nk_transposed(self, kind, shape):
        if kind == "q4g" and shape[-1] % 128:
            pytest.skip("q4g requires d_in % 128 == 0")
        w = _rand(shape, seed=21)
        nk = codec.quantize(jnp.asarray(w), kind)
        kn = codec.quantize(jnp.asarray(w), kind, layout="kn")
        assert kn.layout == "kn"
        d_nk = np.asarray(codec.dequantize(nk))
        d_kn = np.asarray(codec.dequantize(kn))
        np.testing.assert_array_equal(np.swapaxes(d_nk, -1, -2), d_kn)

    @pytest.mark.parametrize("kind", ["q8", "q4", "q4g"])
    def test_to_kn_equals_direct_kn_quantize(self, kind):
        w = _rand((2, 16, 128), seed=22)
        via = codec.to_kn(codec.quantize(jnp.asarray(w), kind))
        direct = codec.quantize(jnp.asarray(w), kind, layout="kn")
        np.testing.assert_array_equal(np.asarray(via.data), np.asarray(direct.data))
        np.testing.assert_array_equal(
            np.asarray(via.scales), np.asarray(direct.scales)
        )
        assert via.shape == (2, 16, 128)
