"""gten checkpoint format round-trip tests.

The byte layout must match the reference writer/loader exactly
(tinyllama_to_gten.py:94-201 / tinyllama.cpp:301-392); these tests
write synthetic checkpoints and verify structure, round-trip, and
quantization consistency with the codec oracles.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, tiny_test_config
from tinyllama_tpu.io import gten
from tinyllama_tpu.io.checkpoint import load_gten_checkpoint, save_gten_checkpoint
from tinyllama_tpu.models import llama
from tinyllama_tpu.quant import codec

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def dense_params():
    return llama.init_dense_params(CFG, jax.random.PRNGKey(3))


def _hf_weights(params):
    import numpy as np

    save = {}
    # reuse the save path's mapping by writing through save_gten_checkpoint
    return save


class TestFormat:
    def test_magic(self, dense_params, tmp_path):
        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, "fp16")
        raw = p.read_bytes()
        (magic,) = struct.unpack_from("<q", raw, 0)
        assert magic == 0x454C49464E455447
        assert raw[8:].startswith(
            struct.pack("<i", len(b"model.embed_tokens.weight"))
            + b"model.embed_tokens.weight"
        )

    @pytest.mark.parametrize("dtype", ["fp16", "q8", "q4"])
    def test_sniff_dtype(self, dense_params, tmp_path, dtype):
        p = tmp_path / f"{dtype}.gten"
        save_gten_checkpoint(p, CFG, dense_params, dtype)
        assert gten.sniff_dtype(p, CFG) == dtype

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "bad.gten"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError, match="bad magic"):
            gten.read_gten(p, CFG)

    def test_q8_payload_is_reference_block_layout(self, dense_params, tmp_path):
        """Each q8 record must be [f16 delta][32 int8] repeated — parse the
        embed payload by hand and compare to the codec oracle."""
        p = tmp_path / "q8.gten"
        save_gten_checkpoint(p, CFG, dense_params, "q8")
        raw = p.read_bytes()
        off = 8
        for _ in range(2):  # layer header + weight name
            (n,) = struct.unpack_from("<i", raw, off)
            off += 4 + n
        (nbytes,) = struct.unpack_from("<i", raw, off)
        off += 4
        embed = np.asarray(dense_params["embed"], np.float32)
        q_ref, d_ref = codec.np_quantize_q8(embed)
        nb = embed.size // codec.BLOCK_SIZE
        assert nbytes == nb * (2 + codec.BLOCK_SIZE)
        rec = np.frombuffer(raw, gten._Q8_BLOCK, count=nb, offset=off)
        np.testing.assert_array_equal(
            rec["q"].reshape(embed.shape), q_ref
        )
        np.testing.assert_array_equal(
            rec["delta"].reshape(d_ref.shape), d_ref
        )


class TestRoundTrip:
    def test_fp16_roundtrip(self, dense_params, tmp_path):
        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, "fp16")
        params, policy = load_gten_checkpoint(
            p, CFG, DtypePolicy("f32", "f32", "f32")
        )
        # fp16 file -> f32 params must equal f16(round(original))
        want = np.asarray(dense_params["embed"], np.float32).astype(np.float16)
        np.testing.assert_array_equal(
            np.asarray(params["embed"], np.float32), want.astype(np.float32)
        )
        assert params["layers"]["wqkv"].shape == (
            CFG.n_layers, CFG.n_embd + 2 * CFG.kv_dim, CFG.n_embd
        )
        assert params["norm"].dtype == np.float32

    @pytest.mark.parametrize("dtype", ["q8", "q4"])
    def test_quantized_roundtrip_matches_codec(self, dense_params, tmp_path, dtype):
        """write(gten) -> read(gten) must produce exactly the same QTensor
        as quantizing in memory with the jnp codec."""
        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, dtype)
        params, policy = load_gten_checkpoint(p, CFG)
        assert policy.wdtype == dtype
        direct = codec.quantize(dense_params["embed"], dtype)
        np.testing.assert_array_equal(
            np.asarray(params["embed"].data), np.asarray(direct.data)
        )
        np.testing.assert_array_equal(
            np.asarray(params["embed"].scales), np.asarray(direct.scales)
        )
        # and a stacked layer weight (loaded matmul weights are K-major,
        # q/k/v fused along d_out)
        direct_wqkv = codec.quantize(
            dense_params["layers"]["wqkv"], dtype, layout="kn"
        )
        assert params["layers"]["wqkv"].layout == "kn"
        np.testing.assert_array_equal(
            np.asarray(params["layers"]["wqkv"].data),
            np.asarray(direct_wqkv.data),
        )

    @pytest.mark.parametrize("wdtype", ["q8", "q4", "q4g"])
    def test_fp16_file_requantizes_to_policy(self, dense_params, tmp_path,
                                             wdtype):
        """Load-time requantization: ONE fp16 artifact serves every
        quantized policy (the reference needs an offline-converted file
        per dtype, tinyllama_to_gten.py). Result must equal quantizing
        the f16-rounded dense weights with the codec directly."""
        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, "fp16")
        params, policy = load_gten_checkpoint(
            p, CFG, DtypePolicy(wdtype, "bf16", "bf16")
        )
        assert policy.wdtype == wdtype
        f16 = jnp.asarray(dense_params["layers"]["wqkv"]).astype(
            jnp.float16).astype(jnp.float32)
        direct = codec.quantize(f16, wdtype, layout="kn")
        np.testing.assert_array_equal(
            np.asarray(params["layers"]["wqkv"].data),
            np.asarray(direct.data),
        )
        np.testing.assert_array_equal(
            np.asarray(params["layers"]["wqkv"].scales),
            np.asarray(direct.scales),
        )

    def test_q4_file_requantizes_to_q4g(self, dense_params, tmp_path):
        """The q4g deployment path: the published Q4_0 artifact loads
        under the q4g policy (dequantize + group-128 requantize, one
        extra 4-bit rounding)."""
        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, "q4")
        params, policy = load_gten_checkpoint(
            p, CFG, DtypePolicy("q4g", "bf16", "bf16")
        )
        assert policy.wdtype == "q4g"
        assert params["layers"]["wqkv"].kind == "q4g"
        w = jnp.asarray(dense_params["layers"]["wqkv"], jnp.float32)
        via_q4 = codec.dequantize(codec.quantize(w, "q4"), jnp.float32)
        direct = codec.quantize(via_q4, "q4g", layout="kn")
        np.testing.assert_array_equal(
            np.asarray(params["layers"]["wqkv"].data),
            np.asarray(direct.data),
        )

    def test_forward_from_file_equals_in_memory_quant(self, dense_params, tmp_path):
        """End-to-end: logits from a q8 checkpoint == logits from in-memory
        q8 quantization of the same dense params."""
        import jax.numpy as jnp

        from tinyllama_tpu.runtime.kvcache import init_cache

        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, "q8")
        params_file, policy = load_gten_checkpoint(
            p, CFG, DtypePolicy("q8", "f32", "f32")
        )
        params_mem = llama.convert_params(dense_params, DtypePolicy("q8", "f32", "f32"))

        toks = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        for prm in (params_file, params_mem):
            assert prm["layers"]["wqkv"].kind == "q8"
        cache = init_cache(CFG, 1, "f32")
        h1, _ = llama.forward(CFG, policy, params_file, toks, cache,
                              jnp.zeros((1,), jnp.int32))
        cache = init_cache(CFG, 1, "f32")
        h2, _ = llama.forward(CFG, policy, params_mem, toks, cache,
                              jnp.zeros((1,), jnp.int32))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    @pytest.mark.parametrize("dtype", ["fp16", "q8", "q4"])
    def test_device_decode_equals_host_decode(self, dense_params, tmp_path,
                                              dtype):
        """The HBM-side payload decode (raw bytes -> jnp deinterleave/
        pack, the default) must produce byte-identical params to the
        numpy host decode for every file dtype."""
        p = tmp_path / f"m.{dtype}.gten"
        save_gten_checkpoint(p, CFG, dense_params, dtype)
        dev, pol_d = load_gten_checkpoint(p, CFG, device_decode=True)
        host, pol_h = load_gten_checkpoint(p, CFG, device_decode=False)
        assert pol_d == pol_h
        flat_d = jax.tree_util.tree_leaves_with_path(dev)
        flat_h = jax.tree_util.tree_leaves_with_path(host)
        assert len(flat_d) == len(flat_h)
        for (kd, vd), (kh, vh) in zip(flat_d, flat_h):
            assert kd == kh
            assert vd.dtype == vh.dtype, kd
            np.testing.assert_array_equal(
                np.asarray(vd), np.asarray(vh), err_msg=str(kd)
            )

    def test_weight_order_mismatch_detected(self, dense_params, tmp_path):
        p = tmp_path / "m.gten"
        save_gten_checkpoint(p, CFG, dense_params, "fp16")
        raw = bytearray(p.read_bytes())
        # corrupt the *weight record* name (the second of the two copies —
        # the layer-header copy is informational, tinyllama.cpp:324-334)
        idx = raw.find(b"q_proj")
        idx2 = raw.find(b"q_proj", idx + 1)
        raw[idx2] = ord("x")
        p2 = tmp_path / "bad.gten"
        p2.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="order mismatch"):
            gten.read_gten(p2, CFG)
