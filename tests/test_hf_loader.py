"""Direct HF-checkpoint loading (io/checkpoint.load_hf_checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyllama_tpu.config import DtypePolicy, tiny_test_config
from tinyllama_tpu.io.checkpoint import load_hf_checkpoint
from tinyllama_tpu.models import llama

CFG = tiny_test_config()


def _hf_state_dict(dense):
    sd = {
        "model.embed_tokens.weight": np.asarray(dense["embed"], np.float32),
        "model.norm.weight": np.asarray(dense["norm"], np.float32),
        "lm_head.weight": np.asarray(dense["lm_head"], np.float32),
    }
    D, kv, F = CFG.n_embd, CFG.kv_dim, CFG.n_ffn
    splits = {
        "wqkv": (("self_attn.q_proj.weight", 0, D),
                 ("self_attn.k_proj.weight", D, D + kv),
                 ("self_attn.v_proj.weight", D + kv, D + 2 * kv)),
        "wo": (("self_attn.o_proj.weight", 0, D),),
        "w_gateup": (("mlp.gate_proj.weight", 0, F),
                     ("mlp.up_proj.weight", F, 2 * F)),
        "w_down": (("mlp.down_proj.weight", 0, D),),
        "attn_norm": (("input_layernorm.weight", None, None),),
        "ffn_norm": (("post_attention_layernorm.weight", None, None),),
    }
    for rname, pieces in splits.items():
        stacked = np.asarray(dense["layers"][rname], np.float32)
        for i in range(CFG.n_layers):
            for suffix, lo, hi in pieces:
                w = stacked[i]
                sd[f"model.layers.{i}.{suffix}"] = w if lo is None else w[lo:hi]
    return sd


@pytest.fixture(scope="module")
def hf_file(tmp_path_factory):
    from safetensors.numpy import save_file

    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(5))
    p = tmp_path_factory.mktemp("hf") / "model.safetensors"
    save_file(_hf_state_dict(dense), str(p))
    return p, dense


@pytest.mark.parametrize("wdtype", ["bf16", "q8", "q4"])
def test_matches_convert_params(hf_file, wdtype):
    p, dense = hf_file
    policy = DtypePolicy(wdtype, "f32", "f32")
    got = load_hf_checkpoint(p, CFG, policy)
    want = llama.convert_params(dense, policy)

    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(want)}
    assert len(flat_g) == len(flat_w)
    for key, leaf in flat_g:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_w[jax.tree_util.keystr(key)]),
            err_msg=jax.tree_util.keystr(key),
        )


def test_tied_lm_head(hf_file, tmp_path):
    from safetensors.numpy import load_file, save_file

    p, dense = hf_file
    sd = load_file(str(p))
    del sd["lm_head.weight"]
    p2 = tmp_path / "tied.safetensors"
    save_file(sd, str(p2))
    params = load_hf_checkpoint(p2, CFG, DtypePolicy("q8", "f32", "f32"))
    direct = load_hf_checkpoint(p, CFG, DtypePolicy("q8", "f32", "f32"))
    # lm_head falls back to the embedding table (kn layout)
    from tinyllama_tpu.quant.codec import dequantize

    np.testing.assert_array_equal(
        np.asarray(dequantize(params["lm_head"])).T,
        np.asarray(dequantize(direct["embed"])),
    )
