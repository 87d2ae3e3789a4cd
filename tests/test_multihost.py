"""Multi-host (DCN) scaffolding: 3-axis mesh + cross-process smoke.

The (dcn, data, model) mesh keeps the all-reduce-heavy model axis on
ICI-adjacent devices and crosses the host network only with the
data-parallel dcn axis. On the 8 virtual CPU devices these tests verify
the single-process semantics; the genuine 2-process jax.distributed path
runs in tools/multihost_smoke.py (exercised by the subprocess test).
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.models import llama
from tinyllama_tpu.parallel.mesh import batch_axes, make_mesh
from tinyllama_tpu.runtime.engine import Engine

CFG = tiny_test_config(n_heads=8, n_kv_heads=4, n_embd=256, n_ffn=512)


def test_dcn_mesh_shape_and_axes():
    mesh = make_mesh(tp=2, dp=2, dcn=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (2, 2, 2)
    assert batch_axes(mesh) == ("dcn", "data")
    flat = make_mesh(tp=4, dp=2)
    assert flat.axis_names == ("data", "model")
    assert batch_axes(flat) == "data"


def test_engine_tp_on_dcn_mesh_matches_single_device():
    """Engine TP over a (dcn=2, data=2, model=2) mesh: batch rows shard
    across dcn x data, weights across model, outputs identical to the
    single-device program."""
    policy = DtypePolicy("q8", "f32", "i8")
    dense = llama.init_dense_params(CFG, jax.random.PRNGKey(11), jnp.float32)
    params = llama.convert_params(dense, policy)
    gen = GenerationConfig(n_predict=20, greedy=True, eos_token=-2,
                           chunk_size=4)
    prompts = [list(range(2, 8)), [4, 5, 6], [9, 8, 7, 6, 5],
               list(range(3, 10))]

    single = Engine(CFG, policy, params, max_batch=4, use_pallas=False)
    want, _ = single.generate_batch(prompts, gen)

    mesh = make_mesh(tp=2, dp=2, dcn=2)
    eng = Engine(CFG, policy, params, max_batch=4, tp=2, mesh=mesh,
                 use_pallas=False)
    got, _ = eng.generate_batch(prompts, gen)
    assert got == want


@pytest.mark.slow
def test_two_process_distributed_smoke():
    """Genuine multi-process jax.distributed over localhost: 2 hosts x 2
    devices, DCN psum + process-local TP block (tools/multihost_smoke.py)."""
    tool = Path(__file__).resolve().parent.parent / "tools" / "multihost_smoke.py"
    proc = subprocess.run(
        [sys.executable, str(tool), "--port", "12931"],
        capture_output=True, text=True, timeout=280,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIHOST SMOKE OK" in proc.stdout
