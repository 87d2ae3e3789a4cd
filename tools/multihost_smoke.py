"""2-process CPU multi-host smoke test for the DCN scaffolding.

Launches two OS processes that form a jax.distributed cluster over
localhost gRPC (the CPU stand-in for a multi-host TPU pod's coordinator),
build the 3-axis (dcn, data, model) mesh spanning both processes, and run

  1. a psum over every global device (the DCN collective path), and
  2. a tensor-parallel block matmul under shard_map whose model axis
     stays process-local (ICI analog) while the dcn axis crosses
     processes — the communication layout production serving uses.

Usage:
    python tools/multihost_smoke.py            # parent: spawns 2 workers
    python tools/multihost_smoke.py --child N  # internal
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOCAL_DEVICES = 2  # per process
N_PROCS = 2


def child(rank: int, port: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(REPO))
    from tinyllama_tpu.parallel.mesh import (
        DCN_AXIS, MODEL_AXIS, init_distributed, make_mesh,
    )

    init_distributed(f"127.0.0.1:{port}", N_PROCS, rank)
    import jax.numpy as jnp
    import numpy as np

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == N_PROCS * LOCAL_DEVICES, n_global
    assert n_local == LOCAL_DEVICES, n_local

    mesh = make_mesh(tp=LOCAL_DEVICES, dp=1, dcn=N_PROCS)
    assert mesh.axis_names == (DCN_AXIS, "data", MODEL_AXIS)

    # 1. psum across every device (crosses the process boundary)
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(n_global, dtype=jnp.float32)
    xs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P((DCN_AXIS, "data", MODEL_AXIS))),
        np.arange(n_global, dtype=np.float32)[
            rank * n_local:(rank + 1) * n_local
        ],
        x.shape,
    )

    def total(v):
        return jax.lax.psum(v, (DCN_AXIS, "data", MODEL_AXIS))

    out = jax.jit(shard_map(
        total, mesh=mesh,
        in_specs=P((DCN_AXIS, "data", MODEL_AXIS)),
        out_specs=P(),
        check_vma=False,
    ))(xs)
    want = float(np.arange(n_global).sum())
    got = float(np.asarray(out.addressable_shards[0].data)[0])
    assert got == want, (got, want)

    # 2. Megatron-style column x row parallel matmul pair: model axis
    # process-local, psum over "model" only, replicated over dcn
    D = 16
    w1 = jnp.eye(D, dtype=jnp.float32) * 2.0  # column-parallel
    w2 = jnp.eye(D, dtype=jnp.float32) * 3.0  # row-parallel
    xin = jnp.ones((1, D), jnp.float32)

    def block(x, w1s, w2s):
        h = x @ w1s  # [1, D/tp]
        y = h @ w2s  # [1, D] partial
        return jax.lax.psum(y, MODEL_AXIS)

    fn = jax.jit(shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(None, MODEL_AXIS), P(MODEL_AXIS, None)),
        out_specs=P(),
        check_vma=False,
    ))
    y = fn(xin, w1, w2)
    got2 = float(np.asarray(y.addressable_shards[0].data)[0, 0])
    assert got2 == 6.0, got2

    print(f"[child {rank}] multihost smoke OK: {n_global} global devices, "
          f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
          f"psum={got}, tp-block={got2}", flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=12765)
    args = ap.parse_args()
    if args.child is not None:
        return child(args.child, args.port)

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", str(r),
             "--port", str(args.port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(N_PROCS)
    ]
    rc = 0
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        ok = p.returncode == 0
        rc |= p.returncode
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- child {r}: {'OK' if ok else 'FAIL'}\n{tail}")
    print("MULTIHOST SMOKE", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
