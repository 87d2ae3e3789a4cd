"""Kernel microbenchmark harness: device-time per variant from traces.

Measures Pallas kernel variants at real model shapes by running each
under jax.profiler.trace inside a lax.scan loop (optimization_barrier
between iterations so XLA cannot CSE the calls) and summing the device
events that match the kernel's name. Wall-clock per-op timing through
the axon tunnel measures dispatch (~20-40ms RTT), never device time —
this is the only reliable way to compare kernels on this box.

Usage:
    python tools/kbench.py --bench qmatmul --kind q4 --iters 50
    python tools/kbench.py --bench probe        # int4/bitcast support probes
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

#: TinyLlama-1.1B decode matmul shapes (K, N)
SHAPES = {
    "wqkv": (2048, 2560),
    "wo": (2048, 2048),
    "w_gateup": (2048, 11264),
    "w_down": (5632, 2048),
    "lm_head": (2048, 32003),
}


def device_time_us(fn, match: str | None = None, exclude=()):
    """Run fn() under the profiler; return {name: total_us} of device ops
    (optionally filtered to names containing `match`)."""
    from tinyllama_tpu.runtime import trace

    events = trace.profile_device_events(fn)
    out = {}
    for ev in events:
        if match and match not in ev.name:
            continue
        if any(x in ev.name for x in exclude):
            continue
        out[ev.name] = out.get(ev.name, 0.0) + ev.dur_us
    return out


def loop_fn(f, x, iters):
    """Returns g() that executes f(x) `iters` times on device, serialized
    via optimization_barrier (defeats CSE), blocking on the result."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            c = jax.lax.optimization_barrier(c)
            out = f(c)
            return c, out.ravel()[0]

        _, outs = jax.lax.scan(body, x, length=iters)
        return outs

    run(x).block_until_ready()  # compile + warm

    def g():
        run(x).block_until_ready()

    return g


def bench_qmatmul(args) -> int:
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.quant.codec import quantize
    from tinyllama_tpu.ops.pallas.qmatmul import qmatmul

    key = jax.random.PRNGKey(0)
    total = {}
    for name, (K, N) in SHAPES.items():
        if args.shape and name != args.shape:
            continue
        kw, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        w = quantize(
            jax.random.normal(kw, (N, K), jnp.float32) * 0.02,
            args.kind, layout="kn",
        )
        x = (jax.random.normal(kx, (args.m, K), jnp.float32) * 0.5).astype(
            jnp.bfloat16
        )

        f = lambda x, w=w: qmatmul(
            x, w, out_dtype=jnp.bfloat16, aq8=args.aq8
        )
        g = loop_fn(f, x, args.iters)
        times = device_time_us(g)
        kern_us = sum(v for k, v in times.items()
                      if "qmm" in k or "matmul" in k or "fusion" in k)
        per_call = kern_us / args.iters
        data_bytes = w.data.nbytes + w.scales.nbytes
        gbs = data_bytes / (per_call * 1e-6) / 1e9
        total[name] = per_call
        print(f"{name:>9} K={K:<5} N={N:<5}: {per_call:8.2f} us/call  "
              f"{gbs:7.1f} GB/s  (stream floor "
              f"{data_bytes / 819e9 * 1e6:6.2f} us)")
        if args.verbose:
            for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
                print(f"     {v / args.iters:9.2f} us  {k[:70]}")
    layer_us = sum(v for k, v in total.items() if k != "lm_head")
    if len(total) == len(SHAPES):
        print(f"\nper-token matmul time: 22*{layer_us:.1f} + "
              f"{total['lm_head']:.1f} = "
              f"{22 * layer_us + total['lm_head']:.1f} us")
    return 0


def bench_probe(args) -> int:
    """Feature probes: which unpack strategies does this stack support?"""
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    # --- probe 1: on-device int4 arrays (cast on device; no host transfer)
    try:
        a8 = jnp.arange(-8, 8, dtype=jnp.int8).reshape(4, 4)
        a4 = jax.jit(lambda x: x.astype(jnp.int4))(a8)
        back = jax.jit(lambda x: x.astype(jnp.int8))(a4)
        ok = bool(jnp.all(back == a8))
        print(f"probe int4-device-cast: OK roundtrip={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"probe int4-device-cast: FAIL {type(e).__name__}: {e}")

    # --- probe 2: Pallas kernel with an int4 input ref
    try:
        from jax.experimental import pallas as pl

        def k4(w_ref, o_ref):
            o_ref[:] = w_ref[:].astype(jnp.bfloat16) * 2.0

        @jax.jit
        def run(w8):
            w4 = w8.astype(jnp.int4)
            return pl.pallas_call(
                k4,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16),
            )(w4)

        w8 = jnp.clip(
            jax.random.randint(jax.random.PRNGKey(0), (256, 256), -8, 8),
            -8, 7,
        ).astype(jnp.int8)
        out = run(w8)
        ok = bool(jnp.all(out == w8.astype(jnp.bfloat16) * 2.0))
        print(f"probe pallas-int4-ref: OK correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"probe pallas-int4-ref: FAIL {type(e).__name__}: {e}")

    # --- probe 3: in-kernel bitcast i8[2k, n] -> i32[k/2, n]
    try:
        from jax.experimental import pallas as pl

        def kb(w_ref, o_ref):
            w = w_ref[:]
            w32 = jax.lax.bitcast_convert_type(
                w.reshape(w.shape[0] // 4, 4, w.shape[1]).swapaxes(1, 2),
                jnp.int32,
            )
            o_ref[:] = (w32 & 0xF).astype(jnp.bfloat16).swapaxes(1, 2)[
                :, 0, :
            ]

        @jax.jit
        def runb(w8):
            return pl.pallas_call(
                kb, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.bfloat16)
            )(w8)

        w8 = jnp.ones((256, 256), jnp.int8)
        print("probe pallas-bitcast-i8-i32: OK", runb(w8).shape)
    except Exception as e:  # noqa: BLE001
        print(f"probe pallas-bitcast-i8-i32: FAIL {type(e).__name__}: {e}")

    # --- probe 4: integer dot_general with i32 operands in a kernel
    try:
        from jax.experimental import pallas as pl

        def ki(x_ref, w_ref, o_ref):
            x = x_ref[:].astype(jnp.int32)
            w = w_ref[:].astype(jnp.int32)
            o_ref[:] = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        @jax.jit
        def runi(x8, w8):
            return pl.pallas_call(
                ki, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32)
            )(x8, w8)

        x8 = jnp.ones((8, 512), jnp.int8)
        w8 = jnp.ones((512, 256), jnp.int8)
        out = runi(x8, w8)
        print("probe pallas-i32-dot: OK", float(out[0, 0]))
    except Exception as e:  # noqa: BLE001
        print(f"probe pallas-i32-dot: FAIL {type(e).__name__}: {e}")

    # --- probe 5: int8 x int8 -> int32 dot (known-good reference point)
    try:
        from jax.experimental import pallas as pl

        def k8(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        @jax.jit
        def run8(x8, w8):
            return pl.pallas_call(
                k8, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32)
            )(x8, w8)

        out = run8(jnp.ones((8, 512), jnp.int8), jnp.ones((512, 256), jnp.int8))
        print("probe pallas-i8-dot: OK", float(out[0, 0]))
    except Exception as e:  # noqa: BLE001
        print(f"probe pallas-i8-dot: FAIL {type(e).__name__}: {e}")

    return 0


def bench_flash(args) -> int:
    """Ablation sweep of the flash PREFILL attention kernel at the
    production T=2048 shape (B=1, Kh=4, G=8, d=64, i8 KV): where do the
    14 ms go? Variants replace one cost at a time (wrong values, same
    op/DMA structure):

      full    the production body (_flash_attn_kernel twin)
      noexp   exp(x) -> x * 0.5 (isolates the transcendental rate)
      nomask  causal where() dropped
      nomax   running-max/alpha rescale chain dropped (m = 0)
      nosum   row normalizer (sum) dropped
      dots    the two MXU dots + accumulate only
      stream  touch-only (the tile DMA floor)
      flipT   scores computed TRANSPOSED ([BS, BTG] via dot(k, q)): the
              per-query max and sum become SUBLANE reductions (the lane
              reductions are the measured cost of full), the int8-KV
              scales fold in via iota-diagonal MXU dots (a [1, BS] lane
              vector cannot legally transpose to [BS, 1] in-kernel),
              and the accumulator stays flipped [d, BTG] so the alpha
              rescale broadcasts along sublanes too
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
    B, T, Kh, G, d = 1, args.m if args.m > 8 else 2048, 4, 8, 64
    S = T
    TG = T * G
    btg = 512
    bs = 512
    n_s = S // bs

    def body(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
             o_ref, acc_ref, m_ref, l_ref, *, variant):
        b = pl.program_id(0)
        h = pl.program_id(1)
        t = pl.program_id(2)
        s = pl.program_id(3)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        row0 = t * btg
        t_max = pos_ref[b] + (row0 + btg - 1) // G

        @pl.when(s * bs <= t_max)
        def _():
            if variant == "stream":
                o_ref[:] = (
                    jnp.zeros_like(o_ref)
                    + q_ref[:1, :].astype(jnp.float32)
                    + k_ref[:1, :].astype(jnp.float32)
                    + v_ref[:1, :].astype(jnp.float32)
                    + ks_ref[:1, :1] + vs_ref[:1, :1]
                )
                return
            q = q_ref[:].astype(jnp.bfloat16)
            scores = jax.lax.dot_general(
                q, k_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (1.0 / (d ** 0.5))
            scores = scores * ks_ref[pl.ds(h, 1), :]
            if variant == "dots":
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    scores.astype(jnp.bfloat16),
                    v_ref[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return
            if variant != "nomask":
                t_abs = pos_ref[b] + (
                    row0 + jax.lax.broadcasted_iota(jnp.int32, (btg, 1), 0)
                ) // G
                s_abs = s * bs + jax.lax.broadcasted_iota(
                    jnp.int32, (1, bs), 1)
                scores = jnp.where(s_abs <= t_abs, scores, NEG_INF)
            if variant == "nomax":
                m_new = jnp.zeros((btg, 1), jnp.float32)
                alpha = jnp.ones((btg, 1), jnp.float32)
            else:
                m_prev = m_ref[:, :1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(scores, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
            if variant == "noexp":
                p = (scores - m_new) * 0.5
            else:
                p = jnp.exp(scores - m_new)
            if variant != "nosum":
                row_l = jnp.sum(p, axis=1, keepdims=True)
                l_ref[:] = l_ref[:] * alpha + jnp.broadcast_to(
                    row_l, l_ref.shape)
            p = p * vs_ref[pl.ds(h, 1), :]
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(s == n_s - 1)
        def _():
            o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1.0)).astype(
                o_ref.dtype)

    def body_flip_pre(pos_ref, q_ref, k_ref, v_ref, kvs_ref,
                      o_ref, acc_ref, m_ref, l_ref):
        b = pl.program_id(0)
        h = pl.program_id(1)
        t = pl.program_id(2)
        s = pl.program_id(3)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        row0 = t * btg
        t_max = pos_ref[b] + (row0 + btg - 1) // G

        @pl.when(s * bs <= t_max)
        def _():
            ksc = kvs_ref[:, :1]  # [bs, 1] f32
            vsc = kvs_ref[:, 1:2]
            ks = (k_ref[:].astype(jnp.float32) * ksc).astype(jnp.bfloat16)
            vsld = (v_ref[:].astype(jnp.float32) * vsc).astype(
                jnp.bfloat16)
            scoresT = jax.lax.dot_general(
                ks, q_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (1.0 / (d ** 0.5))
            s_abs = s * bs + jax.lax.broadcasted_iota(
                jnp.int32, (bs, 1), 0)
            t_abs = pos_ref[b] + (
                row0 + jax.lax.broadcasted_iota(jnp.int32, (1, btg), 1)
            ) // G
            scoresT = jnp.where(s_abs <= t_abs, scoresT, NEG_INF)
            m_prev = m_ref[:1]
            m_new = jnp.maximum(
                m_prev, jnp.max(scoresT, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scoresT - m_new)
            l_ref[:1] = l_ref[:1] * alpha + jnp.sum(
                p, axis=0, keepdims=True)
            m_ref[:1] = m_new
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                vsld, p.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(s == n_s - 1)
        def _():
            o_ref[:] = (
                acc_ref[:] / jnp.maximum(l_ref[:1], 1.0)
            ).astype(o_ref.dtype)

    def body_flip(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, acc_ref, m_ref, l_ref, *, noscale=False,
                  transpose_scales=False):
        b = pl.program_id(0)
        h = pl.program_id(1)
        t = pl.program_id(2)
        s = pl.program_id(3)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        row0 = t * btg
        t_max = pos_ref[b] + (row0 + btg - 1) // G

        @pl.when(s * bs <= t_max)
        def _():
            if noscale:
                ks = k_ref[:].astype(jnp.bfloat16)
                vsld = v_ref[:].astype(jnp.bfloat16)
            elif transpose_scales:
                ksc = jnp.transpose(ks_ref[pl.ds(h, 1), :])  # [bs, 1]
                vsc = jnp.transpose(vs_ref[pl.ds(h, 1), :])
                ks = (k_ref[:].astype(jnp.float32) * ksc).astype(
                    jnp.bfloat16)
                vsld = (v_ref[:].astype(jnp.float32) * vsc).astype(
                    jnp.bfloat16)
            else:
                # per-key scales ride iota-diag MXU dots: diag(ks) @ k
                r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
                c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
                kdiag = jnp.where(r == c, ks_ref[pl.ds(h, 1), :], 0.0)
                vdiag = jnp.where(r == c, vs_ref[pl.ds(h, 1), :], 0.0)
                ks = jax.lax.dot_general(
                    kdiag.astype(jnp.bfloat16),
                    k_ref[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # [bs, d] scaled keys
                vsld = jax.lax.dot_general(
                    vdiag.astype(jnp.bfloat16),
                    v_ref[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # [bs, d] scaled values
            scoresT = jax.lax.dot_general(
                ks, q_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (1.0 / (d ** 0.5))  # [bs, btg]
            s_abs = s * bs + jax.lax.broadcasted_iota(
                jnp.int32, (bs, 1), 0)
            t_abs = pos_ref[b] + (
                row0 + jax.lax.broadcasted_iota(jnp.int32, (1, btg), 1)
            ) // G
            scoresT = jnp.where(s_abs <= t_abs, scoresT, NEG_INF)
            m_prev = m_ref[:1]  # [1, btg]
            m_new = jnp.maximum(
                m_prev, jnp.max(scoresT, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scoresT - m_new)
            l_ref[:1] = l_ref[:1] * alpha + jnp.sum(
                p, axis=0, keepdims=True)
            m_ref[:1] = m_new
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                vsld, p.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [d, btg]

        @pl.when(s == n_s - 1)
        def _():
            o_ref[:] = (
                acc_ref[:] / jnp.maximum(l_ref[:1], 1.0)
            ).astype(o_ref.dtype)

    key = jax.random.PRNGKey(0)
    qg = (jax.random.normal(key, (B, Kh, TG, d)) * 0.3).astype(jnp.bfloat16)
    ck = jax.random.randint(key, (B, Kh, S, d), -127, 127, jnp.int8)
    cv = jax.random.randint(key, (B, Kh, S, d), -127, 127, jnp.int8)
    ks = jnp.abs(jax.random.normal(key, (B, Kh, S))) * 0.01 + 0.001
    vs = jnp.abs(jax.random.normal(key, (B, Kh, S))) * 0.01 + 0.001
    pos = jnp.zeros((B,), jnp.int32)

    grid = (B, Kh, TG // btg, n_s)
    for variant in args.variants.split(","):
        if variant == "flipTpre":
            kvs_t = jnp.stack([ks, vs], axis=-1)  # [B, Kh, S, 2] f32
            f = lambda qg: pl.pallas_call(
                body_flip_pre,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((None, None, btg, d),
                                     lambda b, h, t, s, pos: (b, h, t, 0)),
                        pl.BlockSpec((None, None, bs, d),
                                     lambda b, h, t, s, pos: (b, h, s, 0)),
                        pl.BlockSpec((None, None, bs, d),
                                     lambda b, h, t, s, pos: (b, h, s, 0)),
                        pl.BlockSpec((None, None, bs, 2),
                                     lambda b, h, t, s, pos: (b, h, s, 0)),
                    ],
                    out_specs=pl.BlockSpec(
                        (None, None, d, btg),
                        lambda b, h, t, s, pos: (b, h, 0, t)),
                    scratch_shapes=[
                        pltpu.VMEM((d, btg), jnp.float32),
                        pltpu.VMEM((8, btg), jnp.float32),
                        pltpu.VMEM((8, btg), jnp.float32),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (B, Kh, d, TG), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "parallel", "parallel", "arbitrary"),
                ),
            )(pos, qg, ck, cv, kvs_t)
            try:
                g = loop_fn(f, qg, args.iters)
                times = device_time_us(g)
                per_call = max(times.values(), default=0.0) / args.iters
                print(f"flash T={T} {variant:>7}: {per_call:9.1f} us",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"flash {variant}: FAIL "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
            continue
        if variant.startswith("flipT"):
            kern = functools.partial(
                body_flip, noscale=variant.endswith("noscale"),
                transpose_scales=variant.endswith("tr"))
            out_specs = pl.BlockSpec(
                (None, None, d, btg), lambda b, h, t, s, pos: (b, h, 0, t))
            out_shape = jax.ShapeDtypeStruct((B, Kh, d, TG), jnp.float32)
            scratch = [
                pltpu.VMEM((d, btg), jnp.float32),
                pltpu.VMEM((8, btg), jnp.float32),
                pltpu.VMEM((8, btg), jnp.float32),
            ]
        else:
            kern = functools.partial(body, variant=variant)
            out_specs = pl.BlockSpec(
                (None, None, btg, d), lambda b, h, t, s, pos: (b, h, t, 0))
            out_shape = jax.ShapeDtypeStruct((B, Kh, TG, d), jnp.float32)
            scratch = [
                pltpu.VMEM((btg, d), jnp.float32),
                pltpu.VMEM((btg, 128), jnp.float32),
                pltpu.VMEM((btg, 128), jnp.float32),
            ]
        f = lambda qg, kern=kern, out_specs=out_specs, \
            out_shape=out_shape, scratch=scratch: pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((None, None, btg, d),
                                 lambda b, h, t, s, pos: (b, h, t, 0)),
                    pl.BlockSpec((None, None, bs, d),
                                 lambda b, h, t, s, pos: (b, h, s, 0)),
                    pl.BlockSpec((None, None, bs, d),
                                 lambda b, h, t, s, pos: (b, h, s, 0)),
                    pl.BlockSpec((None, Kh, bs),
                                 lambda b, h, t, s, pos: (b, 0, s)),
                    pl.BlockSpec((None, Kh, bs),
                                 lambda b, h, t, s, pos: (b, 0, s)),
                ],
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(pos, qg, ck, cv, ks, vs)
        try:
            g = loop_fn(f, qg, args.iters)
            times = device_time_us(g)
            per_call = max(times.values(), default=0.0) / args.iters
            print(f"flash T={T} {variant:>7}: {per_call:9.1f} us",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"flash {variant}: FAIL {str(e).splitlines()[0][:140]}",
                  flush=True)
    return 0


def bench_i4(args) -> int:
    """Experimental native-int4 small-m matmul kernel vs the current one.

    Weights live as signed s4 [-7, 7] (the reference's offset-7 values
    minus 7, exactly representable), so there is no offset correction and
    the i4->bf16 convert replaces the shift/mask nibble unpack. Tests:
      a. S4 arrays as jit arguments (axon transfer/layout feasibility)
      b. kernel device time at model shapes vs the packed-i8 kernel
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tinyllama_tpu.quant.codec import BLOCK_SIZE

    def kernel(x_ref, w_ref, s_ref, o_ref, *, blockwise):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[:]
        s = s_ref[:]  # [bk//32, bn] f32
        w = w_ref[:]  # [bk, bn] int4
        bk, bn = w.shape
        if blockwise:
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            for b in range(bk // BLOCK_SIZE):
                wb = w[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE].astype(x.dtype)
                xb = x[:, b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
                pb = jax.lax.dot_general(
                    xb, wb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc += pb * s[b].reshape(1, bn)
            o_ref[:] += acc
        else:
            wf = w.astype(jnp.float32).reshape(
                bk // BLOCK_SIZE, BLOCK_SIZE, bn
            )
            wd = (wf * s.reshape(bk // BLOCK_SIZE, 1, bn)).reshape(
                bk, bn
            ).astype(x.dtype)
            o_ref[:] += jax.lax.dot_general(
                x, wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def qmm_i4(x, w4, scales, bm, bn, bk, blockwise):
        M, K = x.shape
        N = w4.shape[-1]
        grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk)
        return pl.pallas_call(
            functools.partial(kernel, blockwise=blockwise),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
                pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
                pl.BlockSpec((bk // BLOCK_SIZE, bn), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=K * N // 2 + K // 32 * N * 4,
                transcendentals=0,
            ),
        )(x, w4, scales)

    key = jax.random.PRNGKey(0)

    def pack_nibbles(vals8):
        """int8 [-7,7] [K, N] -> packed int8 [K, N//2], lo-nibble-first so
        lax.bitcast_convert_type(., int4).reshape(K, N) round-trips."""
        lo = vals8[:, 0::2].astype(jnp.int32) & 0xF
        hi = vals8[:, 1::2].astype(jnp.int32) & 0xF
        return ((hi << 4) | lo).astype(jnp.int8)

    def make_s4(vals8, how: str):
        K, N = vals8.shape
        packed = pack_nibbles(vals8)
        if how == "bitcast-eager":
            return jax.lax.bitcast_convert_type(packed, jnp.int4).reshape(
                K, N
            )
        if how == "astype":
            return jax.jit(lambda v: v.astype(jnp.int4))(vals8)
        raise ValueError(how)

    for name, (K, N) in SHAPES.items():
        if args.shape and name != args.shape:
            continue
        kw, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        N += N % 2  # nibble pairs pack along N; pad odd vocab dims
        vals8 = jnp.clip(
            jax.random.randint(kw, (K, N), -7, 8), -7, 7
        ).astype(jnp.int8)
        scales = jnp.abs(jax.random.normal(kx, (K // 32, N))) * 0.01 + 0.001
        x = (jax.random.normal(kx, (args.m, K), jnp.float32) * 0.5).astype(
            jnp.bfloat16
        )
        bn = min(2048, (N + 127) // 128 * 128)
        denom = 2
        bk = 0
        for cand in range(256, K + 1, 256):
            if K % cand == 0 and (cand // denom) * bn <= 1024 * 1024:
                bk = cand
        bk = bk or K

        # packed int8 [K, N//2] lives in params; the S4 view is created
        # inside the jit (S4 cannot cross the jit boundary under axon)
        packed = jax.block_until_ready(pack_nibbles(vals8))
        for blockwise in (True, False):
            try:
                def f(x, packed=packed, s=scales, bw=blockwise):
                    w4 = jax.lax.bitcast_convert_type(
                        packed, jnp.int4
                    ).reshape(K, N)
                    return qmm_i4(x, w4, s, args.m, bn, bk, bw).astype(
                        jnp.bfloat16
                    )

                g = loop_fn(f, x, args.iters)
                times = device_time_us(g)
                # the loop body is one pallas call (+ scan noise): take the
                # single largest device op as the kernel
                kern_us = max(times.values(), default=0.0)
                other_us = sum(times.values()) - kern_us
                per_call = max(kern_us, 1e-9) / args.iters
                data_bytes = K * N // 2 + K // 32 * N * 4
                print(f"{name:>9} K={K:<5} N={N:<5} "
                      f"{'blockdot' if blockwise else 'tiledeq'}: "
                      f"{per_call:8.2f} us/call  "
                      f"{data_bytes / (per_call * 1e-6) / 1e9:7.1f} GB/s "
                      f"(floor {data_bytes / 819e9 * 1e6:6.2f} us) "
                      f"[other {other_us / args.iters:6.2f} us/call]",
                      flush=True)
                if args.verbose:
                    for k2, v in sorted(times.items(), key=lambda kv: -kv[1]):
                        print(f"     {v / args.iters:9.2f} us  {k2[:70]}")
            except Exception as e:  # noqa: BLE001
                print(f"{name:>9} {'blockdot' if blockwise else 'tiledeq'}: "
                      f"FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
    return 0


def bench_sweep(args) -> int:
    """Variant x tile sweep for the q4 small-m decode kernel.

    Variants:
      stream    same grid/BlockSpecs, near-zero compute — the DMA/pipeline
                ceiling for that tiling (Pallas DMAs whole blocks no matter
                what the kernel reads)
      biasand   the PRODUCTION blockdot body since round 3 (AND-only
                unpack over the biased-hi packing; timing here reuses the
                standard packing — wrong values, identical op structure)
      cur       the pre-round-3 body (int32 shift/mask nibble unpack)
      i8shift   nibble unpack on int8 directly (no int32 convert)
      dq        tile-dequant body (bigm style) at small m
    Tiles: --bn / --bk accept comma lists; 0 = auto (production pick).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tinyllama_tpu.quant.codec import BLOCK_SIZE, KN_GROUP, Q4_OFFSET, quantize
    from tinyllama_tpu.ops.pallas.qmatmul import _pick_bk, _pick_bn

    def body(x_ref, w_ref, s_ref, o_ref, *, variant, xfull=False):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        if xfull:
            # x block spans the whole K: slice this step's window from
            # VMEM (x is DMAd once per m, not once per grid step)
            bk_w = w_ref.shape[0] * 2
            x_ref = x_ref.at[:, pl.ds(k * bk_w, bk_w)]

        if variant == "stream":
            # touch each operand minimally; blocks were DMAd regardless
            o_ref[:] += (
                jnp.sum(w_ref[:8, :].astype(jnp.float32), axis=0,
                        keepdims=True)
                + s_ref[:1, :] + jnp.sum(x_ref[:], axis=1, keepdims=True)
            )
            return

        if variant in ("corrdot", "corrdotnm"):
            # the +7 offset correction moves out of the block loop into a
            # single [bm, nblk] @ [nblk, bn] MXU dot over the block sums
            # of x ("corrdotnm" additionally drops the hi mask — cost
            # model for the re-encoded high-nibble storage)
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            half = KN_GROUP // 2
            p32 = w_ref[:].astype(jnp.int32)
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            for g in range(p32.shape[0] // half):
                rows = p32[g * half:(g + 1) * half]
                if variant == "corrdotnm":
                    hi = (rows >> 4).astype(x.dtype)
                else:
                    hi = ((rows >> 4) & 0x0F).astype(x.dtype)
                lo = (rows & 0x0F).astype(x.dtype)
                xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
                xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
                ph = jax.lax.dot_general(
                    xh, hi, dims, preferred_element_type=jnp.float32)
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32)
                acc += ph * s[2 * g].reshape(1, bn)
                acc += plo * s[2 * g + 1].reshape(1, bn)
            bm, bk = x.shape
            nblk = bk // BLOCK_SIZE
            # block sums of x as an MXU dot against a block-diagonal ones
            # matrix (lane-splitting reshapes are illegal in-kernel)
            r = jax.lax.broadcasted_iota(jnp.int32, (bk, nblk), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (bk, nblk), 1)
            bd = jnp.where(r // BLOCK_SIZE == c, 1.0, 0.0).astype(x.dtype)
            bsum = jax.lax.dot_general(
                x, bd, dims, preferred_element_type=jnp.float32,
            ) * float(Q4_OFFSET)
            corr = jax.lax.dot_general(
                bsum, s, dims, preferred_element_type=jnp.float32)
            o_ref[:] += acc - corr
            return

        if variant in ("ilp4", "tree"):
            # same math as "cur" but the per-block partial products land
            # in independent accumulators (4 rotating chains / full tree
            # reduction) so the MXU can pipeline the depth-32 dots
            # instead of serializing on one acc += chain
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            half = KN_GROUP // 2
            p32 = w_ref[:].astype(jnp.int32)
            parts = []
            for g in range(p32.shape[0] // half):
                rows = p32[g * half:(g + 1) * half]
                hi = ((rows >> 4) & 0x0F).astype(x.dtype)
                lo = (rows & 0x0F).astype(x.dtype)
                xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
                xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
                sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
                suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
                dims = (((1,), (0,)), ((), ()))
                ph = jax.lax.dot_general(
                    xh, hi, dims, preferred_element_type=jnp.float32,
                ) - float(Q4_OFFSET) * sumh
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32,
                ) - float(Q4_OFFSET) * suml
                parts.append(ph * s[2 * g].reshape(1, bn))
                parts.append(plo * s[2 * g + 1].reshape(1, bn))
            if variant == "ilp4":
                accs = [jnp.zeros(o_ref.shape, jnp.float32) for _ in range(4)]
                for i, pb in enumerate(parts):
                    accs[i % 4] = accs[i % 4] + pb
                o_ref[:] += (accs[0] + accs[1]) + (accs[2] + accs[3])
            else:
                while len(parts) > 1:
                    parts = [
                        parts[i] + parts[i + 1] if i + 1 < len(parts)
                        else parts[i]
                        for i in range(0, len(parts), 2)
                    ]
                o_ref[:] += parts[0]
            return

        if variant == "fullunpack":
            # same math as "cur" but the nibble unpack runs once on the
            # whole tile (full-shape VPU ops), dots slice the results
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            half = KN_GROUP // 2
            p32 = w_ref[:].astype(jnp.int32)
            hi_all = ((p32 >> 4) & 0x0F).astype(x.dtype)
            lo_all = (p32 & 0x0F).astype(x.dtype)
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            for g in range(p32.shape[0] // half):
                hi = hi_all[g * half:(g + 1) * half]
                lo = lo_all[g * half:(g + 1) * half]
                xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
                xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
                sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
                suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
                ph = jax.lax.dot_general(
                    xh, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) - float(Q4_OFFSET) * sumh
                plo = jax.lax.dot_general(
                    xl, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) - float(Q4_OFFSET) * suml
                acc += ph * s[2 * g].reshape(1, bn)
                acc += plo * s[2 * g + 1].reshape(1, bn)
            o_ref[:] += acc
            return

        if variant == "dot3":
            # three-dot identity: B = xl.p gives 16*(xl.h) + xl.l, so the
            # lo plane never unpacks — only h (shift) is materialized.
            # (Structural-cost measurement; offset handling approximate.)
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            half = KN_GROUP // 2
            p32 = w_ref[:].astype(jnp.int32)
            h_all = ((p32 >> 4) & 0x0F).astype(x.dtype)
            p_all = w_ref[:].astype(x.dtype)  # direct i8->bf16
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            for g in range(p32.shape[0] // half):
                h = h_all[g * half:(g + 1) * half]
                pb = p_all[g * half:(g + 1) * half]
                xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
                xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
                sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
                suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
                dims = (((1,), (0,)), ((), ()))
                A = jax.lax.dot_general(
                    xh, h, dims, preferred_element_type=jnp.float32)
                C = jax.lax.dot_general(
                    xl, h, dims, preferred_element_type=jnp.float32)
                B = jax.lax.dot_general(
                    xl, pb, dims, preferred_element_type=jnp.float32)
                sh = s[2 * g].reshape(1, bn)
                sl = s[2 * g + 1].reshape(1, bn)
                acc += (A - float(Q4_OFFSET) * sumh) * sh
                acc += (B - 16.0 * C - float(Q4_OFFSET) * suml) * sl
            o_ref[:] += acc
            return

        if variant == "dotsraw":
            # q8-equivalent work on the packed tile: one cast per byte,
            # one depth-32 dot + scale-apply per 32-row block — no nibble
            # unpack. Isolates the unpack's marginal cost vs "cur".
            p = w_ref[:]
            x = x_ref[:]
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            bn = s_ref.shape[-1]
            for g in range(p.shape[0] // 32):
                rows = p[g * 32:(g + 1) * 32].astype(x.dtype)
                xb = x[:, g * 32:(g + 1) * 32]
                pb = jax.lax.dot_general(
                    xb, rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc += pb * s_ref[g].reshape(1, bn)
            o_ref[:] += acc
            return

        if variant == "unpackonly":
            # nibble unpack + one add per value, no dots: the VPU cost
            p32 = w_ref[:].astype(jnp.int32)
            bn = p32.shape[-1]
            half = KN_GROUP // 2
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            for g in range(p32.shape[0] // half):
                rows = p32[g * half:(g + 1) * half]
                hi = ((rows >> 4) & 0x0F).astype(jnp.float32)
                lo = (rows & 0x0F).astype(jnp.float32)
                acc += (hi + lo).reshape(half // 8, 8, bn).sum(0)
            o_ref[:] += acc
            return

        if variant == "biasand":
            # AND-only int8 unpack (no i32 cast, no shift): models a
            # packing where the hi nibble is stored biased by -8 (byte
            # XOR 0x80), so (byte & 0xF0) read as SIGNED int8 equals
            # 16*(vhi-8) — linear in vhi. The x16 and the +1 net offset
            # ((vhi-8)+1 == vhi-7) fold into post-dot scale algebra:
            #   hi: s*((x.hi16)/16 + sum(x)),  lo: s*((x.lo) - 7*sum(x))
            # Timing here reuses the production packing (wrong values,
            # identical op structure).
            p = w_ref[:]  # int8
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            half = KN_GROUP // 2
            s16 = s * (1.0 / 16.0)
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            m_hi = jnp.asarray(-16, jnp.int8)   # 0xF0 as signed int8
            m_lo = jnp.asarray(0x0F, jnp.int8)
            for g in range(p.shape[0] // half):
                rows = p[g * half:(g + 1) * half]
                hi16 = (rows & m_hi).astype(x.dtype)
                lo = (rows & m_lo).astype(x.dtype)
                xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
                xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
                sumh = jnp.sum(xh.astype(jnp.float32), axis=1,
                               keepdims=True)
                suml = jnp.sum(xl.astype(jnp.float32), axis=1,
                               keepdims=True)
                ph = jax.lax.dot_general(
                    xh, hi16, dims, preferred_element_type=jnp.float32)
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32)
                sh = s[2 * g].reshape(1, bn)
                sl = s[2 * g + 1].reshape(1, bn)
                acc += ph * s16[2 * g].reshape(1, bn) + sumh * sh
                acc += (plo - 7.0 * suml) * sl
            o_ref[:] += acc
            return

        if variant in ("nosum", "noand", "dotsonly"):
            # biasand ABLATIONS (wrong values, cost isolation):
            #   nosum    - x block sums replaced by a constant: isolates
            #              the per-group [bm,32]->[bm,1] reduction cost
            #   noand    - nibble masks dropped (cast the raw byte rows
            #              twice): isolates the 2 int8 ANDs
            #   dotsonly - dots + ONE scale FMA per group only: the
            #              floor of the 2-dots-per-group structure
            p = w_ref[:]
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            half = KN_GROUP // 2
            s16 = s * (1.0 / 16.0)
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            m_hi = jnp.asarray(-16, jnp.int8)
            m_lo = jnp.asarray(0x0F, jnp.int8)
            kone = jnp.float32(1.0)
            for g in range(p.shape[0] // half):
                rows = p[g * half:(g + 1) * half]
                if variant == "noand":
                    hi16 = rows.astype(x.dtype)
                    lo = rows.astype(x.dtype)
                else:
                    hi16 = (rows & m_hi).astype(x.dtype)
                    lo = (rows & m_lo).astype(x.dtype)
                xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
                xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
                if variant == "nosum" or variant == "dotsonly":
                    sumh = suml = kone
                else:
                    sumh = jnp.sum(xh.astype(jnp.float32), axis=1,
                                   keepdims=True)
                    suml = jnp.sum(xl.astype(jnp.float32), axis=1,
                                   keepdims=True)
                ph = jax.lax.dot_general(
                    xh, hi16, dims, preferred_element_type=jnp.float32)
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32)
                if variant == "dotsonly":
                    acc += ph * s16[2 * g].reshape(1, bn)
                    acc += plo * s[2 * g + 1].reshape(1, bn)
                else:
                    sh = s[2 * g].reshape(1, bn)
                    sl = s[2 * g + 1].reshape(1, bn)
                    acc += ph * s16[2 * g].reshape(1, bn) + sumh * sh
                    acc += (plo - 7.0 * suml) * sl
            o_ref[:] += acc
            return

        if variant == "g128":
            # STRUCTURAL cost of a group-128 q4 format (wrong values —
            # timing reuses the production packing): per 128 K-rows the
            # hi16/lo planes concat into one [128, bn] int8 matrix and
            # the MXU runs ONE depth-128 dot at full depth utilization
            # (vs 4 depth-32 dots = 4x the passes today), with one scale
            # FMA per group. The x-side 1/16 prescale of the hi window
            # and the offset sums are [bm, .] ops — noise.
            p = w_ref[:]  # int8, [bk//2, bn]
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            m_hi = jnp.asarray(-16, jnp.int8)
            m_lo = jnp.asarray(0x0F, jnp.int8)
            G = 128
            gb = G // 2  # byte rows per group
            for g in range(p.shape[0] // gb):
                rows = p[g * gb:(g + 1) * gb]
                hi16 = rows & m_hi        # [64, bn] == 16*(vhi-8)
                lo = rows & m_lo          # [64, bn] == vlo
                wg = jnp.concatenate([hi16, lo], axis=0).astype(x.dtype)
                xw = x[:, g * G:(g + 1) * G]
                xh = xw[:, :gb] * jnp.asarray(1.0 / 16.0, x.dtype)
                xg = jnp.concatenate([xh, xw[:, gb:]], axis=1)
                sumh = jnp.sum(
                    xw[:, :gb].astype(jnp.float32), axis=1, keepdims=True
                )
                suml = jnp.sum(
                    xw[:, gb:].astype(jnp.float32), axis=1, keepdims=True
                )
                pg = jax.lax.dot_general(
                    xg, wg, dims, preferred_element_type=jnp.float32)
                acc += (pg + sumh - 7.0 * suml) * s[2 * g].reshape(1, bn)
            o_ref[:] += acc
            return

        if variant == "g128d2":
            # group-128 format, NO concat: the hi16/lo planes stay
            # separate [64, bn] matrices feeding two depth-64 dots per
            # group (2x deeper than q4's depth-32, no materialized
            # combined tile — the concat made "g128" slower than the
            # production body).
            p = w_ref[:]
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            m_hi = jnp.asarray(-16, jnp.int8)
            m_lo = jnp.asarray(0x0F, jnp.int8)
            G = 128
            gb = G // 2
            s16 = s * (1.0 / 16.0)
            for g in range(p.shape[0] // gb):
                rows = p[g * gb:(g + 1) * gb]
                hi16 = (rows & m_hi).astype(x.dtype)
                lo = (rows & m_lo).astype(x.dtype)
                xh = x[:, g * G: g * G + gb]
                xl = x[:, g * G + gb:(g + 1) * G]
                sumh = jnp.sum(xh.astype(jnp.float32), axis=1,
                               keepdims=True)
                suml = jnp.sum(xl.astype(jnp.float32), axis=1,
                               keepdims=True)
                ph = jax.lax.dot_general(
                    xh, hi16, dims, preferred_element_type=jnp.float32)
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32)
                acc += ph * s16[2 * g].reshape(1, bn)
                acc += (plo + sumh - 7.0 * suml) * s[2 * g].reshape(1, bn)
            o_ref[:] += acc
            return

        if variant == "g256":
            # pack group 256 / scale group 128: the hi plane holds
            # K-rows [0,128) and the lo plane [128,256) of each group,
            # so EACH plane is one full depth-128 dot with one scale —
            # no concat, half g128d2's dot passes.
            p = w_ref[:]
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            m_hi = jnp.asarray(-16, jnp.int8)
            m_lo = jnp.asarray(0x0F, jnp.int8)
            G = 256
            gb = G // 2
            s16 = s * (1.0 / 16.0)
            for g in range(p.shape[0] // gb):
                rows = p[g * gb:(g + 1) * gb]
                hi16 = (rows & m_hi).astype(x.dtype)
                lo = (rows & m_lo).astype(x.dtype)
                xh = x[:, g * G: g * G + gb]
                xl = x[:, g * G + gb:(g + 1) * G]
                sumh = jnp.sum(xh.astype(jnp.float32), axis=1,
                               keepdims=True)
                suml = jnp.sum(xl.astype(jnp.float32), axis=1,
                               keepdims=True)
                ph = jax.lax.dot_general(
                    xh, hi16, dims, preferred_element_type=jnp.float32)
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32)
                acc += (ph * (1.0 / 16.0) + sumh) * s[4 * g].reshape(1, bn)
                acc += (plo - 7.0 * suml) * s[4 * g + 2].reshape(1, bn)
            o_ref[:] += acc
            return

        if variant in ("g256presum", "g256dots", "g256fma1"):
            # g256 ABLATIONS (wrong values, cost isolation):
            #   g256presum - x window sums replaced by constants: models
            #                hoisting the [M, K//128] sums out of the
            #                kernel (they are x-only and recomputed at
            #                every N grid step today)
            #   g256fma1   - presum + the two scale applications fused
            #                into ONE FMA per group (models folding the
            #                hi/16 prescale into the x window instead)
            #   g256dots   - the two dots + one accumulate only: the
            #                floor of the 2-full-depth-dots structure
            p = w_ref[:]
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            m_hi = jnp.asarray(-16, jnp.int8)
            m_lo = jnp.asarray(0x0F, jnp.int8)
            G = 256
            gb = G // 2
            kone = jnp.float32(1.0)
            for g in range(p.shape[0] // gb):
                rows = p[g * gb:(g + 1) * gb]
                hi16 = (rows & m_hi).astype(x.dtype)
                lo = (rows & m_lo).astype(x.dtype)
                xh = x[:, g * G: g * G + gb]
                xl = x[:, g * G + gb:(g + 1) * G]
                ph = jax.lax.dot_general(
                    xh, hi16, dims, preferred_element_type=jnp.float32)
                plo = jax.lax.dot_general(
                    xl, lo, dims, preferred_element_type=jnp.float32)
                if variant == "g256dots":
                    acc += ph + plo
                elif variant == "g256fma1":
                    acc += (ph + plo + kone) * s[4 * g].reshape(1, bn)
                else:  # g256presum
                    acc += (ph * (1.0 / 16.0) + kone) * s[4 * g].reshape(
                        1, bn)
                    acc += (plo - 7.0 * kone) * s[4 * g + 2].reshape(1, bn)
            o_ref[:] += acc
            return

        if variant == "dqbias":
            # production bigm body (AND-only unpack, FMA-folded scales,
            # one depth-bk bf16 dot) evaluated at small m: is tile
            # dequant still 3x off now that the unpack is 2 int8 ANDs?
            p = w_ref[:]
            x = x_ref[:]
            s = s_ref[:]
            bn = s.shape[-1]
            bk = p.shape[0] * 2
            half = KN_GROUP // 2
            s2 = s.reshape(bk // KN_GROUP, 2, 1, bn)
            s_hi = s2[:, 0]
            s_lo = s2[:, 1]
            g8 = p.reshape(bk // KN_GROUP, half, bn)
            hi = (g8 & jnp.asarray(-16, jnp.int8)).astype(jnp.float32) * (
                s_hi * (1.0 / 16.0)
            ) + s_hi
            lo = (g8 & jnp.asarray(0x0F, jnp.int8)).astype(jnp.float32) * (
                s_lo
            ) - 7.0 * s_lo
            wd = (
                jnp.concatenate([hi, lo], axis=1)
                .reshape(bk, bn).astype(x.dtype)
            )
            o_ref[:] += jax.lax.dot_general(
                x, wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return

        if variant == "overlap":
            # heavy compute that does NOT read the weight tile (beyond a
            # token touch): if the pipeline overlaps DMA with compute this
            # costs ~max(DMA, compute); if it serializes, DMA + compute
            x = x_ref[:]
            bn = o_ref.shape[1]
            acc = jnp.zeros(o_ref.shape, jnp.float32)
            for i in range(16):
                xb = x[:, i * 32:(i + 1) * 32]
                wfake = jnp.broadcast_to(
                    xb[:1].reshape(32, 1), (32, bn)
                ).astype(x.dtype)
                acc += jax.lax.dot_general(
                    xb, wfake, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[:] += acc + w_ref[:1, :].astype(jnp.float32)
            return

        x = x_ref[:]
        s = s_ref[:]
        bn = s.shape[-1]
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        half = KN_GROUP // 2

        if variant == "dq":
            w32 = w_ref[:].astype(jnp.int32)
            bk = w32.shape[0] * 2
            g3 = w32.reshape(bk // KN_GROUP, half, bn)
            hi = (g3 >> 4) & 0x0F
            lo = g3 & 0x0F
            vals = (
                jnp.concatenate([hi, lo], axis=1).reshape(bk, bn)
                .astype(jnp.float32) - float(Q4_OFFSET)
            )
            s3 = s.reshape(bk // BLOCK_SIZE, 1, bn)
            wd = (
                (vals.reshape(bk // BLOCK_SIZE, BLOCK_SIZE, bn) * s3)
                .reshape(bk, bn).astype(x.dtype)
            )
            o_ref[:] += jax.lax.dot_general(
                x, wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return

        if variant == "i8shift":
            p = w_ref[:]  # int8
            mk = lambda rows: (
                ((rows >> 4) & 0x0F).astype(x.dtype),
                (rows & 0x0F).astype(x.dtype),
            )
        elif variant == "i16shift":
            p = w_ref[:].astype(jnp.int16)
            mk = lambda rows: (
                ((rows >> 4) & 0x0F).astype(x.dtype),
                (rows & 0x0F).astype(x.dtype),
            )
        else:  # cur
            p32 = w_ref[:].astype(jnp.int32)
            mk = lambda rows: (
                ((rows >> 4) & 0x0F).astype(x.dtype),
                (rows & 0x0F).astype(x.dtype),
            )
            p = p32

        for g in range(p.shape[0] // half):
            rows = p[g * half:(g + 1) * half]
            hi, lo = mk(rows)
            xh = x[:, g * KN_GROUP: g * KN_GROUP + half]
            xl = x[:, g * KN_GROUP + half: (g + 1) * KN_GROUP]
            sumh = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
            suml = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
            ph = jax.lax.dot_general(
                xh, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - float(Q4_OFFSET) * sumh
            plo = jax.lax.dot_general(
                xl, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - float(Q4_OFFSET) * suml
            acc += ph * s[2 * g].reshape(1, bn)
            acc += plo * s[2 * g + 1].reshape(1, bn)
        o_ref[:] += acc

    def run_manual(x, w, bm, bn, bk):
        """Hand-rolled pipeline: weights/scales stay in HBM, the kernel
        double-buffers bk-tiles through VMEM scratch with explicit async
        copies and computes the blockdot on the resident slot — the
        definitive test of DMA/compute overlap (the automatic Pallas
        pipeline measures as stream + compute, fully serialized)."""
        M, K = x.shape
        N = w.data.shape[-1]
        bkr = bk // 2
        nk = K // bk
        nbs = bk // BLOCK_SIZE

        def kernel(x_ref, w_hbm, s_hbm, o_ref):
            n0 = pl.program_id(1) * bn

            def body(w_scr, s_scr, wsem, ssem):
                def wdma(slot, ki):
                    return pltpu.make_async_copy(
                        w_hbm.at[pl.ds(ki * bkr, bkr), pl.ds(n0, bn)],
                        w_scr.at[slot], wsem.at[slot])

                def sdma(slot, ki):
                    return pltpu.make_async_copy(
                        s_hbm.at[pl.ds(ki * nbs, nbs), pl.ds(n0, bn)],
                        s_scr.at[slot], ssem.at[slot])

                wdma(0, 0).start()
                sdma(0, 0).start()
                half = KN_GROUP // 2

                def loop(ki, acc):
                    slot = ki % 2
                    nxt = (ki + 1) % 2

                    @pl.when(ki + 1 < nk)
                    def _():
                        wdma(nxt, ki + 1).start()
                        sdma(nxt, ki + 1).start()

                    wdma(slot, ki).wait()
                    sdma(slot, ki).wait()
                    p32 = w_scr[slot].astype(jnp.int32)
                    s = s_scr[slot]
                    dims = (((1,), (0,)), ((), ()))
                    # one aligned dynamic read of this tile's x window;
                    # in-window slices are static (unaligned dynamic
                    # lane slices are illegal)
                    xw = x_ref[:, pl.ds(ki * bk, bk)]
                    for g in range(bkr // half):
                        rows = p32[g * half:(g + 1) * half]
                        hi = ((rows >> 4) & 0x0F).astype(x_ref.dtype)
                        lo = (rows & 0x0F).astype(x_ref.dtype)
                        base = g * KN_GROUP
                        xh = xw[:, base:base + half]
                        xl = xw[:, base + half:base + KN_GROUP]
                        sumh = jnp.sum(xh.astype(jnp.float32), axis=1,
                                       keepdims=True)
                        suml = jnp.sum(xl.astype(jnp.float32), axis=1,
                                       keepdims=True)
                        ph = jax.lax.dot_general(
                            xh, hi, dims,
                            preferred_element_type=jnp.float32,
                        ) - float(Q4_OFFSET) * sumh
                        plo = jax.lax.dot_general(
                            xl, lo, dims,
                            preferred_element_type=jnp.float32,
                        ) - float(Q4_OFFSET) * suml
                        acc = acc + ph * s[2 * g].reshape(1, bn)
                        acc = acc + plo * s[2 * g + 1].reshape(1, bn)
                    return acc

                acc = jax.lax.fori_loop(
                    0, nk, loop, jnp.zeros((bm, bn), jnp.float32))
                o_ref[:] = acc

            pl.run_scoped(
                body,
                w_scr=pltpu.VMEM((2, bkr, bn), jnp.int8),
                s_scr=pltpu.VMEM((2, nbs, bn), jnp.float32),
                wsem=pltpu.SemaphoreType.DMA((2,)),
                ssem=pltpu.SemaphoreType.DMA((2,)),
            )

        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(M, bm), pl.cdiv(N, bn)),
            in_specs=[
                pl.BlockSpec((bm, K), lambda m, n: (m, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(x, w.data, w.scales)

    def run_one(x, w, variant, bm, bn, bk, tiled=False, xfull=False,
                vmem=None):
        M, K = x.shape
        N = w.data.shape[-1]
        grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), K // bk)
        kernel = functools.partial(body, variant=variant, xfull=xfull)
        cost = pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N // 2 + K // 32 * N * 4,
            transcendentals=0,
        )
        cp_kwargs = {}
        if vmem:
            cp_kwargs["vmem_limit_bytes"] = vmem
        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **cp_kwargs,
        )
        x_spec = (
            pl.BlockSpec((bm, K), lambda m, n, k: (m, 0)) if xfull
            else pl.BlockSpec((bm, bk), lambda m, n, k: (m, k))
        )
        if tiled:
            # pre-tiled contiguous layout: [grid_n, K//2, bn] — every
            # weight-tile DMA is one unbroken HBM run
            gn = grid[1]
            assert N % bn == 0, (N, bn)
            data_t = (
                w.data.reshape(K // 2, gn, bn).transpose(1, 0, 2).copy()
            )
            scales_t = (
                w.scales.reshape(K // 32, gn, bn).transpose(1, 0, 2).copy()
            )
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    x_spec,
                    pl.BlockSpec((None, bk // 2, bn),
                                 lambda m, n, k: (n, k, 0)),
                    pl.BlockSpec((None, bk // BLOCK_SIZE, bn),
                                 lambda m, n, k: (n, k, 0)),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                compiler_params=cp,
                cost_estimate=cost,
            )(x, data_t, scales_t)
            return out
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n)),
                pl.BlockSpec((bk // BLOCK_SIZE, bn), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=cp,
            cost_estimate=cost,
        )(x, w.data, w.scales)
        return out

    key = jax.random.PRNGKey(0)
    variants = args.variants.split(",")
    for name, (K, N) in SHAPES.items():
        if args.shape and name != args.shape:
            continue
        kw, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        w = quantize(
            jax.random.normal(kw, (N, K), jnp.float32) * 0.02,
            "q4", layout="kn",
        )
        from tinyllama_tpu.quant.codec import QTensor as _QT

        # the sweep bodies read scales as plain f32 (they test DMA and
        # compute structure, not the f16 bit-reconstruction)
        w = _QT(w.data, w.scales.astype(jnp.float32), w.kind, w.layout)
        x = (jax.random.normal(kx, (args.m, K), jnp.float32) * 0.5).astype(
            jnp.bfloat16
        )
        data_bytes = w.data.nbytes + w.scales.nbytes
        bns = [int(v) or _pick_bn(N) for v in args.bns.split(",")]
        for bn in bns:
            bks = [
                int(v) or _pick_bk(K, bn, "q4") for v in args.bks.split(",")
            ]
            for bk in bks:
                if K % bk or (bk // 2) * bn > 4 * 1024 * 1024:
                    continue
                for variant in variants:
                    try:
                        # flag suffixes: -t tiled layout, -x whole-K x
                        # block, -v raised VMEM limit (combinable)
                        base = variant
                        tiled = xfull = False
                        vmem = None
                        while True:
                            if base.endswith("-t"):
                                tiled, base = True, base[:-2]
                            elif base.endswith("-x"):
                                xfull, base = True, base[:-2]
                            elif base.endswith("-v"):
                                vmem, base = 12 * 2**20, base[:-2]
                            else:
                                break
                        if tiled and N % bn:
                            continue
                        if base == "manual":
                            if N % bn:
                                continue
                            f = lambda x: run_manual(x, w, args.m, bn, bk)
                        else:
                            f = lambda x: run_one(
                                x, w, base, args.m, bn, bk, tiled, xfull,
                                vmem)
                        g = loop_fn(f, x, args.iters)
                        times = device_time_us(g)
                        kern_us = max(times.values(), default=0.0)
                        per_call = kern_us / args.iters
                        steps = (
                            pl.cdiv(N, bn) * (K // bk)
                        )
                        print(
                            f"{name:>9} bn={bn:<5} bk={bk:<5} "
                            f"{variant:>8}: {per_call:8.2f} us "
                            f"{data_bytes / per_call / 1e3:7.1f} GB/s "
                            f"(floor {data_bytes / 819e9 * 1e6:6.2f}) "
                            f"steps={steps}",
                            flush=True,
                        )
                    except Exception as e:  # noqa: BLE001
                        print(f"{name:>9} bn={bn} bk={bk} {variant}: FAIL "
                              f"{str(e).splitlines()[0][:120]}", flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench", default="qmatmul",
                    choices=("qmatmul", "probe", "i4", "sweep", "flash"))
    ap.add_argument("--variants", default="stream,cur,i8shift,dq")
    ap.add_argument("--bns", default="0")
    ap.add_argument("--bks", default="0")
    ap.add_argument("--kind", default="q4", choices=("q4", "q8"))
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--aq8", action="store_true")
    ap.add_argument("--shape", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.bench == "probe":
        return bench_probe(args)
    if args.bench == "i4":
        return bench_i4(args)
    if args.bench == "sweep":
        return bench_sweep(args)
    if args.bench == "flash":
        return bench_flash(args)
    return bench_qmatmul(args)


if __name__ == "__main__":
    sys.exit(main())
