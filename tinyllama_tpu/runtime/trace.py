"""Device-time profiling: jax.profiler trace capture + parsing.

The reference buckets *wall-clock* time per module with RAII timers and
prints linear/attention/other ms-per-token (print_perf,
/root/reference/tinyllama.cpp:565-582, fed by gten/modules.h:170-192).
On TPU wall clock measures dispatch, not device time (the chip sits
behind a high-latency tunnel here), so the analog is: capture a
jax.profiler trace around a known number of decode steps, parse the
XLA-op events off the device track, and aggregate per-kernel device
time into the same buckets.

Usage:
    events = profile_device_events(fn)     # runs fn under the profiler
    report = bucket_report(events, steps=N)
    print(format_bucket_table(report))
"""

from __future__ import annotations

import gzip
import json
import tempfile
from dataclasses import dataclass, field
from pathlib import Path

#: XLA op-name fragments -> print_perf bucket. Checked in order; first
#: match wins. Pallas kernels carry their kernel function names; XLA ops
#: carry fusion/convert/dynamic-update-slice style names.
_BUCKETS = (
    # the reference's "linear" bucket: every matmul module (qkv/o/gate/
    # up/down projections + lm_head), tinyllama.cpp:524-538
    ("linear", ("qmm_", "qmatmul", "ffn_fused", "lm_head", "dot", "matmul",
                "norm_qkv", "out_res")),
    # attention bucket: flash kernels + cache write + rope
    # (the reference counts rope + qkv_attn under non-linear modules)
    ("attention", ("flash_", "attn", "attention", "dynamic-update-slice", "dynamic_update",
                   "rope", "scatter", "decode_heads")),
)


def classify(op_name: str) -> str:
    low = op_name.lower()
    for bucket, frags in _BUCKETS:
        if any(f in low for f in frags):
            return bucket
    return "other"


@dataclass
class DeviceEvent:
    name: str
    dur_us: float
    count: int = 1


@dataclass
class BucketReport:
    steps: int
    per_kernel: dict[str, DeviceEvent] = field(default_factory=dict)
    buckets_us: dict[str, float] = field(default_factory=dict)
    total_us: float = 0.0

    def us_per_step(self, bucket: str) -> float:
        return self.buckets_us.get(bucket, 0.0) / max(1, self.steps)


def _find_trace_files(trace_dir: str | Path) -> list[Path]:
    return sorted(Path(trace_dir).rglob("*.trace.json.gz"))


def parse_device_events(trace_dir: str | Path) -> list[DeviceEvent]:
    """Extract per-op device-time events from a profiler trace directory.

    Returns one DeviceEvent per distinct op name with summed duration.
    Only events on device-pid "XLA Ops"-style threads are counted (host
    threads, steps, and module-level envelopes are excluded so nothing is
    double-counted).
    """
    files = _find_trace_files(trace_dir)
    if not files:
        raise FileNotFoundError(f"no .trace.json.gz under {trace_dir}")
    merged: dict[str, DeviceEvent] = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        # pid -> device? (process_name metadata), (pid, tid) -> thread name
        device_pids = set()
        op_tids = set()
        for e in events:
            if e.get("ph") != "M":
                continue
            args = e.get("args", {})
            if e.get("name") == "process_name":
                pname = str(args.get("name", ""))
                if "TPU" in pname or "/device:" in pname.lower() or (
                    "device" in pname.lower() and "host" not in pname.lower()
                ):
                    device_pids.add(e.get("pid"))
            elif e.get("name") == "thread_name":
                tname = str(args.get("name", ""))
                if "XLA Ops" in tname or tname.startswith("TensorFlow Op"):
                    op_tids.add((e.get("pid"), e.get("tid")))
        if not device_pids and not op_tids:
            # no device track in this file (e.g. CPU backend): counting
            # host python/runtime events would be meaningless
            continue
        for e in events:
            if e.get("ph") != "X":
                continue
            pid, tid = e.get("pid"), e.get("tid")
            if device_pids and pid not in device_pids:
                continue
            if op_tids and (pid, tid) not in op_tids:
                continue
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            ev = merged.get(name)
            if ev is None:
                merged[name] = DeviceEvent(name, dur, 1)
            else:
                ev.dur_us += dur
                ev.count += 1
    return list(merged.values())


def profile_device_events(
    fn, trace_dir: str | Path | None = None
) -> list[DeviceEvent]:
    """Run `fn()` under jax.profiler.trace and return parsed device events.

    `fn` must block on its own outputs (block_until_ready) so the device
    work lands inside the trace window.
    """
    import jax

    if trace_dir is None:
        tmp = tempfile.mkdtemp(prefix="tlt_trace_")
        trace_dir = tmp
    with jax.profiler.trace(str(trace_dir)):
        fn()
    return parse_device_events(trace_dir)


def bucket_report(events: list[DeviceEvent], steps: int) -> BucketReport:
    rep = BucketReport(steps=steps)
    for ev in events:
        rep.per_kernel[ev.name] = ev
        if ev.name.startswith(("while", "conditional")):
            # control-flow wrapper events span their children, which are
            # traced separately — counting both double-counts the loop
            # body (an entire decode step / prefill layer scan)
            continue
        rep.buckets_us[classify(ev.name)] = (
            rep.buckets_us.get(classify(ev.name), 0.0) + ev.dur_us
        )
        rep.total_us += ev.dur_us
    return rep


def format_bucket_table(rep: BucketReport, top_n: int = 16) -> str:
    """The print_perf per-module breakdown (tinyllama.cpp:565-581), with
    device times: linear/attention/other ms per token + top kernels."""
    n = max(1, rep.steps)
    lines = [
        "",
        "-------------------------------------------",
        " DEVICE TIME PER TOKEN (profiled)",
        "-------------------------------------------",
    ]
    for bucket in ("linear", "attention", "other"):
        us = rep.buckets_us.get(bucket, 0.0) / n
        pct = 100.0 * rep.buckets_us.get(bucket, 0.0) / max(rep.total_us, 1e-9)
        lines.append(f" {bucket:<10}: {us / 1000.0:8.3f}ms ({pct:5.1f}%)")
    lines.append(f" {'total':<10}: {rep.total_us / n / 1000.0:8.3f}ms")
    lines.append("-------------------------------------------")
    lines.append(" top kernels (us/token, count/token):")
    ranked = sorted(rep.per_kernel.values(), key=lambda e: -e.dur_us)
    for ev in ranked[:top_n]:
        lines.append(
            f"  {ev.dur_us / n:9.1f}us  x{ev.count / n:6.1f}  "
            f"[{classify(ev.name):<9}] {ev.name[:60]}"
        )
    lines.append("-------------------------------------------")
    return "\n".join(lines) + "\n"
