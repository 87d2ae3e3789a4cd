"""Pin trace.py's kernel->bucket assignment.

The perf report buckets device events by op-name fragments
(runtime/trace.py _BUCKETS). Fragment matching is inherently name-based:
this test pins the classification of every kernel name the framework
actually emits, so a renamed kernel that silently migrates between the
linear/attention/other buckets fails loudly here instead of skewing
PERF.md numbers.
"""

from tinyllama_tpu.runtime import trace
from tinyllama_tpu.runtime.trace import (
    BucketReport, DeviceEvent, bucket_report, classify, format_bucket_table,
)

# real op names observed in device traces of this framework (kbench /
# profile_decode): Pallas custom calls carry the kernel function name,
# XLA ops carry fusion/op names.
LINEAR_NAMES = [
    "qmm_kernel_smallm",  # ops/pallas/qmatmul.py decode variant
    "qmm_kernel_bigm",  # prefill variant
    "ffn_fused_kernel",  # ops/pallas/ffn_fused.py
    "fusion.123 dot_general",
    "lm_head_matmul",
]
ATTENTION_NAMES = [
    "flash_prefill_kernel",  # ops/pallas/flash_prefill.py
    "flash_paged_kernel",  # ops/pallas/flash_paged.py
    "dynamic-update-slice.42",  # cache writes
    "rope_apply fusion",
    "gqa_attention_fallback",
]
OTHER_NAMES = [
    "convert.7",
    "broadcast.12",
    "rms_norm fusion.9",  # norms are XLA glue: counted under other
    "copy.3",
]


def test_linear_bucket():
    for name in LINEAR_NAMES:
        assert classify(name) == "linear", name


def test_attention_bucket():
    for name in ATTENTION_NAMES:
        assert classify(name) == "attention", name


def test_other_bucket():
    for name in OTHER_NAMES:
        assert classify(name) == "other", name


def test_every_shipped_pallas_kernel_is_classified():
    """Each kernel function defined under ops/pallas must classify into a
    non-'other' bucket by its own name — the contract a rename breaks."""
    import inspect

    from tinyllama_tpu.ops.pallas import ffn_fused, flash_paged, flash_prefill, qmatmul

    kernel_fns = []
    for mod in (qmatmul, ffn_fused, flash_prefill, flash_paged):
        for name, fn in inspect.getmembers(mod, inspect.isfunction):
            if "_kernel" in name and fn.__module__ == mod.__name__:
                kernel_fns.append(name)
    assert kernel_fns, "expected to find Pallas kernel bodies"
    for name in kernel_fns:
        assert classify(name) != "other", (
            f"Pallas kernel {name!r} no longer matches any trace bucket "
            "fragment — update runtime/trace.py _BUCKETS"
        )


def test_bucket_report_and_table():
    events = [
        DeviceEvent("qmm_kernel_smallm", 100.0, 10),
        DeviceEvent("flash_prefill_kernel", 50.0, 10),
        DeviceEvent("convert.7", 25.0, 5),
    ]
    rep = bucket_report(events, steps=10)
    assert rep.buckets_us["linear"] == 100.0
    assert rep.buckets_us["attention"] == 50.0
    assert rep.buckets_us["other"] == 25.0
    assert rep.total_us == 175.0
    assert rep.us_per_step("linear") == 10.0
    table = format_bucket_table(rep)
    assert "linear" in table and "qmm_kernel_smallm" in table
