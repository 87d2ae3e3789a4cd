"""ctypes bindings to the C++ native runtime (native/libtinyllama_native.so).

The TPU compute path is JAX/XLA/Pallas; this library accelerates the host
runtime around it — gten payload decoding (GB-scale byte deinterleaving at
checkpoint load) and BPE tokenizer encode. Every entry point has a pure-
Python fallback, so the .so is optional (`make -C native` to build).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libtinyllama_native.so"

_lib: ctypes.CDLL | None = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_LIB_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load(build_if_missing: bool = True) -> ctypes.CDLL | None:
    """Load (building on first use if needed) the native library, or None."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and build_if_missing:
        _try_build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.q8_deinterleave.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.q4_gten_to_planar.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.tok_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.tok_create.restype = ctypes.c_void_p
    lib.tok_destroy.argtypes = [ctypes.c_void_p]
    lib.tok_encode_raw.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.tok_encode_raw.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# gten payload decoding
# ---------------------------------------------------------------------------


def q8_deinterleave(payload: bytes | memoryview, n_blocks: int):
    """-> (int8 values [n_blocks*32], f16 deltas [n_blocks]) or None."""
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(payload, np.uint8)
    vals = np.empty(n_blocks * 32, np.int8)
    deltas = np.empty(n_blocks, np.uint16)
    lib.q8_deinterleave(
        buf.ctypes.data, n_blocks, vals.ctypes.data, deltas.ctypes.data
    )
    return vals, deltas.view(np.float16)


def q4_gten_to_planar(
    payload: bytes | memoryview, d_out: int, d_in: int, group: int
):
    """-> (group-planar packed int8 [d_out, d_in//2], f16 deltas
    [d_out, d_in//32]) or None."""
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(payload, np.uint8)
    packed = np.empty((d_out, d_in // 2), np.int8)
    deltas = np.empty((d_out, d_in // 32), np.uint16)
    lib.q4_gten_to_planar(
        buf.ctypes.data, d_out, d_in, group,
        packed.ctypes.data, deltas.ctypes.data,
    )
    return packed, deltas.view(np.float16)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


class NativeTokenizerEncoder:
    """Native BPE encode; decode stays in Python (cheap)."""

    def __init__(self, path: str | Path, vocab_size: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.tok_create(str(path).encode(), vocab_size)
        if not self._handle:
            raise RuntimeError(f"tok_create failed for {path}")

    def encode_raw(self, text: str | bytes) -> list[int]:
        if isinstance(text, str):
            text = text.encode("utf-8")
        cap = len(text) + 8
        out = (ctypes.c_int * cap)()
        n = self._lib.tok_encode_raw(self._handle, text, len(text), out, cap)
        if n < 0:
            raise RuntimeError("tok_encode_raw: output buffer too small")
        return list(out[:n])

    def __del__(self):
        try:
            if self._handle:
                self._lib.tok_destroy(self._handle)
        except Exception:
            pass
