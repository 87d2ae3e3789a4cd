"""Checkpoint downloader.

Capability parity with /root/reference/model_dl.py:8-56: fetch prebuilt
.gten checkpoints from the HF hub into models/, with a progress bar,
skipping files already present. Degrades with a clear message when the
environment has no network egress.
"""

from __future__ import annotations

import sys
import urllib.error
import urllib.request
from pathlib import Path

MODELS_URLS = {
    "fp16": "https://huggingface.co/iangitonga/gten/resolve/main/tinyllama.fp16.gten",
    "q8": "https://huggingface.co/iangitonga/gten/resolve/main/tinyllama.q8.gten",
    "q4": "https://huggingface.co/iangitonga/gten/resolve/main/tinyllama.q4.gten",
}


def download_model(model_id: str, models_dir: str | Path = "models") -> Path:
    """Download `tinyllama.<id>.gten` if absent; returns the local path."""
    url = MODELS_URLS[model_id]
    models_dir = Path(models_dir)
    models_dir.mkdir(exist_ok=True)
    path = models_dir / f"tinyllama.{model_id}.gten"
    if path.exists():
        return path
    print(f"Downloading {path} ...", file=sys.stderr)
    try:
        with urllib.request.urlopen(url, timeout=30) as resp, open(
            path, "wb"
        ) as out:
            total = int(resp.headers.get("Content-Length") or 0)
            done = 0
            while True:
                buf = resp.read(1 << 20)
                if not buf:
                    break
                out.write(buf)
                done += len(buf)
                if total:
                    pct = 100 * done // total
                    print(f"\r[{'=' * (pct // 2):<50}] {pct}%",
                          end="", file=sys.stderr)
            print(file=sys.stderr)
    except (urllib.error.URLError, OSError) as e:
        path.unlink(missing_ok=True)
        raise RuntimeError(
            f"Failed to download the model ({e}). Check your network "
            "connectivity, or convert a checkpoint locally with "
            "`python -m tinyllama_tpu.io.convert`."
        ) from e
    return path
