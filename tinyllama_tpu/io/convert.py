"""Offline HF-checkpoint -> .gten converter.

Capability parity with /root/reference/tinyllama_to_gten.py:151-209:
reads a HF PyTorch checkpoint (torch .bin/.pt state dict, or .safetensors)
and writes a fp16/q8/q4 .gten file in the loader's exact weight order.
Usage: ``python -m tinyllama_tpu.io.convert MPATH {fp16,q8,q4} [-o OUT]``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from tinyllama_tpu.config import MODEL_REGISTRY, TINYLLAMA_1_1B, ModelConfig
from tinyllama_tpu.io import gten


def load_hf_state_dict(mpath: str | Path) -> dict[str, np.ndarray]:
    mpath = Path(mpath)
    if mpath.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(mpath)
    import torch

    with open(mpath, "rb") as f:
        ckpt = torch.load(f, map_location="cpu", weights_only=True)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.to(torch.float32).numpy() for k, v in ckpt.items()}


def convert_model_to_gten(
    mpath: str | Path,
    dtype: str,
    out_path: str | Path | None = None,
    cfg: ModelConfig = TINYLLAMA_1_1B,
) -> Path:
    weights = load_hf_state_dict(mpath)
    out_path = Path(out_path or f"tinyllama.{dtype}.gten")
    gten.write_gten(out_path, cfg, weights, dtype)
    return out_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mpath", help="Model path to be converted.")
    parser.add_argument("dtype", help="output dtype.", choices=("fp16", "q8", "q4"))
    parser.add_argument("-o", "--out", default=None, help="output .gten path")
    parser.add_argument(
        "--model", default=TINYLLAMA_1_1B.name, choices=sorted(MODEL_REGISTRY),
        help="architecture preset",
    )
    args = parser.parse_args(argv)
    out = convert_model_to_gten(
        args.mpath, args.dtype, args.out, MODEL_REGISTRY[args.model]
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
