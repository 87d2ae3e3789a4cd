"""RMS normalization.

Parity target: gten's rms_norm (/root/reference/gten/ops.h:762-814), which
normalizes as ``x / (sqrt(mean(x^2)) + eps) * w`` — note the epsilon is added
to the *root* mean square, outside the sqrt. HF Llama instead computes
``x * rsqrt(mean(x^2) + eps)``; both conventions are supported and selected
by ModelConfig.norm_eps_inside_sqrt.

Left to XLA fusion on TPU (a reduction + elementwise chain fuses into one
VPU pass; a Pallas kernel would add nothing here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 1e-6,
    eps_inside_sqrt: bool = False,
) -> jnp.ndarray:
    """Normalize the last axis. Computes in f32, returns x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    if eps_inside_sqrt:
        normed = xf * jax.lax.rsqrt(ms + eps)
    else:
        normed = xf / (jnp.sqrt(ms) + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
