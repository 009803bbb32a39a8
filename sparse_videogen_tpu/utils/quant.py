"""Per-head absmax pseudo-quantization (FP8/INT8 experiments).

Port of pseudo_quantize_absmax_perhead (/root/reference/svg/models/utils.py:
3-64): symmetric per-head absmax quantize/dequantize of q/k/v, used to study
low-precision attention; optional random Hadamard-like rotation.

On TPU the real low-precision path is int8/fp8 matmuls in the Pallas kernel
(planned); this utility reproduces the reference's *accuracy experiment*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pseudo_quantize_absmax_perhead(x, n_bits: int = 8):
    """x: (B, H, S, D) -> fake-quantized x (same dtype).

    Symmetric absmax over each (B, H) head slice.
    """
    maxq = 2 ** (n_bits - 1) - 1
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3), keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / maxq
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -maxq - 1, maxq)
    return (q * scale).astype(x.dtype)


def random_orthogonal(dim: int, rng):
    """Random rotation for outlier smoothing (Hadamard stand-in)."""
    a = jax.random.normal(rng, (dim, dim))
    qmat, _ = jnp.linalg.qr(a)
    return qmat
