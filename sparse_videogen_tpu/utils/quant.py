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


# ---------------------------------------------------------------------------
# FP8 weight-only storage (the reference's convert_fp8_linear path:
# hyvideo_orig/modules/fp8_optimization.py — E4M3 weights + per-tensor scale,
# upconverted before the matmul). TPU v5e has no fp8 matmul; like the
# reference on pre-Hopper parts, fp8 here halves weight HBM (and the
# memory-bound weight streaming of big linears), while compute stays bf16.
# ---------------------------------------------------------------------------

E4M3_MAX = 448.0


def fp8_quantize_linear(p: dict, dtype=jnp.float8_e4m3fn) -> dict:
    """{"w": (..., di, do), "b"?} -> {"w8", "scale", "b"?}.

    Per-tensor absmax scale; for stacked per-layer weights (L, di, do) the
    scale is per layer (L, 1, 1), matching the reference's per-linear scale.
    """
    w = jnp.asarray(p["w"], jnp.float32)
    axes = tuple(range(w.ndim - 2, w.ndim))
    absmax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / E4M3_MAX
    out = {k: v for k, v in p.items() if k != "w"}
    out["w8"] = (w / scale).astype(dtype)
    out["scale"] = scale
    return out


# ---------------------------------------------------------------------------
# INT8 W8A8 (TPU-native analog of the reference's fp8 *compute* path).
# H100 fp8 matmuls run at 2x bf16; the v5e MXU's double-rate format is int8
# (measured 1.6x bf16 at production shapes, scripts/probe_int8-class runs:
# 265 TOPs vs 164 TFLOPs at M=119k K=3k N=12k). Weights: symmetric
# per-output-channel int8. Activations: dynamic per-token absmax scales,
# computed inline (fuses into the dot's producer; measured free).
# ---------------------------------------------------------------------------


def int8_quantize_linear(p: dict) -> dict:
    """{"w": (..., di, do), "b"?} -> {"wi8", "wscale", "b"?}."""
    w = jnp.asarray(p["w"], jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per output channel
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    out = {k: v for k, v in p.items() if k != "w"}
    out["wi8"] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out["wscale"] = scale
    return out


def _walk_linears(tree, fn, min_size):
    if isinstance(tree, dict):
        w = tree.get("w")
        if (
            w is not None
            and hasattr(w, "ndim")
            and w.ndim >= 2
            and w.size >= min_size
            and jnp.issubdtype(w.dtype, jnp.floating)
        ):
            return fn(tree)
        return {k: _walk_linears(v, fn, min_size) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_walk_linears(v, fn, min_size) for v in tree)
    return tree


def quantize_linears_int8(tree, *, min_size: int = 1 << 16):
    """Walk a param pytree and convert every linear dict {"w": 2D+} with at
    least `min_size` elements to int8 W8A8 (embeddings/norms untouched)."""
    return _walk_linears(tree, int8_quantize_linear, min_size)


def quantize_linears_fp8(tree, *, min_size: int = 1 << 16, dtype=jnp.float8_e4m3fn):
    """Walk a param pytree and convert every linear dict {"w": 2D+} whose
    weight has at least `min_size` elements (embeddings/norms untouched —
    the reference also only converts block linears)."""
    if isinstance(tree, dict):
        w = tree.get("w")
        if (
            w is not None
            and hasattr(w, "ndim")
            and w.ndim >= 2
            and w.size >= min_size
            and jnp.issubdtype(w.dtype, jnp.floating)
        ):
            return fp8_quantize_linear(tree, dtype=dtype)
        return {k: quantize_linears_fp8(v, min_size=min_size, dtype=dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_linears_fp8(v, min_size=min_size, dtype=dtype) for v in tree)
    return tree
