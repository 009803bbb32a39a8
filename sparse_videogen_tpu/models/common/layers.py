"""Shared functional layers with the reference's mixed-precision contract.

Numerics follow the reference (SURVEY.md section 7 "bit-fidelity"): norms and
modulation run in f32 regardless of activation dtype; linears run in the
activation dtype (bf16 in production).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(p, x):
    if "wi8" in p:
        # INT8 W8A8 (utils/quant.quantize_linears_int8): dynamic per-token
        # activation scales + int8 MXU dot (~1.6x bf16 at production shapes
        # — the v5e's double-rate format, analog of the reference's fp8
        # compute on H100) + per-output-channel weight rescale.
        w8 = p["wi8"]
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xi = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xi, w8, (((xi.ndim - 1,), (w8.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y.astype(jnp.float32) * s * p["wscale"].reshape(-1)).astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    if "w8" in p:
        # FP8 weight-only storage (utils/quant.py quantize_linears_fp8):
        # dequant fuses into the matmul consumer; compute stays in x.dtype,
        # matching the reference's fp8_linear_forward upconvert
        # (hyvideo_orig/modules/fp8_optimization.py:62-86)
        w = p["w8"].astype(x.dtype) * p["scale"].astype(x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    y = x @ w
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def rms_norm(x, weight, eps=1e-5):
    """WanRMSNorm semantics (wan_orig/modules/model.py:62-78): f32 norm,
    cast back, then scale by weight."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n.astype(x.dtype) * weight.astype(x.dtype))


def layer_norm_f32(x, eps=1e-6, weight=None, bias=None):
    """FP32 LayerNorm (WanLayerNorm): normalize in f32, return f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def mlp_gelu(p, x):
    """Linear -> GELU(tanh) -> Linear."""
    return linear(p["fc2"], gelu_tanh(linear(p["fc1"], x)))


def init_linear(rng, d_in, d_out, *, bias=True, dtype=jnp.float32, scale=None):
    wkey, _ = jax.random.split(rng)
    scale = (1.0 / jnp.sqrt(d_in)) if scale is None else scale
    p = {"w": (jax.random.normal(wkey, (d_in, d_out)) * scale).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def split_keys(rng, n):
    return list(jax.random.split(rng, n))
