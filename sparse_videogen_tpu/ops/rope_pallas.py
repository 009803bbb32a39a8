"""Fused interleaved-RoPE Pallas kernel.

The interleaved complex rotation (models/common/rope.py
apply_rope_interleaved — Wan/cog layout, reference rope_enc_complex.cuh)
needs even/odd lane de-interleave. In XLA that lowers to strided gathers +
stack/reshape relayouts: measured 60-105 GB/s at DiT scale on v5e
(scripts/bench_elementwise.py) — the same observation that drove the
reference's CUDA RoPE kernels (BASELINE.md: torch 17-32 GB/s -> kernel
159-648 GB/s on H100).

In-register formulation (no relayout):
  out[d] = x[d] * cos[d//2] + rot[d] * sgn_sin[d]
  rot[d] = d even ? x[d+1] : x[d-1]        (two lane rolls + select)
  sgn_sin[d] = (d even ? -1 : +1) * sin[d//2]
cos/sin are expanded to full-D lane tables host-side (duplicated pairs, the
sign folded into sin), so the kernel is 2 rolls + select + 2 mul + add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def expand_cos_sin(cos, sin):
    """(S, D/2) pair tables -> (S, D) f32 lane tables with the rotation sign
    folded into sin: cos2[s, d] = cos[s, d//2];
    sin2[s, d] = (-1 if d even else +1) * sin[s, d//2].

    Works on numpy (host precompute) and traced jnp arrays alike; call once
    per forward, outside the layer scan."""
    if isinstance(cos, np.ndarray):
        cos2 = np.repeat(np.asarray(cos, np.float32), 2, axis=-1)
        sin2 = np.repeat(np.asarray(sin, np.float32), 2, axis=-1)
        sin2[:, 0::2] *= -1.0
        return cos2, sin2
    cos2 = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)
    sin2 = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)
    sign = jnp.where(jnp.arange(cos2.shape[-1]) % 2 == 0, -1.0, 1.0)
    return cos2, sin2 * sign


def _rope_kernel(x_ref, cos_ref, sin_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (block_rows, W)
    W = x.shape[1]
    even = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 2 == 0
    # pltpu.roll needs shift >= 0: roll by W-1 == roll by -1. Rotation pairs
    # are lane-adjacent (2i, 2i+1) in the FLAT layout (D even, W even), so
    # the rolls never mix tokens: even lanes read +1, odd lanes read -1,
    # both inside their own pair.
    rot = jnp.where(even, pltpu.roll(x, W - 1, 1), pltpu.roll(x, 1, 1))
    o_ref[0] = (x * cos_ref[...] + rot * sin_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_width", "block_rows", "interpret"))
def rope_apply_pallas(
    x, cos2, sin2, *, row_width: int = 512, block_rows: int = 512,
    interpret: bool | None = None,
):
    """x: (BH, S, D); cos2/sin2: (S, D) expanded lane tables (f32).

    Returns rotated x (same dtype), matching apply_rope_interleaved up to
    f32 reassociation. The (S, D) plane is viewed as rows of `row_width`
    lanes so blocks are wide 2D tiles (a narrow D=64 minor dim caps copy
    bandwidth at ~160 GB/s; flat 512-lane rows reach the elementwise
    roofline). Pair-adjacency survives flattening, see _rope_kernel."""
    BH, S, D = x.shape
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if D >= 128:
        # the (BH, S, D) layout is already lane-full: direct 3D blocks avoid
        # the flat-view reshape, which physically retiles the array (measured
        # 183 vs 110 GB/s at Wan-720p D=128)
        return _rope_direct(x, cos2, sin2, block_s=block_rows, interpret=interpret)
    W = row_width
    assert W % D == 0 or D % W == 0, (W, D)
    tok_per_row = max(1, W // D)
    if S % tok_per_row:
        pad = -S % tok_per_row
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        cos2 = jnp.pad(cos2, ((0, pad), (0, 0)))
        sin2 = jnp.pad(sin2, ((0, pad), (0, 0)))
        out = rope_apply_pallas(
            x, cos2, sin2, row_width=row_width, block_rows=block_rows,
            interpret=interpret,
        )
        return out[:, :S]
    R = S * D // W
    br = min(block_rows, R)
    xf = x.reshape(BH, R, W)
    ct = cos2.reshape(R, W)
    st = sin2.reshape(R, W)
    if R % br:
        padr = -R % br
        xf = jnp.pad(xf, ((0, 0), (0, padr), (0, 0)))
        ct = jnp.pad(ct, ((0, padr), (0, 0)))
        st = jnp.pad(st, ((0, padr), (0, 0)))
        R += padr
    # row-block outer, head inner: the table block index is constant across
    # the inner axis so its re-fetch is skipped
    grid = (R // br, BH)
    out = pl.pallas_call(
        _rope_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, br, W), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, W), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, R, W), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xf, ct, st)
    return out[:, : S * D // W].reshape(BH, S, D)


def apply_rope_fused(x, cos, sin):
    """Drop-in for apply_rope_interleaved on (B, H, S, D) inputs: uses the
    Pallas kernel on TPU, falls back to the XLA path on CPU hosts where the
    relayout cost does not exist."""
    B, H, S, D = x.shape
    cos2, sin2 = expand_cos_sin(cos, sin)
    out = rope_apply_pallas(
        x.reshape(B * H, S, D), jnp.asarray(cos2), jnp.asarray(sin2)
    )
    return out.reshape(B, H, S, D)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _rope_direct(x, cos2, sin2, *, block_s: int = 512, interpret: bool = False):
    """Direct (1, block_s, D) blocks for lane-full head dims (D >= 128)."""
    BH, S, D = x.shape
    block_s = min(block_s, S)
    if S % block_s:
        pad = -S % block_s
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        cos2 = jnp.pad(cos2, ((0, pad), (0, 0)))
        sin2 = jnp.pad(sin2, ((0, pad), (0, 0)))
        out = _rope_direct(x, cos2, sin2, block_s=block_s, interpret=interpret)
        return out[:, :S]
    grid = (S // block_s, BH)
    return pl.pallas_call(
        _rope_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, D), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, D), lambda i, b: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_s, D), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, cos2, sin2)
