"""3D rotary embeddings for video DiTs.

Wan layout (wan_orig/modules/model.py:27-59 and the fused CUDA variant
svg/kernels/include/rope/rope_enc_complex.cuh): head_dim splits into
(t, h, w) = (d - 4*(d//6), 2*(d//6), 2*(d//6)) rotary sub-spaces; rotation is
*interleaved* complex multiply over (even, odd) lanes.

Deviation from the reference: the reference multiplies in f64 for
bit-fidelity with torch's view_as_complex path; f64 on TPU is emulated and
slow, so the cos/sin cache is built in f64 *numpy* at trace time and the
on-device multiply runs in f32 (the fused CUDA kernel also uses an f32
cos/sin cache). tests/test_wan_model.py bounds the difference.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _axis_freqs(n_pos: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """(n_pos, dim/2) rotation angles, f64."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(np.arange(n_pos, dtype=np.float64), inv)


@lru_cache(maxsize=16)
def nd_rope_cos_sin(sizes: tuple, dims: tuple):
    """N-axis rope angles: cos/sin of shape (prod(sizes), sum(dims)//2), f32.

    dims: per-axis rotary sub-dims (must sum to head_dim). Covers Wan's
    (d-4(d//6), 2(d//6), 2(d//6)) split and HunyuanVideo's rope_dim_list
    (16, 56, 56) (hyvideo_orig/modules/posemb_layers.py:178-243)."""
    n = len(sizes)
    parts = []
    for ax, (sz, dim) in enumerate(zip(sizes, dims)):
        ang = _axis_freqs(sz, dim)
        shape = [1] * n + [dim // 2]
        shape[ax] = sz
        full = tuple(sizes) + (dim // 2,)
        parts.append(np.broadcast_to(ang.reshape(shape), full))
    ang = np.concatenate(parts, axis=-1).reshape(int(np.prod(sizes)), -1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def wan_rope_cos_sin(f: int, h: int, w: int, head_dim: int):
    """cos/sin caches of shape (f*h*w, head_dim//2), f32 (numpy)."""
    d = head_dim
    dt = d - 4 * (d // 6)
    dh = dw = 2 * (d // 6)
    return nd_rope_cos_sin((f, h, w), (dt, dh, dw))


def apply_rope_interleaved(x, cos, sin):
    """x: (B, H, S, D); cos/sin: (S, D/2). Interleaved complex rotation.

    out[2i]   = x[2i]*cos_i - x[2i+1]*sin_i
    out[2i+1] = x[2i]*sin_i + x[2i+1]*cos_i
    Computed in f32, returned in x.dtype.

    On TPU this dispatches to the fused Pallas kernel (ops/rope_pallas.py):
    the strided even/odd slicing below relayouts through HBM, measured
    61 GB/s vs 183+ GB/s fused at Wan-720p scale. The jnp path remains the
    reference semantics (and the CPU/interpret path).
    """
    import jax

    if jax.default_backend() == "tpu" and x.shape[2] * x.shape[3] >= 1 << 16:
        from sparse_videogen_tpu.ops.rope_pallas import apply_rope_fused

        return apply_rope_fused(x, jnp.asarray(cos), jnp.asarray(sin))
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[None, None]
    s = sin[None, None]
    o0 = x0 * c - x1 * s
    o1 = x0 * s + x1 * c
    out = jnp.stack([o0, o1], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
