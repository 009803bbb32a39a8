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
def wan_rope_cos_sin(f: int, h: int, w: int, head_dim: int):
    """cos/sin caches of shape (f*h*w, head_dim//2), f32 (numpy)."""
    d = head_dim
    dt = d - 4 * (d // 6)
    dh = dw = 2 * (d // 6)
    ang_t = _axis_freqs(f, dt)[:, None, None, :]  # (f,1,1,dt/2)
    ang_h = _axis_freqs(h, dh)[None, :, None, :]
    ang_w = _axis_freqs(w, dw)[None, None, :, :]
    ang = np.concatenate(
        [
            np.broadcast_to(ang_t, (f, h, w, dt // 2)),
            np.broadcast_to(ang_h, (f, h, w, dh // 2)),
            np.broadcast_to(ang_w, (f, h, w, dw // 2)),
        ],
        axis=-1,
    ).reshape(f * h * w, d // 2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope_interleaved(x, cos, sin):
    """x: (B, H, S, D); cos/sin: (S, D/2). Interleaved complex rotation.

    out[2i]   = x[2i]*cos_i - x[2i+1]*sin_i
    out[2i+1] = x[2i]*sin_i + x[2i+1]*cos_i
    Computed in f32, returned in x.dtype.
    """
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[None, None]
    s = sin[None, None]
    o0 = x0 * c - x1 * s
    o1 = x0 * s + x1 * c
    out = jnp.stack([o0, o1], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
