"""Pallas RMSNorm (VERDICT r2 item 9: bound the norm-bandwidth gap).

The reference ships CUDA narrow-row RMS/LayerNorm kernels at ~810 GB/s on
H100 (README.md:139-146). Round 2 measured XLA's fused norms at 230-455 GB/s
on v5e and kept XLA (data-backed). This kernel is the one-experiment answer
to whether a hand-written Pallas norm closes the gap.

MEASURED (v5e, scripts/bench_rmsnorm_pallas.py, device-side chained loops):
XLA 282-284 GB/s at both the block-norm (75600x1536) and narrow qk-norm
(907200x128) shapes; this kernel reaches only 129-170 GB/s at block_rows
in {256, 512, 1024}. NEGATIVE RESULT — XLA's fused norm wins at every
config, so models/common/layers.py keeps the XLA implementation. (The
round-2 "455 GB/s" was a smaller-shape cache artifact; 283 GB/s is the
steady HBM-stream number. The remaining gap to the ~819 GB/s HBM class is
an XLA elementwise-emitter property that a simple row-blocked Pallas loop
does not beat.)

Semantics match layers.rms_norm exactly (WanRMSNorm,
wan_orig/modules/model.py:62-78): f32 mean-square, cast back to the input
dtype, THEN scale by weight in that dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    n = (x * jax.lax.rsqrt(ms + eps)).astype(o_ref.dtype)
    o_ref[...] = n * w_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def rms_norm_pallas(x, weight, eps: float = 1e-5, *, block_rows: int = 256,
                    interpret: bool | None = None):
    """x: (..., N, d); weight: (d,). d must be a multiple of 128."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    orig_shape = x.shape
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    N = xf.shape[0]
    bm = min(block_rows, N)
    pad = -N % bm
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(xf.shape[0] // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, weight)
    if pad:
        out = out[:N]
    return out.reshape(orig_shape)
