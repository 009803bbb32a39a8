"""Pallas vs XLA RMSNorm bandwidth on the real TPU (VERDICT r2 item 9).

Shapes: Wan block norm (S=75,600 rows x d=1536) and narrow qk-norm rows
(B*H*S=75,600*12 rows x d=128 — the reference's narrow-row case).
GB/s counts read + write of x (bf16) only (weight negligible).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common.layers import rms_norm
from sparse_videogen_tpu.ops.rmsnorm_pallas import rms_norm_pallas
from sparse_videogen_tpu.utils.benchmark import measure_fenced

assert jax.devices()[0].platform == "tpu"

LOOP = 50  # device-side repetitions: a single norm (~1 ms) is below the
           # ~30 ms axon dispatch floor, so each timed call runs a chained
           # fori_loop (iteration i reads iteration i-1's output)


def looped(fn):
    @jax.jit
    def run(x, w):
        return jax.lax.fori_loop(0, LOOP, lambda i, acc: fn(acc, w).astype(acc.dtype), x)
    return run


for name, shape in [("block-norm", (75600, 1536)), ("qk-norm", (12 * 75600, 128))]:
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    w = jnp.ones((shape[-1],), jnp.float32)
    xla = looped(rms_norm)
    gb = 2 * x.size * 2 / 1e9
    t = measure_fenced(lambda: xla(x, w), iters=3, warmup=1) / LOOP
    print(f"{name} XLA:    {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s", flush=True)
    for bm in (256, 512, 1024):
        pl_fn = looped(functools.partial(rms_norm_pallas, block_rows=bm))
        tp = measure_fenced(lambda: pl_fn(x, w), iters=3, warmup=1) / LOOP
        print(f"{name} pallas bm={bm}: {tp*1e3:7.2f} ms  {gb/tp:6.1f} GB/s", flush=True)
