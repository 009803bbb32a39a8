"""Pallas vs XLA RMSNorm bandwidth on the real TPU (VERDICT r2 item 9).

Shapes: Wan block norm (S=75,600 rows x d=1536) and narrow qk-norm rows
(B*H*S=75,600*12 rows x d=128 — the reference's narrow-row case).
GB/s counts read + write of x (bf16) only (weight negligible).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common.layers import rms_norm
from sparse_videogen_tpu.ops.rmsnorm_pallas import rms_norm_pallas
from sparse_videogen_tpu.utils.benchmark import measure_fenced

assert jax.devices()[0].platform == "tpu"

for name, shape in [("block-norm", (75600, 1536)), ("qk-norm", (12 * 75600, 128))]:
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    w = jnp.ones((shape[-1],), jnp.float32)
    xla = jax.jit(lambda x, w: rms_norm(x, w))
    gb = 2 * x.size * 2 / 1e9
    t = measure_fenced(lambda: xla(x, w), iters=5, warmup=2)
    print(f"{name} XLA:    {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s", flush=True)
    for bm in (256, 512, 1024):
        tp = measure_fenced(lambda: rms_norm_pallas(x, w, block_rows=bm), iters=5, warmup=2)
        print(f"{name} pallas bm={bm}: {tp*1e3:7.2f} ms  {gb/tp:6.1f} GB/s", flush=True)
