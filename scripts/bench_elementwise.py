"""Norm/RoPE bandwidth microbenches vs the reference's CUDA kernel tables.

BASELINE.md publishes RMSNorm/LayerNorm/RoPE GB/s for the reference's
sm90a kernels (~805-810 GB/s = H100 HBM saturation). SURVEY.md section 7.2d
says: use XLA for these unless a benchmark shows Pallas is needed. This
script produces that benchmark on the v5e (HBM ~820 GB/s class).

Timing: device-side lax.fori_loop repetition (the op output feeds the next
iteration) — single-dispatch timing through the axon relay is dominated by
~ms RTT, so per-op host timing undercounts bandwidth by 10-30x.

Bytes counted like the reference bench (read input + write output, bf16;
RoPE: q in/out -- we time q-only and report q+k-equivalent bandwidth).

Usage: python scripts/bench_elementwise.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common import layers as L
from sparse_videogen_tpu.models.common.rope import apply_rope_interleaved, wan_rope_cos_sin

assert jax.devices()[0].platform == "tpu"
ITERS = 50


def loop_time(fn, *args):
    """Seconds per fn application: chained applications in one jitted
    fori_loop, timed at two loop lengths; the difference cancels the ~30 ms
    axon dispatch/readiness floor (single-call timing is meaningless here)."""

    import numpy as np

    def timed(n):
        @jax.jit
        def run(x, *rest):
            return jax.lax.fori_loop(0, n, lambda i, x: fn(x, *rest), x)

        np.asarray(run(*args)[:1, :1])  # compile + warm (forced readback)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(*args)[:1, :1])  # readback forces completion
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (timed(4 * ITERS) - timed(ITERS)) / (3 * ITERS)


print("== RMSNorm bf16 (ref kernel 810 GB/s on H100; torch 151-252) ==")
for batch, hidden in ((2097152, 32), (1048576, 64), (524288, 128), (262144, 256)):
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, hidden), jnp.bfloat16)
    w = jnp.ones((hidden,), jnp.float32)
    t = loop_time(lambda x, w: L.rms_norm(x, w).astype(jnp.bfloat16), x, w)
    gbs = 2 * batch * hidden * 2 / t / 1e9
    print(f"  {batch:8d} x {hidden:3d}: {t*1e6:8.1f} us  {gbs:6.1f} GB/s", flush=True)

print("== LayerNorm f32-internal (ref kernel 804 GB/s; torch 46-351) ==")
for batch, hidden in ((2097152, 32), (1048576, 64), (524288, 128), (262144, 256)):
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, hidden), jnp.bfloat16)
    w = jnp.ones((hidden,), jnp.float32)
    b = jnp.zeros((hidden,), jnp.float32)
    t = loop_time(lambda x, w, b: L.layer_norm_f32(x, 1e-6, w, b).astype(jnp.bfloat16), x, w, b)
    gbs = 2 * batch * hidden * 2 / t / 1e9
    print(f"  {batch:8d} x {hidden:3d}: {t*1e6:8.1f} us  {gbs:6.1f} GB/s", flush=True)

print("== RoPE interleaved (ref kernel 159-648 GB/s; torch 17-32) ==")
for B, H, S, D in ((1, 32, 1024, 64), (1, 32, 4096, 64), (1, 32, 16384, 64),
                   (4, 32, 1024, 64), (4, 32, 4096, 64), (4, 32, 16384, 64)):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
    c, s = wan_rope_cos_sin(1, 1, S, D)
    c, s = jnp.asarray(c), jnp.asarray(s)
    t = loop_time(lambda q, c, s: apply_rope_interleaved(q, c, s), q, c, s)
    gbs = 2 * B * H * S * D * 2 / t / 1e9
    print(f"  B{B} H{H} S{S:5d} D{D}: {t*1e6:8.1f} us  {gbs:6.1f} GB/s", flush=True)

print("== RoPE Pallas fused (ops/rope_pallas.py) ==")
from sparse_videogen_tpu.ops.rope_pallas import expand_cos_sin, rope_apply_pallas

for B, H, S, D in ((1, 32, 16384, 64), (4, 32, 4096, 64), (4, 32, 16384, 64),
                   (2, 12, 75600, 128)):
    q = jax.random.normal(jax.random.PRNGKey(0), (B * H, S, D), jnp.bfloat16)
    c, s = wan_rope_cos_sin(1, 1, S, D)
    c2, s2 = expand_cos_sin(c, s)
    c2, s2 = jnp.asarray(c2), jnp.asarray(s2)
    t = loop_time(lambda q, c2, s2: rope_apply_pallas(q, c2, s2), q, c2, s2)
    gbs = 2 * B * H * S * D * 2 / t / 1e9
    print(f"  B{B} H{H} S{S:5d} D{D}: {t*1e6:8.1f} us  {gbs:6.1f} GB/s", flush=True)
