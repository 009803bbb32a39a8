"""Micro-probe: SVG1 temporal placement as gather vs reshape+transpose.

Round-2 formulation: `jnp.take(x, g, axis=2)` with a constant (S,) index
table (measured ~28 GB/s on row gathers, NOTES_ROUND2.md). Round-3: the map
is exactly a (num_frames, frame_size) transpose on the video segment, so
`temporal_transpose` emits XLA:TPU's native tiled-transpose copy instead.

Run on the real chip: `python scripts/probe_placement.py`.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import VideoLayout
from sparse_videogen_tpu.core import placement as P


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    lay = VideoLayout(num_frames=21, frame_size=3600)  # Wan 720p x 81f
    B, H, D = 1, 12, 128
    S = lay.seq_len
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, S, D)),
                    jnp.bfloat16)
    g, ginv = P.placement_indices(lay)
    gi = jnp.asarray(g, jnp.int32)

    gather = jax.jit(lambda x: jnp.take(x, gi, axis=2))
    transpose = jax.jit(lambda x: P.temporal_transpose(x, lay))
    np.testing.assert_array_equal(np.asarray(gather(x)), np.asarray(transpose(x)))

    tg = timeit(gather, x)
    tt = timeit(transpose, x)
    nbytes = 2 * x.size * 2  # read + write, bf16
    print(f"S={S} BH={B*H} D={D} bf16  bytes(rw)={nbytes/1e9:.2f} GB")
    print(f"gather:    {tg*1e3:8.2f} ms  {nbytes/tg/1e9:7.1f} GB/s")
    print(f"transpose: {tt*1e3:8.2f} ms  {nbytes/tt/1e9:7.1f} GB/s")
    print(f"speedup: {tg/tt:.2f}x")

    # placement in context: full place+select (3 tensors) as in svg1_sparse_impl
    best = jnp.asarray(np.random.default_rng(1).integers(0, 2, (B, H)), jnp.int32)
    is_t = (best == 1)[..., None, None]
    f_g = jax.jit(lambda x: jnp.where(is_t, jnp.take(x, gi, axis=2), x))
    f_t = jax.jit(lambda x: jnp.where(is_t, P.temporal_transpose(x, lay), x))
    print(f"place+select gather:    {timeit(f_g, x)*1e3:8.2f} ms")
    print(f"place+select transpose: {timeit(f_t, x)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
