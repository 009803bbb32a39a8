"""Per-head row-gather formulations at SAP scale (BH=40, S=75,600, D=128).

The SAP permutation is a per-head row gather; XLA's take_along_axis was the
measured SAP bottleneck class (round-2: ~28 GB/s vs 89 GB/s copy). This
probe compares formulations on the real chip:
  a) take_along_axis, random per-head permutation      (worst case)
  b) take_along_axis, cluster-sorted permutation       (the actual SAP case:
     ascending within ~QC cluster runs)
  c) flat global-index jnp.take on (BH*S, D)           (single gather)
  d) shared constant permutation across heads          (lower bound)
  e) contiguous copy                                   (ceiling)

Usage: python scripts/probe_gather.py [BH] [S]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BH = int(sys.argv[1]) if len(sys.argv) > 1 else 40
S = int(sys.argv[2]) if len(sys.argv) > 2 else 75600
D = 128
QC = 300


def fence(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, *a, iters=10):
    fence(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    fence(o)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BH, S, D)), jnp.bfloat16)
    nbytes = 2 * x.size * 2  # rw, bf16

    # random per-head permutations
    perm_rand = np.stack([rng.permutation(S) for _ in range(BH)]).astype(np.int32)
    # cluster-sorted: assign random labels in QC spatially-coherent chunks,
    # stable-sort -> ascending runs (the padded_permutation output pattern)
    labels = rng.integers(0, QC, (BH, S // 252 + 1)).repeat(252, axis=1)[:, :S]
    perm_sort = np.argsort(labels, axis=1, kind="stable").astype(np.int32)

    cases = {}
    ta = jax.jit(lambda x, p: jnp.take_along_axis(x, p[..., None], axis=1))
    cases["a) taa random"] = (ta, (x, jnp.asarray(perm_rand)))
    cases["b) taa cluster-sorted"] = (ta, (x, jnp.asarray(perm_sort)))

    flat = (perm_sort + (np.arange(BH)[:, None] * S)).reshape(-1).astype(np.int32)
    fl = jax.jit(lambda x, f: jnp.take(x.reshape(BH * S, D), f, axis=0).reshape(BH, S, D))
    cases["c) flat global take"] = (fl, (x, jnp.asarray(flat)))

    shared = jnp.asarray(perm_sort[0])
    sh = jax.jit(lambda x: jnp.take(x, shared, axis=1))
    cases["d) shared constant"] = (sh, (x,))

    cp = jax.jit(lambda x: x + 0)
    cases["e) copy"] = (cp, (x,))

    for name, (fn, args) in cases.items():
        t = timeit(fn, *args)
        print(f"{name:24s} {t*1e3:8.2f} ms  {nbytes/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
