"""Permutation-sort formulations for SAP glue on the real TPU.

The q and kv permutations each pay a (BH, S) int32 sort; padded_permutation
pays a second (inverse) sort. Candidates:
  A. sort_key_val(labels, iota)        — current form (2 arrays through sort)
  B. single-array sort of packed keys  — labels * 2^17 | iota (labels < 2^13,
     S < 2^17), halves sort traffic; perm = sorted & (2^17 - 1)
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.utils.benchmark import measure

BH, S, C = 40, 75600, 1000
key = jax.random.PRNGKey(0)
labels = jax.random.randint(key, (BH, S), 0, C, jnp.int32)
iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)

SHIFT = 1 << 17
assert S < SHIFT and C * SHIFT < 2**31


@jax.jit
def form_a(labels):
    return jax.lax.sort_key_val(labels, iota, dimension=-1)[1]


@jax.jit
def form_b(labels):
    packed = labels * SHIFT + iota
    s = jax.lax.sort(packed, dimension=-1)
    return jax.lax.rem(s, SHIFT)


pa = jax.block_until_ready(form_a(labels))
pb = jax.block_until_ready(form_b(labels))
print("equal:", bool(jnp.all(pa == pb)))
print(f"A sort_key_val : {measure(lambda: form_a(labels), iters=5, warmup=2)*1e3:7.1f} ms")
print(f"B packed sort  : {measure(lambda: form_b(labels), iters=5, warmup=2)*1e3:7.1f} ms")

# inverse-permutation forms: pos such that pos[perm[g]] = dest[g]
dest = jax.random.randint(jax.random.PRNGKey(1), (BH, S), 0, 150000, jnp.int32)


@jax.jit
def inv_a(perm, dest):
    return jax.lax.sort_key_val(perm, dest, dimension=-1)[1]


@jax.jit
def inv_scatter(perm, dest):
    bidx = jnp.arange(BH, dtype=jnp.int32)[:, None]
    return jnp.zeros((BH, S), jnp.int32).at[bidx, perm].set(dest, mode="drop",
                                                            unique_indices=True)


ia = jax.block_until_ready(inv_a(pa, dest))
ib = jax.block_until_ready(inv_scatter(pa, dest))
print("inv equal:", bool(jnp.all(ia == ib)))
print(f"inv sort   : {measure(lambda: inv_a(pa, dest), iters=5, warmup=2)*1e3:7.1f} ms")
print(f"inv scatter: {measure(lambda: inv_scatter(pa, dest), iters=5, warmup=2)*1e3:7.1f} ms")
