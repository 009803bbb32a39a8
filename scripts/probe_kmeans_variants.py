"""Isolate the k-means fused-pass cost (real TPU).

probe_kmeans_blk: ~40 ms/pass at (40, 75600, 128) K=300 vs ~4 ms analytic
(MXU 3 ms + x read 1 ms), flat across blk_n — the overhead is inside the
kernel body. Suspects: the cross-LANE jnp.argmin over (blk_n, k_pad), the
one-hot construction, the VPU counts reduce. Variants:

  A baseline           argmin -> labels; onehot = (labels == iota)
  B two-min            min -> onehot = (dist == min); labels = min(where(onehot, iota, K))
  C two-min+mxu-counts B with counts via ones @ onehot on the MXU
  D no-labels          onehot from min only, labels never computed (bound)
  E assign-only        argmin labels, no sums/counts (bound from other side)
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_videogen_tpu.utils.benchmark import measure, measure_fenced

BIG = 1e30


def _kernel(x_ref, c_ref, csq_ref, labels_ref, sums_ref, counts_ref, *,
            blk_n, k_pad, variant):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        counts_ref[...] = jnp.zeros_like(counts_ref)

    x = x_ref[0]
    c = c_ref[0]
    xc = jax.lax.dot_general(
        x, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dist = csq_ref[0] - 2.0 * xc

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (blk_n, k_pad), 1)
    if variant == "A" or variant == "E":
        labels = jnp.argmin(dist, axis=1).astype(jnp.int32)
        labels_ref[0, :, 0] = labels
        if variant == "E":
            return
        onehot = (labels[:, None] == iota_k).astype(x.dtype)
    else:
        mn = jnp.min(dist, axis=1, keepdims=True)
        oh_b = dist <= mn
        if variant != "D":
            # first-match tiebreak identical to argmin
            labels = jnp.min(jnp.where(oh_b, iota_k, k_pad), axis=1).astype(jnp.int32)
            labels_ref[0, :, 0] = labels
            onehot = (labels[:, None] == iota_k).astype(x.dtype)
        else:
            labels_ref[0, :, 0] = jnp.zeros((blk_n,), jnp.int32)
            onehot = oh_b.astype(x.dtype)
    sums_ref[0] += jax.lax.dot_general(
        onehot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if variant == "C":
        ones = jnp.ones((1, blk_n), x.dtype)
        counts_ref[0] += jax.lax.dot_general(
            ones, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
    else:
        counts_ref[0, 0] += jnp.sum(onehot.astype(jnp.float32), axis=0)


def run(x, centroids, blk_n, variant):
    B, N, D = x.shape
    K = centroids.shape[1]
    k_pad = -(-K // 128) * 128
    n_pad = -(-N // blk_n) * blk_n
    c = centroids.astype(x.dtype)
    if k_pad != K:
        c = jnp.pad(c, ((0, 0), (0, k_pad - K), (0, 0)))
    cf = c.astype(jnp.float32)
    csq = jnp.sum(cf * cf, axis=-1)
    if k_pad != K:
        csq = csq.at[:, K:].set(BIG)
    csq = csq[:, None, :]
    xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0))) if n_pad != N else x
    return pl.pallas_call(
        functools.partial(_kernel, blk_n=blk_n, k_pad=k_pad, variant=variant),
        grid=(B, n_pad // blk_n),
        in_specs=[
            pl.BlockSpec((1, blk_n, D), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, D), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_n, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, D), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, k_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, k_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, c, csq)


B, N, D = 40, 75600, 128
rng = np.random.default_rng(0)
centers = rng.standard_normal((12, D)) * 2.5
assign = rng.integers(0, 12, N)
base = centers[assign] + 0.35 * rng.standard_normal((N, D))
x = jnp.asarray(np.broadcast_to(base, (B, N, D)).copy(), jnp.bfloat16)

ref_labels = None
for K in (300, 125):
    cents = jnp.asarray(rng.standard_normal((B, K, D)), jnp.bfloat16)
    for variant in ("A", "B", "C", "D", "E"):
        f = jax.jit(lambda x, c, v=variant: run(x, c, 512, v))
        out = jax.block_until_ready(f(x, cents))
        ms = measure(lambda: f(x, cents), iters=20, warmup=2) * 1e3
        tag = ""
        if variant == "A":
            ref = out
        elif variant in ("B", "C"):
            same = (np.array_equal(np.asarray(out[0]), np.asarray(ref[0]))
                    and np.allclose(np.asarray(out[1]), np.asarray(ref[1]))
                    and np.allclose(np.asarray(out[2]), np.asarray(ref[2])))
            tag = "  exact-match" if same else "  MISMATCH"
        print(f"K={K:4d} {variant}: {ms:7.2f} ms/pass{tag}", flush=True)
