"""Fused k-means Lloyd iteration (Pallas, TPU).

One pass over x per iteration computes BOTH the nearest-centroid assignment
and the centroid sums/counts — the TPU analog of the reference's
"flash-kmeans" (Triton euclid assign kernel + sorted segment-sum update,
kmeans_utils.py:464-625 / :375-421; README claims >10x over baseline).

Per grid step (b, n-block):
  - centroids (K_pad, D) stay resident in VMEM for the whole row of n-blocks
  - scores = c_sq - 2 x.c on the MXU; argmin over the lane axis -> labels
    (the ||x||^2 term is constant per row and cannot change the argmin)
  - one-hot(labels)^T @ x accumulates centroid sums on the MXU; counts
    accumulate on the VPU. Sums/counts live in revisited output blocks.

K is padded to a multiple of 128 with +inf distances so padding is never
selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _kernel(x_ref, c_ref, csq_ref, labels_ref, sums_ref, counts_ref, *, blk_n, k_pad):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        counts_ref[...] = jnp.zeros_like(counts_ref)

    x = x_ref[0]  # (blk_n, D)
    c = c_ref[0]  # (k_pad, D)
    xc = jax.lax.dot_general(
        x, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_n, k_pad)
    dist = csq_ref[0] - 2.0 * xc  # + ||x||^2 omitted (argmin-invariant)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (blk_n, k_pad), 1)
    if k_pad >= 256:
        # wide-K path (probe_kmeans_variants, v5e, K=300: 17.4 -> 14.3
        # ms/pass): cross-lane argmin lowers worse than min + compare +
        # int-min tiebreak, and the counts row-reduce moves to the MXU.
        # Bit-identical labels (first-match tiebreak) — verified on-device.
        mn = jnp.min(dist, axis=1, keepdims=True)
        labels = jnp.min(
            jnp.where(dist <= mn, iota_k, k_pad), axis=1).astype(jnp.int32)
    else:
        labels = jnp.argmin(dist, axis=1).astype(jnp.int32)  # (blk_n,)
    labels_ref[0, :, 0] = labels

    onehot = (labels[:, None] == iota_k).astype(x.dtype)
    sums_ref[0] += jax.lax.dot_general(
        onehot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if k_pad >= 256:
        ones = jnp.ones((1, blk_n), x.dtype)
        counts_ref[0] += jax.lax.dot_general(
            ones, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
    else:
        counts_ref[0, 0] += jnp.sum(onehot.astype(jnp.float32), axis=0)


@functools.partial(jax.jit, static_argnames=("blk_n", "interpret"))
def kmeans_assign_update(x, centroids, *, blk_n: int = 512, interpret: bool | None = None):
    """x: (B, N, D); centroids: (B, K, D).

    Returns (labels (B,N) int32, sums (B,K,D) f32, counts (B,K) f32).
    N must be a multiple of 128 (pad tokens map to real centroids; callers
    slice labels and should pad with duplicate tokens only for kmeans use —
    here we require N % blk_n == 0 after padding by the wrapper below).
    """
    B, N, D = x.shape
    K = centroids.shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    k_pad = -(-K // 128) * 128
    n_pad = -(-N // blk_n) * blk_n
    c = centroids.astype(x.dtype)
    if k_pad != K:
        c = jnp.pad(c, ((0, 0), (0, k_pad - K), (0, 0)))
    cf = c.astype(jnp.float32)
    csq = jnp.sum(cf * cf, axis=-1)  # (B, k_pad)
    if k_pad != K:
        csq = csq.at[:, K:].set(BIG)
    csq_flat = csq
    csq = csq[:, None, :]  # (B, 1, k_pad): TPU blocks need >=2 trailing dims
    xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0))) if n_pad != N else x

    labels, sums, counts = pl.pallas_call(
        functools.partial(_kernel, blk_n=blk_n, k_pad=k_pad),
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
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, c, csq)

    labels = labels[:, :N, 0]
    sums = sums[:, :K]
    counts = counts[:, 0, :K]
    if n_pad != N:
        # padded tokens were zeros: they all landed in one cluster; remove
        # their contribution exactly (zero vectors add nothing to sums).
        pad_labels = jnp.argmin(csq_flat[:, :K], axis=1)
        n_extra = n_pad - N
        counts = counts - n_extra * jax.nn.one_hot(pad_labels, K, dtype=jnp.float32)
    return labels, sums, counts
