"""Block-aligned cluster permutation for SVG2/SAP on TPU.

The reference permutes tokens cluster-contiguously (argsort of k-means
labels, Triton gather; /root/reference/svg/kernels/triton/permute.py) and
runs a *variable-block-size* sparse attention whose block boundaries are the
cluster boundaries (patched FlashInfer VariableBlockSparseAttentionWrapper).

Variable block sizes are hostile to the TPU's static-shape compilation model,
so we make one deliberate re-design: each cluster's token range is padded to
a multiple of the attention block size. Every attention block then belongs to
exactly one (query-cluster, key-cluster) pair, the dynamic map expands to a
plain block-level mask, and padding key slots are masked exactly via
per-block valid counts. The attention output is bit-equivalent to the
variable-block formulation (softmax never sees padding); the only cost is
extra compute on padded rows/columns, bounded by n_clusters * (block-1)
tokens.

All maps here are gathers (TPU-friendly); only the token->position index map
uses one small int32 scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def padded_seq_len(seq_len: int, n_clusters: int, block: int) -> int:
    """Static upper bound on sum(ceil(size_c / block) * block)."""
    return -(-(seq_len + n_clusters * (block - 1)) // block) * block


def cluster_spans(sizes, block: int):
    """sizes: (..., C) -> (start, pad_off, pad_sizes); exclusive starts.

    start:     unpadded cluster start offsets (cumsum-exclusive of sizes)
    pad_sizes: ceil(size/block)*block
    pad_off:   padded cluster start offsets
    """
    pad_sizes = -(-sizes // block) * block
    zero = jnp.zeros_like(sizes[..., :1])
    start = jnp.cumsum(jnp.concatenate([zero, sizes[..., :-1]], axis=-1), axis=-1)
    pad_off = jnp.cumsum(jnp.concatenate([zero, pad_sizes[..., :-1]], axis=-1), axis=-1)
    return start, pad_off, pad_sizes


@partial(jax.jit, static_argnames=("n_clusters", "block", "s_pad"))
def padded_permutation(labels, sizes, *, n_clusters: int, block: int, s_pad: int):
    """Build gather/scatter maps for the block-aligned permutation.

    Args:
      labels: (B, N) int32 cluster assignment per token.
      sizes:  (B, C) int32 cluster sizes (sum over C == N).

    Returns dict of:
      src:   (B, s_pad) int32 — padded position -> source token index
             (arbitrary clamped token for padding slots).
      valid: (B, s_pad) bool  — True where the padded slot holds a real token.
      pos:   (B, N) int32     — token -> its padded position (for inverse).
      pad_off: (B, C) int32   — padded start offset of each cluster.
      block_to_cluster: (B, s_pad//block) int32 — owning cluster per block.
      kv_counts: (B, s_pad//block) int32 — valid tokens per block (0..block).
    """
    B, N = labels.shape
    start, pad_off, pad_sizes = cluster_spans(sizes, block)
    total_pad = pad_off[..., -1] + pad_sizes[..., -1]  # (B,)

    perm = jnp.argsort(labels, axis=-1).astype(jnp.int32)  # sorted-rank -> token

    # padded position j -> owning cluster
    j = jnp.arange(s_pad, dtype=jnp.int32)
    # c(j) = (#clusters with pad_off <= j) - 1
    c_of = (
        jnp.sum(j[None, None, :] >= pad_off[..., :, None], axis=-2).astype(jnp.int32) - 1
    )
    c_of = jnp.clip(c_of, 0, n_clusters - 1)  # (B, s_pad)

    r = j[None, :] - jnp.take_along_axis(pad_off, c_of, axis=-1)
    size_c = jnp.take_along_axis(sizes, c_of, axis=-1)
    valid = (r < size_c) & (j[None, :] < total_pad[:, None])
    rank = jnp.take_along_axis(start, c_of, axis=-1) + jnp.minimum(
        r, jnp.maximum(size_c - 1, 0)
    )
    src = jnp.take_along_axis(perm, jnp.clip(rank, 0, N - 1), axis=-1)

    # token -> padded position: pos[perm[g]] = pad_off[lab_sorted[g]] + (g - start[lab_sorted[g]])
    g = jnp.arange(N, dtype=jnp.int32)
    lab_sorted = jnp.take_along_axis(labels, perm, axis=-1)
    dest_sorted = (
        jnp.take_along_axis(pad_off, lab_sorted, axis=-1)
        + g[None, :]
        - jnp.take_along_axis(start, lab_sorted, axis=-1)
    ).astype(jnp.int32)
    pos = jax.vmap(lambda p, d: jnp.zeros((N,), jnp.int32).at[p].set(d))(perm, dest_sorted)

    nblk = s_pad // block
    b0 = jnp.arange(nblk, dtype=jnp.int32) * block
    blk_c = (
        jnp.sum(b0[None, None, :] >= pad_off[..., :, None], axis=-2).astype(jnp.int32) - 1
    )
    blk_c = jnp.clip(blk_c, 0, n_clusters - 1)  # (B, nblk)
    blk_size_c = jnp.take_along_axis(sizes, blk_c, axis=-1)
    blk_r = b0[None, :] - jnp.take_along_axis(pad_off, blk_c, axis=-1)
    kv_counts = jnp.clip(blk_size_c - blk_r, 0, block)
    kv_counts = jnp.where(b0[None, :] < total_pad[:, None], kv_counts, 0)

    return dict(
        src=src,
        valid=valid,
        pos=pos,
        pad_off=pad_off,
        block_to_cluster=blk_c,
        kv_counts=kv_counts.astype(jnp.int32),
    )


def gather_padded(x, src):
    """x: (B, N, D), src: (B, s_pad) -> (B, s_pad, D)."""
    return jnp.take_along_axis(x, src[..., None], axis=1)


def ungather_padded(y_pad, pos):
    """y_pad: (B, s_pad, D), pos: (B, N) -> (B, N, D) (inverse permutation)."""
    return jnp.take_along_axis(y_pad, pos[..., None], axis=1)
