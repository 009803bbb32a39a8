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

TPU cost model (measured on v5e): XLA scatters serialize, element gathers
from small tables run ~7ms for (12, 58k) — so this module
  - uses lax.sort_key_val to produce sorted labels / inverse maps as sort
    payloads instead of gather/scatter,
  - computes all per-slot cluster quantities at 128-token sub-block
    granularity (blocks never span clusters) and expands with jnp.repeat,
  - gathers from small (<=1024-entry) per-row tables via one-hot matmuls
    (MXU bandwidth) rather than XLA element gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SUB = 128


def padded_seq_len(seq_len: int, n_clusters: int, block: int) -> int:
    """Static upper bound on sum(ceil(size_c / block) * block)."""
    return -(-(seq_len + n_clusters * (block - 1)) // block) * block


def cluster_spans(sizes, block: int):
    """sizes: (..., C) -> (start, pad_off, pad_sizes); exclusive starts."""
    pad_sizes = -(-sizes // block) * block
    zero = jnp.zeros_like(sizes[..., :1])
    start = jnp.cumsum(jnp.concatenate([zero, sizes[..., :-1]], axis=-1), axis=-1)
    pad_off = jnp.cumsum(jnp.concatenate([zero, pad_sizes[..., :-1]], axis=-1), axis=-1)
    return start, pad_off, pad_sizes


def _gather_small_f32(table_f32, idx, n: int):
    onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    return jnp.einsum("bmn,bn->bm", onehot, table_f32, preferred_element_type=jnp.float32)


def gather_small_i32(table, idx, n: int, *, chunk: int = 8192):
    """Per-row element gather from a small table via one-hot matmul.

    table: (B, n) int32 with |values| < 2^24 (exact in f32); idx: (B, M).
    XLA element gathers run far below bandwidth on TPU (~5 ns/element); the
    one-hot matmul hits the MXU instead. Large M is chunked with lax.map so
    only a (B, chunk, n) one-hot is ever materialized.
    """
    B, M = idx.shape
    tf = table.astype(jnp.float32)
    if B * M * n * 4 <= 1 << 27:  # 128 MB: single shot
        return _gather_small_f32(tf, idx, n).astype(jnp.int32)
    n_chunks = -(-M // chunk)
    pad = n_chunks * chunk - M
    ip = jnp.pad(idx, ((0, 0), (0, pad))) if pad else idx
    ip = ip.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    out = jax.lax.map(lambda ic: _gather_small_f32(tf, ic, n), ip)
    out = out.transpose(1, 0, 2).reshape(B, n_chunks * chunk)
    return out[:, :M].astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_clusters", "block", "s_pad"))
def padded_permutation(labels, sizes, *, n_clusters: int, block: int, s_pad: int):
    """Build gather maps for the block-aligned permutation.

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
    C = n_clusters
    start, pad_off, pad_sizes = cluster_spans(sizes, block)
    total_pad = pad_off[..., -1] + pad_sizes[..., -1]  # (B,)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    lab_sorted, perm = jax.lax.sort_key_val(labels, iota_n, dimension=-1)

    # block-level cluster ownership (blocks never span clusters)
    nblk = s_pad // block
    b0 = jnp.arange(nblk, dtype=jnp.int32) * block
    blk_c = (
        jnp.sum(b0[None, None, :] >= pad_off[..., :, None], axis=-2).astype(jnp.int32) - 1
    )
    blk_c = jnp.clip(blk_c, 0, C - 1)  # (B, nblk)
    blk_size = gather_small_i32(sizes, blk_c, C)
    blk_padoff = gather_small_i32(pad_off, blk_c, C)
    blk_start = gather_small_i32(start, blk_c, C)
    blk_r = b0[None, :] - blk_padoff
    kv_counts = jnp.clip(blk_size - blk_r, 0, block)
    kv_counts = jnp.where(b0[None, :] < total_pad[:, None], kv_counts, 0)

    # expand block-level quantities to slots
    rep = lambda x: jnp.repeat(x, block, axis=-1, total_repeat_length=s_pad)
    j = jnp.arange(s_pad, dtype=jnp.int32)[None, :]
    size_s = rep(blk_size)
    r = j - rep(blk_padoff)
    valid = (r < size_s) & (j < total_pad[:, None])
    rank = rep(blk_start) + jnp.minimum(r, jnp.maximum(size_s - 1, 0))
    src = jnp.take_along_axis(perm, jnp.clip(rank, 0, N - 1), axis=-1)

    # token -> padded position: dest of sorted-rank g is
    # g + (pad_off - start)[lab_sorted[g]] (cumulative padding inserted before
    # the token's cluster); sorting it by perm (payload trick) yields pos
    # without an inverse-permutation gather.
    #
    # The per-token lookup is GATHER-FREE: lab_sorted is non-decreasing and
    # cumpad = pad_off - start is non-decreasing in the cluster id, so
    # scatter each cluster's padding increment at its first sorted position
    # (scatter-add absorbs empty clusters' coincident starts; clusters with
    # start == N have no tokens and are dropped) and cumsum over g. This
    # replaced a chunked one-hot matmul that moved ~4 GB at Wan-720p scale
    # (the dominant cost of the SAP index build).
    g = jnp.arange(N, dtype=jnp.int32)[None, :]
    cumpad = pad_off - start  # (B, C), non-decreasing
    inc = jnp.diff(cumpad, axis=-1, prepend=jnp.zeros_like(cumpad[..., :1]))
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    A = jnp.zeros((B, N), jnp.int32).at[bidx, start].add(inc, mode="drop")
    dest_sorted = g + jnp.cumsum(A, axis=-1)
    _, pos = jax.lax.sort_key_val(perm, dest_sorted, dimension=-1)

    return dict(
        src=src,
        valid=valid,
        pos=pos,
        pad_off=pad_off,
        block_to_cluster=blk_c,
        kv_counts=kv_counts.astype(jnp.int32),
    )


def flat_row_gather(x, idx):
    """Per-batch row gather as ONE flat non-batched gather.

    x: (B, N, D), idx: (B, M) with values in [0, N) -> (B, M, D).
    XLA:TPU's batched take_along_axis moves one 256 B row per index
    (measured 42 GB/s at (40, 75600, 128) bf16); collapsing the batch into
    the index (idx + b*N over a (B*N, D) view) hits the flat-gather path at
    ~77 GB/s (scripts/probe_gather.py). The per-head shared-index form runs
    at ~121-141 GB/s but needs identical indices across heads — impossible
    for SAP's per-head permutations."""
    B, N, D = x.shape
    g = (idx.astype(jnp.int32) + jnp.arange(B, dtype=jnp.int32)[:, None] * N).reshape(-1)
    return x.reshape(B * N, D)[g].reshape(B, idx.shape[1], D)


def gather_padded(x, src):
    """x: (B, N, D), src: (B, s_pad) -> (B, s_pad, D)."""
    return flat_row_gather(x, src)


def ungather_padded(y_pad, pos):
    """y_pad: (B, s_pad, D), pos: (B, N) -> (B, N, D) (inverse permutation)."""
    return flat_row_gather(y_pad, pos)
