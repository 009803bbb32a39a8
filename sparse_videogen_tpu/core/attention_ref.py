"""Reference attention implementations (pure jnp, test oracles).

These mirror the reference's torch oracles:
  - dense SDPA                   (F.scaled_dot_product_attention use sites)
  - masked dense attention       (sample_mse profiling path,
                                  /root/reference/svg/models/wan/attention.py:210-234)
  - dynamic block-sparse oracle  (/root/reference/svg/kmeans_utils.py:902-995)
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_attention(q, k, v, *, scale=None):
    """q,k,v: (..., S, D) -> (..., S, D). Softmax in f32."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    s = jnp.einsum("...qd,...kd->...qk", q, k).astype(jnp.float32) * scale
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.einsum("...qk,...kd->...qd", p.astype(q.dtype), v)


def masked_attention(q, k, v, mask, *, scale=None):
    """mask: broadcastable boolean (..., Sq, Sk); True = attend."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    s = jnp.einsum("...qd,...kd->...qk", q, k).astype(jnp.float32) * scale
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    # rows with no allowed columns: avoid nan, produce 0
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(l, 1e-12)
    return jnp.einsum("...qk,...kd->...qd", p.astype(q.dtype), v)


def token_cluster_ids(cluster_sizes, seq_len: int):
    """(..., C) sizes -> (..., seq_len) cluster id per *sorted* token position.

    Token t (in cluster-sorted order) belongs to cluster c iff
    cum[c] <= t < cum[c+1]. seq_len must equal sum(sizes) (static).
    """
    cum = jnp.cumsum(cluster_sizes, axis=-1)
    t = jnp.arange(seq_len)
    # id = number of cum entries <= t
    return jnp.sum(t[..., None, :] >= cum[..., :, None], axis=-2)


def dynamic_block_sparse_ref(q, k, v, dynamic_map, qc_sizes, kc_sizes, *, scale=None):
    """Oracle for SVG2's variable-block sparse attention.

    Args:
      q,k,v: (B, H, S, D) — already permuted cluster-contiguously.
      dynamic_map: (B, H, QC, KC) bool — cluster-pair keep mask.
      qc_sizes: (B, H, QC) int — query cluster sizes (sum = S).
      kc_sizes: (B, H, KC) int — key cluster sizes (sum = S).

    Equivalent to dynamic_block_sparse_fwd_torch (kmeans_utils.py:902-995)
    but expressed as a masked dense attention (exact, small shapes only).
    """
    B, H, S, D = q.shape
    q_ids = token_cluster_ids(qc_sizes, S)  # (B, H, S)
    k_ids = token_cluster_ids(kc_sizes, S)  # (B, H, S)
    # mask[b,h,i,j] = dynamic_map[b,h,q_ids[i],k_ids[j]]
    mask = jnp.take_along_axis(
        jnp.take_along_axis(dynamic_map, q_ids[..., :, None], axis=2),
        k_ids[..., None, :],
        axis=3,
    )
    return masked_attention(q, k, v, mask, scale=scale)
