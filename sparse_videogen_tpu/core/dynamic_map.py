"""SVG2 cluster-pair selection ("dynamic map") and density telemetry.

Reference:
  weighted_softmax      /root/reference/svg/kmeans_utils.py:853-861
  identify_dynamic_map  /root/reference/svg/kmeans_utils.py:865-896
  density_calculation   /root/reference/svg/kmeans_utils.py:14-31
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_softmax(scores, weights):
    """softmax(scores) with per-column multiplicative weights, f32 math."""
    dtype = scores.dtype
    s = scores.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = w * jnp.exp(s - m)
    out = e / jnp.clip(jnp.sum(e, axis=-1, keepdims=True), 1e-12)
    return out.astype(dtype)


def identify_dynamic_map(
    query_centroids,  # (B, H, QC, D)
    key_centroids,  # (B, H, KC, D)
    q_cluster_sizes,  # (B, H, QC) — unused (parity with reference signature)
    k_cluster_sizes,  # (B, H, KC)
    top_p: float,
    min_kc_ratio: float = 0.0,
):
    """Boolean (B, H, QC, KC) keep-mask over cluster pairs.

    Centroid-level attention estimate softmax(Qc Kc^T / sqrt(D)) weighted by
    key-cluster sizes; sort descending; keep the smallest prefix whose
    cumulative mass exceeds top_p (always keeping the first entry), plus a
    forced prefix of min_kc_ratio * KC entries.
    """
    import jax

    D = query_centroids.shape[-1]
    KC = key_centroids.shape[2]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        query_centroids.astype(jnp.float32),
        key_centroids.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * (D**-0.5)
    k_weights = k_cluster_sizes[..., None, :]  # (B, H, 1, KC)
    probs = weighted_softmax(scores, k_weights)

    # descending stable sort carrying the column index (TPU: one fused sort
    # instead of argsort + take_along_axis)
    iota = jax.lax.broadcasted_iota(jnp.int32, probs.shape, probs.ndim - 1)
    neg_sorted, sorted_idx = jax.lax.sort_key_val(-probs, iota, dimension=-1)
    cum = jnp.cumsum(-neg_sorted.astype(jnp.float32), axis=-1)
    remove = cum > top_p
    # shift right by one so the first cluster crossing top_p is kept
    remove = jnp.concatenate([jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    if min_kc_ratio > 0:
        preserve = int(min_kc_ratio * KC)
        pos = jnp.arange(KC)
        remove = remove & (pos >= preserve)
    keep_sorted = ~remove

    # scatter-free inverse permutation: sort keep flags back to column order
    # (jnp.put_along_axis lowers to a scatter, which serializes on TPU —
    # measured 269 ms at (40, 300, 1000); two sorts run in ~ms)
    _, dyn = jax.lax.sort_key_val(sorted_idx, keep_sorted.astype(jnp.int32), dimension=-1)
    return dyn.astype(bool)


def density_calculation(dynamic_map, q_cluster_sizes, k_cluster_sizes):
    """Per-(batch, head) fraction of the S x S score matrix computed."""
    block = q_cluster_sizes[..., :, None].astype(jnp.float32) * k_cluster_sizes[
        ..., None, :
    ].astype(jnp.float32)
    masked = block * dynamic_map
    return jnp.sum(masked, axis=(-2, -1)) / jnp.sum(block, axis=(-2, -1))
