"""Batched Lloyd k-means over (B = cfg*heads) independent problems.

Reference: batch_kmeans_Euclid (/root/reference/svg/kmeans_utils.py:685-734):
assign = argmin ||x - c||^2 via ||x||^2 + ||c||^2 - 2 x.c, update = per-cluster
mean with empty clusters keeping their old centroid
(triton_centroid_update_sorted_euclid, kmeans_utils.py:375-421).

TPU design notes:
- The (B, N, K) distance tensor at production shapes (40 x 75k x 1000 f32)
  would not fit in HBM; assignment is chunked over N (lax.map) so only
  (B, chunk, K) is live. ops/kmeans_pallas.py fuses assign + centroid
  accumulation into a single Pallas pass over x.
- Centroid update is a segment-sum expressed as chunked one-hot matmuls
  (MXU-friendly) rather than a scatter-add.
- Iteration count is static (fori_loop); the reference's tol-based early stop
  (kmeans_utils.py:719-726) is a latency optimization that forces a host
  sync — with the production settings (iter_init=50 once, iter_step=2) the
  fixed count matches the intended cost envelope.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _assign_chunk(x_chunk, x_sq_chunk, centroids, c_sq):
    """x_chunk: (B, n, D); centroids: (B, K, D) -> labels (B, n) int32."""
    cross = jnp.einsum(
        "bnd,bkd->bnk", x_chunk, centroids, preferred_element_type=jnp.float32
    )
    dist = x_sq_chunk[..., None] + c_sq[:, None, :] - 2.0 * cross
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def kmeans_assign(x, centroids, *, chunk: int = 4096):
    """Nearest-centroid labels, chunked over N. x: (B,N,D) -> (B,N) int32."""
    B, N, D = x.shape
    xf = x.astype(jnp.float32)
    cf = centroids.astype(jnp.float32)
    x_sq = jnp.sum(xf * xf, axis=-1)
    c_sq = jnp.sum(cf * cf, axis=-1)
    if N <= chunk:
        return _assign_chunk(xf, x_sq, cf, c_sq)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xp = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
    xsp = jnp.pad(x_sq, ((0, 0), (0, pad)))
    xp = xp.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
    xsp = xsp.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    labels = jax.lax.map(lambda args: _assign_chunk(args[0], args[1], cf, c_sq), (xp, xsp))
    labels = labels.transpose(1, 0, 2).reshape(B, n_chunks * chunk)
    return labels[:, :N]


def centroid_sums(x, labels, n_clusters: int, *, chunk: int = 4096):
    """Per-cluster (sums (B,K,D) f32, counts (B,K) f32) via chunked one-hot
    matmul segment-sum (MXU-friendly; no scatter-add)."""
    B, N, D = x.shape
    K = n_clusters
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    # padded tokens point at cluster K (out of range -> dropped by one_hot)
    lp = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=K)
    xp = xp.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
    lp = lp.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    def body(carry, args):
        sums, counts = carry
        xc, lc = args
        onehot = jax.nn.one_hot(lc, K, dtype=jnp.float32)  # (B, chunk, K)
        sums = sums + jnp.einsum("bnk,bnd->bkd", onehot, xc, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=1)
        return (sums, counts), None

    init = (jnp.zeros((B, K, D), jnp.float32), jnp.zeros((B, K), jnp.float32))
    (sums, counts), _ = jax.lax.scan(body, init, (xp, lp))
    return sums, counts


def label_counts(labels, n_clusters: int, *, chunk: int = 8192):
    """(B, N) int32 labels -> (B, K) int32 counts (chunked one-hot sums)."""
    B, N = labels.shape
    K = n_clusters
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    lp = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=K)
    lp = lp.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    def body(c, lc):
        return c + jnp.sum(jax.nn.one_hot(lc, K, dtype=jnp.float32), axis=1), None

    counts, _ = jax.lax.scan(body, jnp.zeros((B, K), jnp.float32), lp)
    return counts.astype(jnp.int32)


def _finalize(sums, counts, old_centroids, dtype, axis_name):
    """Mean with empty clusters keeping old centroids (kmeans_utils.py:419).
    With axis_name, sums/counts are psum'd first: the distributed update is
    then EXACTLY the global Lloyd update (mean = psum(sum)/psum(count))."""
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
    means = sums / jnp.maximum(counts, 1.0)[..., None]
    new = jnp.where((counts == 0)[..., None], old_centroids.astype(jnp.float32), means)
    return new.astype(dtype), counts.astype(jnp.int32)


def centroid_update(x, labels, old_centroids, *, chunk: int = 4096, axis_name=None):
    """Per-cluster mean; returns (new_centroids same dtype as x, counts int32)."""
    sums, counts = centroid_sums(x, labels, old_centroids.shape[1], chunk=chunk)
    return _finalize(sums, counts, old_centroids, x.dtype, axis_name)


def init_centroids(x, n_clusters: int, rng):
    """Random tokens as initial centroids (kmeans_utils.py:707-709)."""
    B, N, D = x.shape
    idx = jax.random.randint(rng, (B, n_clusters), 0, N)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def init_centroids_sharded(x, n_clusters: int, rng, axis_name: str, n_shards: int):
    """Random GLOBAL tokens as initial centroids when the token axis is
    sharded (x is the local (B, N_local, D) shard inside shard_map).

    Every shard draws the same global indices (same rng), contributes the
    tokens it owns, and a psum assembles the full set — identical to
    init_centroids over the gathered sequence, without gathering it."""
    B, N, D = x.shape
    my = jax.lax.axis_index(axis_name)
    idx = jax.random.randint(rng, (B, n_clusters), 0, N * n_shards)
    loc = idx - my * N
    mask = (loc >= 0) & (loc < N)
    take = jnp.take_along_axis(x, jnp.clip(loc, 0, N - 1)[..., None], axis=1)
    contrib = jnp.where(mask[..., None], take.astype(jnp.float32), 0.0)
    return jax.lax.psum(contrib, axis_name).astype(x.dtype)


def _fused_iter(x, centroids, axis_name=None):
    """One Lloyd iteration via the fused Pallas pass (ops/kmeans_pallas.py)."""
    from sparse_videogen_tpu.ops.kmeans_pallas import kmeans_assign_update

    labels, sums, counts = kmeans_assign_update(x, centroids)
    new, counts = _finalize(sums, counts, centroids, x.dtype, axis_name)
    return labels, new, counts


def _sim_iter(x, centroids, *, normalize_update: bool, chunk: int, axis_name=None):
    """Cosine/Dot iteration (kmeans_utils.py _cosine_iter/_dot_iter): assign
    by max similarity; centroid update = member mean, L2-normalized (both
    variants use the cosine update in the reference), empty keeps old."""
    sim = jnp.einsum("bnd,bkd->bnk", x.astype(jnp.float32),
                     centroids.astype(jnp.float32))
    labels = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    new, sizes = centroid_update(x, labels, centroids, chunk=chunk, axis_name=axis_name)
    if normalize_update:
        n = jnp.linalg.norm(new.astype(jnp.float32), axis=-1, keepdims=True)
        new = (new.astype(jnp.float32) / jnp.maximum(n, 1e-12)).astype(x.dtype)
    return labels, new, sizes


@partial(jax.jit, static_argnames=("n_clusters", "max_iters", "chunk", "backend", "metric", "axis_name"))
def batch_kmeans(
    x, n_clusters: int, max_iters: int, init: jnp.ndarray, *, chunk: int = 4096,
    backend: str = "pallas", metric: str = "euclid", axis_name: str | None = None,
):
    """Run `max_iters` Lloyd iterations from `init` centroids.

    metric: "euclid" (batch_kmeans_Euclid, the SAP production path),
    "cosine" (inputs and centroids L2-normalized), or "dot" (raw
    similarity, normalized centroid update) — kmeans_utils.py:646-663.

    axis_name: inside shard_map with the token axis sharded, psum the
    centroid sums/counts over that mesh axis each iteration — assignment is
    token-local, so the result is exactly global Lloyd on the full sequence.
    Returned labels are the LOCAL shard's; centroids and sizes are global
    (identical on every shard).

    Matches the reference loop structure (kmeans_utils.py:713-726): each
    iteration assigns against the *current* centroids then updates them, so
    the returned labels/sizes correspond to the pre-update centroids of the
    last iteration while the returned centroids are post-update. max_iters=0
    degenerates to a single assignment against `init` (the reference would
    crash there; we define it as assign-only).

    Returns (labels (B,N) int32, centroids (B,K,D), cluster_sizes (B,K) int32).
    """
    B, N, D = x.shape
    if metric == "cosine":
        # batch_kmeans_Cosine normalizes the inputs up front (init centroids
        # are drawn from the normalized x; idempotent for warm starts)
        norm = lambda v: v / jnp.maximum(
            jnp.linalg.norm(v.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        ).astype(v.dtype)
        x = norm(x)
        init = norm(init)
    init = init.astype(x.dtype)

    def one_iter(c):
        if metric in ("cosine", "dot"):
            return _sim_iter(x, c, normalize_update=True, chunk=chunk, axis_name=axis_name)
        if backend == "pallas":
            return _fused_iter(x, c, axis_name)
        labels = kmeans_assign(x, c, chunk=chunk)
        new, sizes = centroid_update(x, labels, c, chunk=chunk, axis_name=axis_name)
        return labels, new, sizes

    if max_iters <= 0:
        labels, _, sizes = one_iter(init)
        return labels, init, sizes

    def body(_, carry):
        c, _labels, _sizes = carry
        labels, new, sizes = one_iter(c)
        return new, labels, sizes

    carry = (
        init,
        jnp.zeros((B, N), jnp.int32),
        jnp.zeros((B, n_clusters), jnp.int32),
    )
    centroids, labels, sizes = jax.lax.fori_loop(0, max_iters, body, carry)
    return labels, centroids, sizes
