"""Batched k-means invariants (mirrors test_kmeans_torch.py's structure)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.core import kmeans as KM


def inertia(x, labels, centroids):
    c = np.take_along_axis(np.asarray(centroids), np.asarray(labels)[..., None], axis=1)
    return float(((np.asarray(x) - c) ** 2).sum())


def test_kmeans_inertia_decreases_and_sizes_sum():
    rng = np.random.default_rng(0)
    B, N, D, K = 3, 256, 8, 7
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    init = KM.init_centroids(x, K, jax.random.PRNGKey(0))

    labels1, c1, sizes1 = KM.batch_kmeans(x, K, 1, init)
    labels8, c8, sizes8 = KM.batch_kmeans(x, K, 8, init)

    assert inertia(x, labels8, c8) <= inertia(x, labels1, c1) + 1e-3
    np.testing.assert_array_equal(np.asarray(sizes8).sum(-1), [N] * B)
    # labels consistent with final assignment against pre-update centroids:
    # sizes must match label histogram
    hist = np.stack([np.bincount(np.asarray(labels8)[b], minlength=K) for b in range(B)])
    np.testing.assert_array_equal(hist, np.asarray(sizes8))


def test_kmeans_separated_clusters_recovered():
    rng = np.random.default_rng(1)
    centers = np.array([[10.0, 0], [-10, 0], [0, 10]], np.float32)
    pts = np.concatenate(
        [centers[i] + 0.1 * rng.standard_normal((50, 2)) for i in range(3)]
    ).astype(np.float32)
    x = jnp.asarray(pts)[None]
    init = jnp.asarray(centers + 1.0)[None]
    labels, c, sizes = KM.batch_kmeans(x, 3, 5, init)
    np.testing.assert_array_equal(np.sort(np.asarray(sizes)[0]), [50, 50, 50])
    np.testing.assert_allclose(np.sort(np.asarray(c)[0], axis=0), np.sort(centers, axis=0), atol=0.1)


def test_empty_cluster_keeps_old_centroid():
    x = jnp.asarray(np.zeros((1, 4, 2), np.float32))
    old = jnp.asarray(np.array([[[0.0, 0.0], [99.0, 99.0]]], np.float32))
    labels = jnp.zeros((1, 4), jnp.int32)
    new, counts = KM.centroid_update(x, labels, old)
    np.testing.assert_array_equal(np.asarray(counts)[0], [4, 0])
    np.testing.assert_allclose(np.asarray(new)[0, 1], [99.0, 99.0])


def test_assign_chunked_equals_unchunked():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 100, 4)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)
    a = KM.kmeans_assign(x, c, chunk=1000)
    b = KM.kmeans_assign(x, c, chunk=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kmeans_cosine_and_dot_match_reference_loop():
    """Cosine/Dot variants vs a direct numpy port of the reference iteration
    (kmeans_utils.py _cosine_iter/_dot_iter + torch_loop_centroid_update_cosine)."""
    from sparse_videogen_tpu.core.kmeans import batch_kmeans

    rng = np.random.default_rng(0)
    B, N, D, K = 2, 96, 8, 5
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    init = x[:, :K].copy()

    def np_ref(xin, metric, iters):
        xs = xin.copy()
        if metric == "cosine":
            xs = xs / np.maximum(np.linalg.norm(xs, axis=-1, keepdims=True), 1e-12)
        c = (xs[:, :K] if metric == "cosine" else xin[:, :K]).copy()
        labels = None
        for _ in range(iters):
            sim = np.einsum("bnd,bkd->bnk", xs, c)
            labels = sim.argmax(-1)
            new = np.zeros_like(c)
            for b in range(B):
                for k in range(K):
                    m = labels[b] == k
                    if m.any():
                        v = xs[b][m].mean(0)
                        new[b, k] = v / max(np.linalg.norm(v), 1e-12)
                    else:
                        new[b, k] = c[b, k]
            c = new
        return labels, c

    for metric in ("cosine", "dot"):
        ref_labels, ref_c = np_ref(x, metric, 3)
        labels, cents, sizes = batch_kmeans(
            jnp.asarray(x), K, 3, jnp.asarray(init), metric=metric, backend="jnp"
        )
        np.testing.assert_array_equal(np.asarray(labels), ref_labels)
        np.testing.assert_allclose(np.asarray(cents), ref_c, atol=2e-5)
        counts = np.stack([np.bincount(l, minlength=K) for l in ref_labels])
        np.testing.assert_array_equal(np.asarray(sizes), counts)
