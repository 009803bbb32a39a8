"""Fused Pallas k-means pass vs the chunked jnp implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.core import kmeans as KM
from sparse_videogen_tpu.ops.kmeans_pallas import kmeans_assign_update


@pytest.mark.parametrize("B,N,K,D", [(2, 512, 7, 32), (1, 300, 130, 16)])
def test_fused_matches_jnp(B, N, K, D):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32)
    labels, sums, counts = kmeans_assign_update(x, c, blk_n=256)
    ref_labels = KM.kmeans_assign(x, c)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))
    _, ref_counts = KM.centroid_update(x, ref_labels, c)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int32), np.asarray(ref_counts))
    # sums / counts = means must match the jnp update
    ref_means, _ = KM.centroid_update(x, ref_labels, c)
    means = np.asarray(sums) / np.maximum(np.asarray(counts)[..., None], 1.0)
    means = np.where(np.asarray(counts)[..., None] == 0, np.asarray(c), means)
    np.testing.assert_allclose(means, np.asarray(ref_means), rtol=1e-5, atol=1e-5)


def test_batch_kmeans_backends_agree():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 256, 16)), jnp.float32)
    init = KM.init_centroids(x, 5, jax.random.PRNGKey(0))
    l1, c1, s1 = KM.batch_kmeans(x, 5, 4, init, backend="pallas")
    l2, c2, s2 = KM.batch_kmeans(x, 5, 4, init, backend="jnp")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-5)
