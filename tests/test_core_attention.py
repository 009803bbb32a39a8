"""Oracles: dense/masked attention and the dynamic block-sparse reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.core import attention_ref as A


def naive_attention(q, k, v, mask=None):
    q, k, v = (np.asarray(t, np.float64) for t in (q, k, v))
    s = q @ k.swapaxes(-1, -2) / np.sqrt(q.shape[-1])
    if mask is not None:
        s = np.where(mask, s, -np.inf)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return p @ v


def test_dense_attention_matches_naive():
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((2, 3, 17, 8), dtype=np.float32) for _ in range(3))
    out = np.asarray(A.dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, naive_attention(q, k, v), rtol=1e-4, atol=1e-5)


def test_masked_attention_all_true_is_dense():
    rng = np.random.default_rng(1)
    q, k, v = (rng.standard_normal((1, 2, 9, 4), dtype=np.float32) for _ in range(3))
    mask = np.ones((9, 9), bool)
    out = np.asarray(A.masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
    ref = np.asarray(A.dense_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def ref_dynamic_block_sparse(q, k, v, dyn, qc, kc):
    """Direct numpy port of dynamic_block_sparse_fwd_torch (kmeans_utils.py:902-995)."""
    B, H, S, D = q.shape
    out = np.zeros_like(q, dtype=np.float64)
    for b in range(B):
        for h in range(H):
            qcs = np.concatenate([[0], np.cumsum(qc[b, h])])
            kcs = np.concatenate([[0], np.cumsum(kc[b, h])])
            for i in range(qc.shape[-1]):
                rows = slice(qcs[i], qcs[i + 1])
                if qcs[i + 1] == qcs[i]:
                    continue
                cols = np.zeros(S, bool)
                for j in range(kc.shape[-1]):
                    if dyn[b, h, i, j]:
                        cols[kcs[j] : kcs[j + 1]] = True
                if not cols.any():
                    continue
                s = q[b, h, rows].astype(np.float64) @ k[b, h, cols].T.astype(np.float64)
                s /= np.sqrt(D)
                s -= s.max(-1, keepdims=True)
                p = np.exp(s)
                p /= p.sum(-1, keepdims=True)
                out[b, h, rows] = p @ v[b, h, cols].astype(np.float64)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_dynamic_block_sparse_ref(seed):
    rng = np.random.default_rng(seed)
    B, H, S, D, QC, KC = 1, 2, 24, 4, 3, 5
    q, k, v = (rng.standard_normal((B, H, S, D), dtype=np.float32) for _ in range(3))

    def rand_partition(n, parts):
        cuts = np.sort(rng.choice(np.arange(1, n), parts - 1, replace=False))
        return np.diff(np.concatenate([[0], cuts, [n]]))

    qc = np.stack([[rand_partition(S, QC) for _ in range(H)] for _ in range(B)])
    kc = np.stack([[rand_partition(S, KC) for _ in range(H)] for _ in range(B)])
    dyn = rng.random((B, H, QC, KC)) < 0.6
    dyn[..., 0] = True  # every q-cluster attends to something

    out = np.asarray(
        A.dynamic_block_sparse_ref(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(dyn), jnp.asarray(qc), jnp.asarray(kc),
        )
    )
    ref = ref_dynamic_block_sparse(q, k, v, dyn, qc, kc)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_token_cluster_ids():
    sizes = jnp.asarray([[3, 0, 2, 1]])
    ids = np.asarray(A.token_cluster_ids(sizes, 6))
    np.testing.assert_array_equal(ids[0], [0, 0, 0, 2, 2, 3])
