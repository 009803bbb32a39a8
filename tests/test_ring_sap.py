"""Ring x SAP: sequence-sharded semantic-aware permutation equals the
single-device SAP runtime on the same labels/dynamic map.

8 virtual CPU devices (conftest).  The reference never composes SAP with
sequence parallelism (SAP is single-GPU cfg=1, wan/attention.py:502); this is
the SURVEY section-7 "hard case" solved with shard-local permutations +
psum-exact distributed k-means + per-shard run metadata on a KV ring
(parallel/ring_sap.py).  Warm-started centroids make the comparison
deterministic: assignment is token-local given centroids, so both paths
produce identical labels and dynamic maps; outputs then differ only by fp
reduction order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, VideoLayout
from sparse_videogen_tpu.parallel import make_mesh
from sparse_videogen_tpu.parallel.ring_sap import sap_ring_attention
from sparse_videogen_tpu.sparse.svg2 import SAPState, sap_sparse_attention


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
B, H, S, D = 1, 2, 1024, 64
CFG = SAPConfig(num_q_centroids=6, num_k_centroids=10, top_p_kmeans=0.8,
                min_kc_ratio=0.0, kmeans_iter_step=2, block_q=128, block_kv=128)
LAYOUT = VideoLayout(num_frames=8, frame_size=128)


def _data(seed=0):
    rng = np.random.default_rng(seed)
    # structured tokens so clusters are meaningful: mixture of 12 anchors
    anchors = rng.standard_normal((12, D)).astype(np.float32)
    pick = rng.integers(0, 12, (B, H, S))
    x = anchors[pick] + 0.15 * rng.standard_normal((B, H, S, D)).astype(np.float32)
    q = jnp.asarray(x)
    k = jnp.asarray(np.roll(x, 1, axis=2) + 0.1 * rng.standard_normal((B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((B * H, CFG.num_q_centroids, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B * H, CFG.num_k_centroids, D)), jnp.float32)
    state = SAPState(qc, kc, jnp.ones((), bool), jnp.zeros((qc.shape[0],), jnp.float32))
    return q, k, v, state


@pytest.mark.parametrize("n_shards", [2, 4])
def test_ring_sap_matches_single_device(n_shards):
    q, k, v, state = _data()
    rng = jax.random.PRNGKey(3)

    ref, ref_state = sap_sparse_attention(
        q, k, v, state, rng, layout=LAYOUT, cfg=CFG, interpret=True
    )

    mesh = make_mesh(n_shards, sp=n_shards)
    out, new_state = sap_ring_attention(
        q, k, v, state, rng, mesh, axis="sp", layout=LAYOUT, cfg=CFG, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3
    )
    # warm-start carry: distributed Lloyd == global Lloyd (psum-exact)
    np.testing.assert_allclose(
        np.asarray(new_state.q_centroids), np.asarray(ref_state.q_centroids),
        atol=2e-4, rtol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.k_centroids), np.asarray(ref_state.k_centroids),
        atol=2e-4, rtol=2e-3,
    )


def test_ring_sap_cold_init_runs():
    """Cold start (initialized=False): sharded global-index init + long
    iteration count; just prove it runs and returns a sane attention output
    (softmax convexity: rows bounded by V's range)."""
    q, k, v, _ = _data(1)
    state = SAPState(
        jnp.zeros((B * H, CFG.num_q_centroids, D)),
        jnp.zeros((B * H, CFG.num_k_centroids, D)),
        jnp.zeros((), bool),
        jnp.zeros((B * H,), jnp.float32),
    )
    cfg = SAPConfig(**{**CFG.__dict__, "kmeans_iter_init": 5})
    mesh = make_mesh(2, sp=2)
    out, new_state = sap_ring_attention(
        q, k, v, state, jax.random.PRNGKey(0), mesh, axis="sp",
        layout=LAYOUT, cfg=cfg, interpret=True,
    )
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert np.abs(o).max() <= np.abs(np.asarray(v)).max() + 1e-4
    assert bool(new_state.initialized)


def test_usp_ring_sap_matches_single_device():
    """USP hybrid: heads sharded over 'ulysses' x sequence over 'ring'
    (xfuser's ulysses_degree x ring_degree composition, here with SAP)."""
    from jax.sharding import Mesh

    q, k, v, state = _data()
    rng = jax.random.PRNGKey(3)
    ref, _ = sap_sparse_attention(q, k, v, state, rng, layout=LAYOUT, cfg=CFG, interpret=True)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("ulysses", "ring"))
    out, new_state = sap_ring_attention(
        q, k, v, state, rng, mesh, axis="ring", head_axis="ulysses",
        layout=LAYOUT, cfg=CFG, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)
    assert new_state.q_centroids.shape == state.q_centroids.shape
