"""identify_dynamic_map vs a direct numpy port of the reference logic."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.core import dynamic_map as DM


def ref_identify_dynamic_map(qc, kc, q_sizes, k_sizes, p, min_kc_ratio=0.0):
    """Numpy port of kmeans_utils.py:865-896."""
    B, H, QC, D = qc.shape
    KC = kc.shape[2]
    scores = (qc.astype(np.float64) @ kc.astype(np.float64).swapaxes(-1, -2)) / np.sqrt(D)
    w = k_sizes[:, :, None, :].astype(np.float64)
    m = scores.max(-1, keepdims=True)
    e = w * np.exp(scores - m)
    probs = e / np.maximum(e.sum(-1, keepdims=True), 1e-12)

    order = np.argsort(-probs, axis=-1, kind="stable")
    sp = np.take_along_axis(probs, order, axis=-1)
    cum = np.cumsum(sp, axis=-1)
    remove = cum > p
    remove[..., 1:] = remove[..., :-1].copy()
    remove[..., 0] = False
    if min_kc_ratio > 0:
        remove[..., : int(min_kc_ratio * KC)] = False
    keep = ~remove
    dyn = np.zeros((B, H, QC, KC), bool)
    np.put_along_axis(dyn, order, keep, axis=-1)
    return dyn


@pytest.mark.parametrize("min_kc", [0.0, 0.3])
@pytest.mark.parametrize("p", [0.5, 0.9])
def test_identify_dynamic_map_matches_reference(p, min_kc):
    rng = np.random.default_rng(0)
    B, H, QC, KC, D = 1, 3, 6, 10, 8
    qc = rng.standard_normal((B, H, QC, D)).astype(np.float32)
    kc = rng.standard_normal((B, H, KC, D)).astype(np.float32)
    qs = rng.integers(1, 20, (B, H, QC)).astype(np.int32)
    ks = rng.integers(1, 20, (B, H, KC)).astype(np.int32)

    dyn = np.asarray(
        DM.identify_dynamic_map(
            jnp.asarray(qc), jnp.asarray(kc), jnp.asarray(qs), jnp.asarray(ks), p, min_kc
        )
    )
    ref = ref_identify_dynamic_map(qc, kc, qs, ks, p, min_kc)
    np.testing.assert_array_equal(dyn, ref)
    # invariants: at least one kept per q-cluster; top-1 always kept
    assert dyn.any(-1).all()


def test_density_calculation():
    dyn = jnp.asarray(np.array([[[[True, False], [True, True]]]]))
    qs = jnp.asarray(np.array([[[2, 3]]]))
    ks = jnp.asarray(np.array([[[4, 1]]]))
    d = np.asarray(DM.density_calculation(dyn, qs, ks))
    # (2*4 + 3*4 + 3*1) / (5*5) = 23/25
    np.testing.assert_allclose(d, [[23 / 25]])
