"""Self-contained perceptual distance (LPIPS stand-in).

The reference reports LPIPS via the `lpips` pip package with pretrained
AlexNet features (/root/reference/svg/utils/metric.py:58-136). That package
(and any pretrained download) is unavailable offline, so this module ships a
dependency-free perceptual metric with the SAME structure as LPIPS:

    d(a, b) = sum_s w_s * mean_hw || phi_s(a)_norm - phi_s(b)_norm ||^2

where phi_s are the activations of a small strided conv stack and `_norm` is
LPIPS's channel-unit normalization. The conv weights are FIXED random
features from a seeded PRNG — deterministic across runs and machines, shipped
as code. Random convolutional features are a known-serviceable perceptual
baseline (they respond to local structure, edges and texture rather than raw
pixels), but they are NOT the calibrated AlexNet metric: scores correlate
with LPIPS yet are not comparable in absolute value. The metric is therefore
reported under the distinct name **lpips_rf** (random features).

When the real `lpips` package IS importable, utils/metric.py reports true
LPIPS alongside; lpips_rf is the always-available fallback so dense-vs-sparse
quality gates never silently lose their perceptual column.
"""

from __future__ import annotations

import functools

import numpy as np

# LPIPS input normalization constants (the package's scaling layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# conv stack: (out_channels, kernel, stride); receptive fields span edges ->
# textures -> parts, mirroring LPIPS's 5 AlexNet stages
_STAGES = ((16, 7, 2), (32, 5, 2), (64, 3, 2), (96, 3, 2), (128, 3, 2))
_SEED = 20260818


@functools.lru_cache(maxsize=1)
def random_feature_params(seed: int = _SEED):
    """Deterministic conv weights (He-scaled) + uniform stage weights."""
    rng = np.random.default_rng(seed)
    params = []
    c_in = 3
    for c_out, k, _ in _STAGES:
        fan_in = c_in * k * k
        w = rng.standard_normal((c_out, c_in, k, k)).astype(np.float32)
        w *= np.sqrt(2.0 / fan_in)
        params.append(w)
        c_in = c_out
    return params


def _features(x, params):
    """x: (N, 3, H, W) in [-1, 1] -> list of per-stage activations."""
    import jax
    import jax.numpy as jnp

    h = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    feats = []
    for w, (_, k, s) in zip(params, _STAGES):
        h = jax.lax.conv_general_dilated(
            h, jnp.asarray(w), window_strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        h = jax.nn.relu(h)
        feats.append(h)
    return feats


def lpips_rf(a, b, *, batch: int = 8):
    """Perceptual distance between (T, H, W, 3) videos in [0, 1].

    Returns the mean over frames of the LPIPS-structured random-feature
    distance. Pure JAX (CPU-friendly); frames processed in mini-batches.
    """
    import jax.numpy as jnp

    assert a.shape == b.shape and a.shape[-1] == 3, (a.shape, b.shape)
    params = random_feature_params()

    def dist(xa, xb):
        fa = _features(xa, params)
        fb = _features(xb, params)
        total = 0.0
        for ya, yb in zip(fa, fb):
            na = ya / jnp.sqrt(jnp.sum(ya * ya, axis=1, keepdims=True) + 1e-10)
            nb = yb / jnp.sqrt(jnp.sum(yb * yb, axis=1, keepdims=True) + 1e-10)
            total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=1), axis=(1, 2))
        return total / len(fa)

    vals = []
    T = a.shape[0]
    for t0 in range(0, T, batch):
        xa = jnp.asarray(a[t0 : t0 + batch].transpose(0, 3, 1, 2) * 2.0 - 1.0, jnp.float32)
        xb = jnp.asarray(b[t0 : t0 + batch].transpose(0, 3, 1, 2) * 2.0 - 1.0, jnp.float32)
        vals.append(np.asarray(dist(xa, xb)))
    return float(np.mean(np.concatenate(vals)))
