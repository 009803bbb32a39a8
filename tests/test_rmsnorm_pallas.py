"""Pallas RMSNorm oracle test vs layers.rms_norm (bit-level semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.models.common.layers import rms_norm
from sparse_videogen_tpu.ops.rmsnorm_pallas import rms_norm_pallas


@pytest.mark.parametrize("shape,dtype", [
    ((7, 384), jnp.float32),
    ((300, 128), jnp.bfloat16),
    ((2, 5, 256), jnp.bfloat16),
])
def test_rms_norm_pallas_matches(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],), jnp.float32)
    ref = rms_norm(x, w)
    out = rms_norm_pallas(x, w)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=0, atol=1e-6 if dtype == jnp.float32 else 1e-2)
