"""Fused Pallas RoPE vs the jnp reference rotation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.models.common.rope import wan_rope_cos_sin
from sparse_videogen_tpu.ops.rope_pallas import (
    apply_rope_fused,
    expand_cos_sin,
    rope_apply_pallas,
)


def _jnp_rope(x, cos, sin):
    xf = x.astype(jnp.float32)
    x0, x1 = xf[..., 0::2], xf[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)


@pytest.mark.parametrize("B,H,S,D", [(1, 2, 300, 64), (2, 3, 1024, 128),
                                     (1, 1, 129, 64), (1, 2, 77, 128)])
def test_rope_pallas_matches_reference(B, H, S, D):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    c, s = wan_rope_cos_sin(1, 1, S, D)
    ref = _jnp_rope(x, jnp.asarray(c)[None, None], jnp.asarray(s)[None, None])
    got = apply_rope_fused(x, jnp.asarray(c), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_expand_cos_sin_numpy_jnp_agree():
    c, s = wan_rope_cos_sin(1, 2, 64, 64)
    cn, sn = expand_cos_sin(c, s)
    cj, sj = expand_cos_sin(jnp.asarray(c), jnp.asarray(s))
    np.testing.assert_allclose(cn, np.asarray(cj), atol=1e-7)
    np.testing.assert_allclose(sn, np.asarray(sj), atol=1e-7)


def test_rope_pallas_bf16_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 257, 128)), jnp.bfloat16)
    c, s = wan_rope_cos_sin(1, 1, 257, 128)
    c2, s2 = expand_cos_sin(c, s)
    got = rope_apply_pallas(x, jnp.asarray(c2), jnp.asarray(s2))
    ref = _jnp_rope(x.reshape(1, 4, 257, 128),
                    jnp.asarray(c)[None, None], jnp.asarray(s)[None, None])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32).reshape(4, 257, 128),
        atol=2e-2, rtol=2e-2,
    )
