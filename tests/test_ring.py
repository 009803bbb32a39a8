"""Ring attention == single-device on dense and SVG1 band+sink masked cases.

8 virtual CPU devices (conftest). Semantics matched: the reference's context
parallel (wan_orig/distributed/xdit_context_parallel.py:63-169) chunks the
sequence across ranks and rotates KV; here additionally composed with the
static band+sink execution masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.core import masks as core_masks
from sparse_videogen_tpu.config import VideoLayout
from sparse_videogen_tpu.core.attention_ref import masked_attention
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.mask_spec import MaskSpec
from sparse_videogen_tpu.parallel import make_mesh
from sparse_videogen_tpu.parallel.ring import ring_attention, ring_meta


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def _qkv(rng, B, H, S, D):
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    return q, k, v


def test_ring_dense_matches_single_device():
    n = 4
    mesh = make_mesh(n, dp=1)
    B, H, S, D = 1, 2, 4 * 512, 64
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, B, H, S, D)

    nQ, nsub = S // 512, S // 128
    bm = np.ones((nQ, nsub), bool)
    counts = MD.kv_counts_for_seq(S)[0]
    meta_all = jnp.asarray(ring_meta(bm, counts, n, block_kv=512))

    out = ring_attention(q, k, v, mesh, meta_all, block_q=512, block_kv=512)
    ref = masked_attention(q, k, v, jnp.ones((S, S), bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_band_sink_matches_single_device():
    n = 4
    mesh = make_mesh(n, dp=1)
    layout = VideoLayout(num_frames=8, frame_size=256)  # S=2048
    S = layout.seq_len
    B, H, D = 1, 2, 64
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, B, H, S, D)

    mult = 2.0
    bm = core_masks.execution_mask_block(
        layout, mult, block_q=512, block_kv=128, first_frame_sink=True, round_mode="ceil"
    )
    counts = MD.kv_counts_for_seq(S)[0]
    meta_all = jnp.asarray(ring_meta(bm, counts, n, block_kv=512))

    import math

    w = math.ceil(mult * layout.frame_size / 128) * 128  # svg1 band (<= w)
    spec = MaskSpec(kind="band_sink", band_width=w + 1, sink_size=layout.frame_size)
    out = ring_attention(q, k, v, mesh, meta_all, mask_spec=spec, block_q=512, block_kv=512)

    ti = np.arange(S)
    mask = (np.abs(ti[:, None] - ti[None, :]) <= w) | (ti[None, :] < layout.frame_size)
    ref = masked_attention(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_composes_with_dp_axis():
    mesh = make_mesh(8, dp=2)  # sp=4
    B, H, S, D = 1, 2, 4 * 512, 32
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, B, H, S, D)
    nQ, nsub = S // 512, S // 128
    meta_all = jnp.asarray(
        ring_meta(np.ones((nQ, nsub), bool), MD.kv_counts_for_seq(S)[0], 4, block_kv=512)
    )
    out = ring_attention(q, k, v, mesh, meta_all, block_q=512, block_kv=512)
    ref = masked_attention(q, k, v, jnp.ones((S, S), bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_usp_ring_band_matches_single_device():
    """USP hybrid (head_axis): Ulysses-sharded heads x ring-sharded sequence
    with SVG1 band+sink masks — xFuserLongContextAttention analog."""
    from jax.sharding import Mesh

    B, H, S, D = 1, 4, 1024, 32
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, B, H, S, D)
    spec = MaskSpec(kind="band_sink", band_width=257, sink_size=128)
    qpos = np.arange(S)[:, None]
    kpos = np.arange(S)[None, :]
    from sparse_videogen_tpu.ops.mask_spec import apply_mask_spec

    mask = np.asarray(apply_mask_spec(spec, jnp.asarray(qpos), jnp.asarray(kpos), jnp.zeros(4, jnp.int32)))
    ref = masked_attention(
        q.reshape(B * H, S, D), k.reshape(B * H, S, D), v.reshape(B * H, S, D),
        jnp.asarray(np.broadcast_to(mask, (B * H, S, S))),
    ).reshape(B, H, S, D)

    n = 4
    bm = np.ones((S // 128, S // 128), bool)
    meta_all = jnp.asarray(ring_meta(bm, MD.kv_counts_for_seq(S)[0], n, block_kv=128))
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("ulysses", "ring"))
    out = ring_attention(
        q, k, v, mesh, meta_all, axis="ring", head_axis="ulysses",
        mask_spec=spec, block_q=128, block_kv=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)
