"""Multi-device tests on 8 virtual CPU devices (SURVEY section 4: the
reference has no distributed tests; these validate the Ulysses/FSDP layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.config import SAPConfig, SVGConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.parallel import UlyssesRuntime, make_mesh, shard_params
from sparse_videogen_tpu.sparse.runtimes import SAPRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_qkv(rng, B, H, S, D):
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    return q, k, v


def test_ulysses_svg1_matches_single_device():
    rng = np.random.default_rng(0)
    layout = VideoLayout(num_frames=4, frame_size=96)
    B, H, S, D = 1, 8, layout.seq_len, 32
    q, k, v = make_qkv(rng, B, H, S, D)
    plan = make_svg1_plan(
        layout, SVGConfig(sparsity=0.4, num_sampled_rows=16),
        WarmupSchedule(first_layers=0, first_times=900.0),
        block_q=128, block_kv=128,
    )
    inner = SVG1Runtime(plan)
    mesh = make_mesh(8, dp=2)  # sp = 4
    uly = UlyssesRuntime(inner, mesh)

    consts = inner.consts()
    key = jax.random.PRNGKey(3)
    t = jnp.float32(500.0)
    li = jnp.int32(2)
    state = inner.init_state(B * H, D, 1)[0:1][0]  # per-layer slice shape

    out_single, _ = inner(q, k, v, t, key, li, state, consts)
    out_uly, _ = uly(q, k, v, t, key, li, state, consts)
    np.testing.assert_allclose(
        np.asarray(out_uly), np.asarray(out_single), rtol=2e-4, atol=2e-5
    )


def test_ulysses_sap_state_sharding_roundtrip():
    rng = np.random.default_rng(1)
    layout = VideoLayout(num_frames=4, frame_size=96)
    B, H, S, D = 1, 8, layout.seq_len, 32
    q, k, v = make_qkv(rng, B, H, S, D)
    cfg = SAPConfig(num_q_centroids=4, num_k_centroids=6, kmeans_iter_init=4,
                    kmeans_iter_step=1, block_q=128, block_kv=128)
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    inner = SAPRuntime(plan, cfg, WarmupSchedule(first_layers=0, first_times=900.0))
    mesh = make_mesh(8, dp=1)  # sp = 8
    uly = UlyssesRuntime(inner, mesh)
    consts = inner.consts()
    key = jax.random.PRNGKey(0)
    # warm state (deterministic path — the cold random init legitimately
    # differs across shardings): centroids from evenly spaced tokens
    from sparse_videogen_tpu.sparse.svg2 import SAPState

    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    state = SAPState(
        qf[:, :: S // cfg.num_q_centroids][:, : cfg.num_q_centroids],
        kf[:, :: S // cfg.num_k_centroids][:, : cfg.num_k_centroids],
        jnp.ones((), bool),
        jnp.zeros((B * H,), jnp.float32),
    )

    out, new_state = uly(q, k, v, jnp.float32(500.0), key, jnp.int32(0), state, consts)
    assert np.isfinite(np.asarray(out)).all()
    assert new_state.q_centroids.shape == (B * H, cfg.num_q_centroids, D)
    assert bool(new_state.initialized)
    # per-head clustering is head-local: sharded run == single-device run
    out1, ns1 = inner(q, k, v, jnp.float32(500.0), key, jnp.int32(0), state, consts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out1), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.q_centroids), np.asarray(ns1.q_centroids), rtol=2e-4, atol=2e-5
    )


def test_shard_params_places_and_runs():
    from sparse_videogen_tpu.models.wan import model as WM

    cfg = WM.WanConfig(dim=64, ffn_dim=128, num_heads=8, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=8)
    params = WM.init_wan_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(8, dp=2)
    sparams = shard_params(params, mesh)
    # big leaves sharded, small replicated
    w = sparams["blocks"]["ffn"]["fc1"]["w"]
    assert len(w.sharding.device_set) == 8
    layout = VideoLayout(num_frames=2, frame_size=24)
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime

    rt = DenseRuntime(plan)
    x = jnp.ones((2, cfg.in_dim, 2, 8, 12), jnp.float32)
    out, _ = WM.wan_forward(
        sparams, cfg, x, jnp.asarray([500.0, 500.0]), jnp.ones((2, 8, 48)),
        attention=UlyssesRuntime(rt, mesh),
    )
    assert np.isfinite(np.asarray(out)).all()
