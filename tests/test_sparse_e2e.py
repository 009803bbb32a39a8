"""End-to-end SVG1 / SVG2 drivers vs pure-jnp oracle compositions (CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.config import SAPConfig, SVGConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.core import placement as core_placement
from sparse_videogen_tpu.core.attention_ref import (
    dense_attention,
    dynamic_block_sparse_ref,
    masked_attention,
)
from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map
from sparse_videogen_tpu.core.profiler import best_mask_idx, sample_mse
from sparse_videogen_tpu.sparse import svg1 as SVG1
from sparse_videogen_tpu.sparse import svg2 as SVG2


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def make_qkv(rng, B, H, S, D, layout=None):
    base = rng.standard_normal((B, H, S, D)).astype(np.float32)
    if layout is not None:  # make half the heads strongly temporal
        t = np.arange(S)
        for h in range(H // 2, H):
            base[:, h] += 2.5 * np.stack(
                [
                    np.sin(2 * np.pi * (t % layout.frame_size) / layout.frame_size * (i + 1))
                    for i in range(D)
                ],
                -1,
            )
    q = jnp.asarray(base)
    k = jnp.asarray(base + 0.1 * rng.standard_normal(base.shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    return q, k, v


class TestSVG1:
    layout = VideoLayout(num_frames=4, frame_size=96)  # S=384
    cfg = SVGConfig(num_sampled_rows=32, sparsity=0.5)

    def make_plan(self):
        return SVG1.make_svg1_plan(
            self.layout, self.cfg, WarmupSchedule(first_layers=1, first_times=900.0),
            block_q=128, block_kv=256,
        )

    def test_sparse_matches_oracle(self):
        rng = np.random.default_rng(0)
        plan = self.make_plan()
        q, k, v = make_qkv(rng, 1, 4, self.layout.seq_len, 32, self.layout)
        key = jax.random.PRNGKey(0)
        out = SVG1.svg1_sparse_attention(q, k, v, key, plan)

        # oracle: same profiling decision, placement, token-level exec mask
        mses = sample_mse(
            q, k, v, plan.profile_preds(), key,
            num_sampled_rows=plan.cfg.num_sampled_rows,
            sample_mse_max_row=plan.cfg.sample_mse_max_row,
        )
        best = best_mask_idx(mses)
        assert np.asarray(best).std() > 0  # both head classes present
        qp, kp, vp = core_placement.sparse_head_placement(q, k, v, best, self.layout)
        S = self.layout.seq_len
        W = math.ceil(plan.multiplier * self.layout.frame_size / 128) * 128
        ti = np.arange(S)
        mask = (np.abs(ti[:, None] - ti[None, :]) <= W) | (ti[None, :] < self.layout.frame_size)
        o = masked_attention(qp, kp, vp, jnp.asarray(mask))
        ref = core_placement.hidden_states_placement(o, best, self.layout)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_warmup_routing(self):
        rng = np.random.default_rng(1)
        plan = self.make_plan()
        q, k, v = make_qkv(rng, 1, 2, self.layout.seq_len, 32)
        key = jax.random.PRNGKey(1)
        dense = dense_attention(q, k, v)
        # layer warmup: layer 0 dense
        out0 = SVG1.svg1_attention(q, k, v, jnp.float32(500.0), key, plan, layer_idx=0)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(dense), rtol=2e-4, atol=2e-5)
        # timestep warmup: t=950 > 900 dense even for layer 5
        out1 = SVG1.svg1_attention(q, k, v, jnp.float32(950.0), key, plan, layer_idx=5)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(dense), rtol=2e-4, atol=2e-5)
        # sparse at t=500, layer 5: differs from dense
        out2 = SVG1.svg1_attention(q, k, v, jnp.float32(500.0), key, plan, layer_idx=5)
        assert np.abs(np.asarray(out2) - np.asarray(dense)).max() > 1e-3


class TestSAP:
    layout = VideoLayout(num_frames=4, frame_size=96)
    cfg = SAPConfig(
        num_q_centroids=6,
        num_k_centroids=10,
        top_p_kmeans=0.8,
        min_kc_ratio=0.1,
        kmeans_iter_init=8,
        kmeans_iter_step=2,
        block_q=128,
        block_kv=256,
    )

    def test_sparse_matches_variable_block_oracle(self):
        rng = np.random.default_rng(2)
        B, H, S, D = 1, 3, self.layout.seq_len, 32
        q, k, v = make_qkv(rng, B, H, S, D)
        state = SVG2.init_sap_state(B * H, D, self.cfg, dtype=jnp.float32)
        key = jax.random.PRNGKey(7)

        out, new_state = SVG2.sap_sparse_attention(
            q, k, v, state, key, layout=self.layout, cfg=self.cfg
        )
        assert bool(new_state.initialized)

        # oracle: same clustering (same rng path), variable-block reference
        (qlab, qcent, qsz), (klab, kcent, ksz), _ = SVG2.sap_cluster(
            q.reshape(B * H, S, D), k.reshape(B * H, S, D), state, self.cfg, key
        )
        dyn = identify_dynamic_map(
            qcent.reshape(B, H, -1, D), kcent.reshape(B, H, -1, D),
            qsz.reshape(B, H, -1), ksz.reshape(B, H, -1),
            self.cfg.top_p_kmeans, self.cfg.min_kc_ratio,
        )
        perm_q = jnp.argsort(qlab, axis=-1)
        perm_k = jnp.argsort(klab, axis=-1)
        take = lambda x, p: jnp.take_along_axis(x.reshape(B * H, S, D), p[..., None], 1)
        o_sorted = dynamic_block_sparse_ref(
            take(q, perm_q).reshape(B, H, S, D),
            take(k, perm_k).reshape(B, H, S, D),
            take(v, perm_k).reshape(B, H, S, D),
            dyn, qsz.reshape(B, H, -1), ksz.reshape(B, H, -1),
        )
        inv_q = jnp.argsort(perm_q, axis=-1)
        ref = jnp.take_along_axis(
            o_sorted.reshape(B * H, S, D), inv_q[..., None], 1
        ).reshape(B, H, S, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-5)

    def test_warmup_and_state_carry(self):
        rng = np.random.default_rng(3)
        B, H, S, D = 1, 2, self.layout.seq_len, 32
        q, k, v = make_qkv(rng, B, H, S, D)
        cfg = SAPConfig(**{**self.cfg.__dict__, "zero_step_kmeans_init": True})
        state = SVG2.init_sap_state(B * H, D, cfg, dtype=jnp.float32)
        warmup = WarmupSchedule(first_layers=0, first_times=900.0)
        dense_fn = lambda q, k, v: dense_attention(q, k, v)
        # warm-up step: dense output + clustering warm-started
        out, state = SVG2.sap_attention(
            q, k, v, jnp.float32(950.0), state, jax.random.PRNGKey(0),
            layout=self.layout, cfg=cfg, warmup=warmup, layer_idx=3, dense_fn=dense_fn,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(dense_attention(q, k, v)), rtol=2e-4, atol=2e-5
        )
        assert bool(state.initialized)
        assert np.abs(np.asarray(state.k_centroids)).sum() > 0
        # sparse step consumes the warm state
        out2, state2 = SVG2.sap_attention(
            q, k, v, jnp.float32(500.0), state, jax.random.PRNGKey(1),
            layout=self.layout, cfg=cfg, warmup=warmup, layer_idx=3, dense_fn=dense_fn,
        )
        assert np.all(np.isfinite(np.asarray(out2)))
        assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-4

    def test_popularity_relabel_is_output_invariant(self):
        rng = np.random.default_rng(4)
        BH, KC, QC, S = 2, 7, 4, 64
        dyn = jnp.asarray(rng.random((BH, QC, KC)) < 0.5)
        klab = jnp.asarray(rng.integers(0, KC, (BH, S)).astype(np.int32))
        ksz = jnp.stack(
            [jnp.bincount(klab[b], length=KC) for b in range(BH)]
        ).astype(jnp.int32)
        kcent = jnp.asarray(rng.standard_normal((BH, KC, 5)), jnp.float32)
        dyn2, klab2, ksz2, kcent2 = SVG2.popularity_relabel(dyn, klab, ksz, kcent)
        # keep-pair relation preserved: token t kept by qc iff kept before
        for b in range(BH):
            for t in range(S):
                np.testing.assert_array_equal(
                    np.asarray(dyn)[b, :, int(klab[b, t])],
                    np.asarray(dyn2)[b, :, int(klab2[b, t])],
                )
        order = np.argsort(-np.asarray(dyn.sum(1)), axis=-1, kind="stable")
        np.testing.assert_array_equal(np.asarray(ksz2)[0], np.asarray(ksz)[0][order[0]])


class TestSAPTextLast:
    """hyvideo layout: video tokens + [prompt | padding] text tail.

    Oracle: reference dynamic_map_post_processing semantics
    (hyvideo/attention.py:657-702) expressed as a token-level mask.
    """

    layout = VideoLayout(
        num_frames=4, frame_size=64, context_length=48,
        text_position="last", prompt_length=30,
    )
    cfg = SAPConfig(
        num_q_centroids=5, num_k_centroids=9, top_p_kmeans=0.8,
        kmeans_iter_init=8, kmeans_iter_step=2,
    )

    def test_matches_postprocessing_oracle(self):
        rng = np.random.default_rng(5)
        lay, cfg = self.layout, self.cfg
        B, H, D = 1, 2, 32
        S, VL, PL = lay.seq_len, lay.video_length, lay.prompt_length
        q, k, v = make_qkv(rng, B, H, S, D)
        state = SVG2.init_sap_state(B * H, D, cfg, dtype=jnp.float32)
        key = jax.random.PRNGKey(11)

        out, _ = SVG2.sap_sparse_attention(q, k, v, state, key, layout=lay, cfg=cfg)

        # oracle clustering over the video part only (same rng path)
        qf = q.reshape(B * H, S, D)
        kf = k.reshape(B * H, S, D)
        (qlab, qcent, qsz), (klab, kcent, ksz), _ = SVG2.sap_cluster(
            qf[:, :VL], kf[:, :VL], state, cfg, key
        )
        dyn = identify_dynamic_map(
            qcent.reshape(B, H, -1, D), kcent.reshape(B, H, -1, D),
            qsz.reshape(B, H, -1), ksz.reshape(B, H, -1),
            cfg.top_p_kmeans, cfg.min_kc_ratio,
        )
        dyn_n = np.asarray(dyn).reshape(B * H, cfg.num_q_centroids, cfg.num_k_centroids)
        qlab_n, klab_n = np.asarray(qlab), np.asarray(klab)
        mask = np.zeros((B * H, S, S), bool)
        for bh in range(B * H):
            video = dyn_n[bh][qlab_n[bh]][:, klab_n[bh]]  # (VL, VL)
            mask[bh, :VL, :VL] = video
            mask[bh, :VL, VL:VL + PL] = True          # video q -> prompt k
            mask[bh, VL:VL + PL, :VL + PL] = True     # prompt q -> video+prompt k
            mask[bh, VL + PL:, VL + PL:] = True       # padding q -> padding k
        from sparse_videogen_tpu.core.attention_ref import masked_attention

        ref = masked_attention(
            qf, kf, v.reshape(B * H, S, D), jnp.asarray(mask)
        ).reshape(B, H, S, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-5)


def test_inplace_temporal_matches_placement():
    """Placement-free SVG1 (per-head dual metadata + band_sink_perm
    predicate) computes the SAME attended set as the physical placement
    path: identical outputs up to fp reassociation. Layout chosen so q
    blocks straddle frame boundaries (frame_size not a block multiple)."""
    import dataclasses as _dc

    from sparse_videogen_tpu.core.profiler import best_mask_idx, sample_mse

    B, H, D = 1, 4, 32
    layout = VideoLayout(num_frames=6, frame_size=320)  # S = 1920
    S = layout.seq_len
    cfg = SVGConfig(sparsity=0.4, num_sampled_rows=16)
    base = SVG1.make_svg1_plan(layout, cfg, block_q=128, block_kv=128)
    inpl = SVG1.make_svg1_plan(layout, cfg, block_q=128, block_kv=128, inplace_temporal=True)

    rs = np.random.RandomState(0)
    # heads 0-1 temporal (tokens similar at the same spatial index across
    # frames), heads 2-3 spatial (smooth over global position)
    fs, F = layout.frame_size, layout.num_frames
    emb_s = rs.randn(fs, D).astype(np.float32) * 2.0
    temporal = np.tile(emb_s[None], (F, 1, 1)).reshape(S, D)
    spatial = np.cumsum(rs.randn(S, D).astype(np.float32) * 0.4, axis=0)
    q = np.empty((B, H, S, D), np.float32)
    k = np.empty((B, H, S, D), np.float32)
    for h in range(H):
        basev = temporal if h < 2 else spatial
        q[0, h] = basev + 0.2 * rs.randn(S, D)
        k[0, h] = basev + 0.2 * rs.randn(S, D)
    q, k = jnp.asarray(q), jnp.asarray(k)
    v = jnp.asarray(rs.randn(B, H, S, D), jnp.float32)
    rng = jax.random.PRNGKey(2)

    ref = SVG1.svg1_sparse_attention(q, k, v, rng, base, interpret=True)
    got = SVG1.svg1_sparse_attention(q, k, v, rng, inpl, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-4)

    # make sure the comparison exercised both head classes
    mses = sample_mse(q, k, v, base.profile_preds(), rng,
                      num_sampled_rows=cfg.num_sampled_rows,
                      sample_mse_max_row=cfg.sample_mse_max_row)
    best = np.asarray(best_mask_idx(mses))
    assert 0 < best.sum() < best.size, best


def test_default_aux_text_kinds():
    """aux=None on text-kind plans defaults from the layout.

    Regression: text-kind predicates read aux[0] (real_len / prompt_len);
    with aux zeroed the allowed region is empty and every top-level entry
    silently returned all-zero output for cog/hyvideo plans."""
    from sparse_videogen_tpu.config import TextPosition

    rng = np.random.default_rng(5)
    for pos in (TextPosition.FIRST, TextPosition.LAST):
        lay = VideoLayout(num_frames=4, frame_size=96, context_length=128,
                          text_position=pos)
        plan = SVG1.make_svg1_plan(
            lay, SVGConfig(num_sampled_rows=32, sparsity=0.5),
            WarmupSchedule(first_layers=1, first_times=900.0),
            block_q=128, block_kv=256)
        q, k, v = make_qkv(rng, 1, 2, lay.seq_len, 32, lay)
        key = jax.random.PRNGKey(3)
        out_none = np.asarray(SVG1.svg1_sparse_attention(q, k, v, key, plan))
        out_aux = np.asarray(
            SVG1.svg1_sparse_attention(q, k, v, key, plan, aux=plan.default_aux()))
        assert np.abs(out_none).max() > 1e-3, f"{pos}: zero output with aux=None"
        np.testing.assert_array_equal(out_none, out_aux)
        d_none = np.asarray(SVG1.dense_attention_kernel(q, k, v, plan))
        assert np.abs(d_none).max() > 1e-3, f"{pos}: zero dense with aux=None"
        w_none = np.asarray(
            SVG1.svg1_attention(q, k, v, jnp.float32(500.0), key, plan, layer_idx=5))
        np.testing.assert_array_equal(w_none, out_none)
