"""Fast CPU tests for SAP tile mode (block_mode="tile").

Tile mode is the TPU-first redesign of SVG2's variable-size cluster blocks
(reference: patched variable-block FlashInfer,
assets/patches/modifications.patch:49-99): tokens are re-labeled into fixed
block_q / block_kv tiles of the k-means-sorted order and the top-p dynamic
map is computed natively at tile granularity, so every selected KV tile is
exactly one kernel DMA chunk (sparse/svg2.py tile_quantize).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SAPConfig, VideoLayout
from sparse_videogen_tpu.core.attention_ref import dense_attention
from sparse_videogen_tpu.sparse import svg2
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, sap_sparse_attention, tile_quantize


def test_tile_quantize_partition_properties():
    """Tiles partition the stable cluster-sorted order into fixed slices."""
    rng = np.random.default_rng(3)
    BH, S, D, grain = 3, 500, 16, 128
    n_tiles = -(-S // grain)
    lab = jnp.asarray(rng.integers(0, 7, (BH, S)), jnp.int32)
    x = jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32)
    tlab, sizes, cent, perm, rank = jax.jit(tile_quantize, static_argnums=(2, 3))(x, lab, grain, n_tiles)

    tlab_n, sizes_n, cent_n = np.asarray(tlab), np.asarray(sizes), np.asarray(cent)
    for b in range(BH):
        # stable sort by cluster label reproduces the tile slicing
        order = np.argsort(np.asarray(lab)[b], kind="stable")
        expect = np.zeros(S, np.int32)
        expect[order] = np.arange(S) // grain
        np.testing.assert_array_equal(tlab_n[b], expect)
        # sizes: full grain except the last partial tile
        exp_sizes = np.full(n_tiles, grain, np.int32)
        exp_sizes[-1] = S - (n_tiles - 1) * grain
        np.testing.assert_array_equal(sizes_n[b], exp_sizes)
        # centroids are segment means over the sorted order
        xs = np.asarray(x)[b][order]
        for t in range(n_tiles):
            seg = xs[t * grain : t * grain + exp_sizes[t]]
            np.testing.assert_allclose(cent_n[b, t], seg.mean(0), rtol=1e-5, atol=1e-5)


def _mk_cfg(**kw):
    base = dict(num_q_centroids=6, num_k_centroids=4, top_p_kmeans=1.0,
                min_kc_ratio=1.0, kmeans_iter_init=3, kmeans_iter_step=1,
                block_q=64, block_kv=128, block_mode="tile")
    base.update(kw)
    return SAPConfig(**base)


import pytest


@pytest.mark.parametrize("grain,bkv,order", [
    (None, 128, "kmeans"), (128, 256, "kmeans"), (256, 128, "kmeans"),
    (None, 128, "pc1"), (256, 128, "pc1")])
def test_tile_full_density_equals_dense_tiny(grain, bkv, order):
    """top_p=1 selects every tile pair -> exact dense attention (fast gate
    version of the slow fuzz; S deliberately not a tile multiple). The
    second case decouples the selection grain (128) from the kernel chunk
    (block_kv=256): adjacent selected tiles must merge into runs exactly.
    The third (grain > block_kv) needs ceil(grain/bkv) chunks per tile —
    regression for the round-4 cap that truncated chunk metadata to KC+2
    rows and silently dropped attended KV (advisor finding)."""
    H, S, D = 2, 5 * 67, 32
    layout = VideoLayout(num_frames=5, frame_size=67)
    cfg = _mk_cfg(tile_grain=grain, block_kv=bkv, tile_order=order)
    key = jax.random.PRNGKey(0)
    kq, kk, kv_, ks = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (1, H, S, D), jnp.float32)
    v = jax.random.normal(kv_, (1, H, S, D), jnp.float32)
    state = init_sap_state(H, D, cfg)
    out, state1 = sap_sparse_attention(q, k, v, state, ks, layout=layout, cfg=cfg)
    out2, _ = sap_sparse_attention(q, k, v, state1, ks, layout=layout, cfg=cfg)
    ref = dense_attention(q, k, v)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 3e-5
    assert float(jnp.max(jnp.abs(out2 - ref))) / scale < 3e-5


def test_tile_forced_prefix_matches_masked_oracle():
    """force_density in tile mode selects a tile prefix; the output must
    equal masked dense attention over tokens whose tile label < kcn.

    (With a broadcast map, popularity relabeling is a stable no-op, so the
    prefix is in tile_quantize order — re-derived here via the same k-means
    call with the same rng/state.)
    """
    B, H, S, D = 1, 2, 640, 32
    layout = VideoLayout(num_frames=5, frame_size=128)
    cfg = _mk_cfg(top_p_kmeans=0.9, min_kc_ratio=0.0, force_density=0.4)
    KC = S // cfg.block_kv  # 5 tiles
    kcn = -(-int(0.4 * KC) // 1)  # ceil(0.4 * 5) = 2
    rng_np = np.random.default_rng(7)
    q = jnp.asarray(rng_np.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((B, H, S, D)), jnp.float32)
    state = init_sap_state(B * H, D, cfg)
    ks = jax.random.PRNGKey(5)

    out, new_state, density = sap_sparse_attention(
        q, k, v, state, ks, layout=layout, cfg=cfg, with_density=True)

    # re-derive the tile labels exactly as the pipeline does (PC1 seriation
    # precedes tiling)
    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    (_, _, _), (klab_c, kcent_c, ksz_c), _ = svg2.sap_cluster(qf, kf, state, cfg, ks)
    klab_c = svg2.seriate_labels(klab_c, kcent_c, ksz_c, cfg.num_k_centroids)
    klab, _, _, _, _ = tile_quantize(kf, klab_c, cfg.block_kv, KC)

    keep = np.asarray(klab) < kcn  # (BH, S)
    qn, kn, vn = (np.asarray(t).reshape(B * H, S, D) for t in (q, k, v))
    logits = np.einsum("bsd,btd->bst", qn, kn) / np.sqrt(D)
    logits = np.where(keep[:, None, :], logits, -np.inf)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = (p @ vn).reshape(B, H, S, D)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)
    # density telemetry matches the forced tile fraction (uniform tiles)
    np.testing.assert_allclose(np.asarray(density), kcn / KC, atol=1e-6)


@pytest.mark.parametrize("bkv,grain", [(256, 128), (128, 256)])
def test_tile_topp_subset_matches_token_oracle(bkv, grain):
    """On genuinely clustered data with top_p < 1, tile mode selects a real
    subset (density in (0,1)) and the output EXACTLY equals masked dense
    attention over the token-level mask implied by the tile dynamic map
    (mask[i, j] = dyn[q_tile(i), kv_tile(j)]) — the tile analog of the
    reference's variable-block exactness. The grain > block_kv case is the
    advisor-verified round-4 truncation repro (scattered selection, each
    tile needing ceil(grain/bkv) chunks)."""
    from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map

    rng = np.random.default_rng(11)
    B, H, D = 1, 2, 48
    layout = VideoLayout(num_frames=4, frame_size=96)
    S = layout.seq_len
    centers = rng.standard_normal((5, D)) * 3
    qk = centers[rng.integers(0, 5, S)] + 0.2 * rng.standard_normal((S, D))
    q = jnp.asarray(np.broadcast_to(qk, (B, H, S, D)).copy(), jnp.float32)
    k = jnp.asarray(q)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    cfg = _mk_cfg(num_q_centroids=5, num_k_centroids=5, top_p_kmeans=0.85,
                  min_kc_ratio=0.0, block_q=32, block_kv=bkv, tile_grain=grain)
    state = init_sap_state(B * H, D, cfg, dtype=jnp.float32)
    ks = jax.random.PRNGKey(0)
    out, st2, density = sap_sparse_attention(
        q, k, v, state, ks, layout=layout, cfg=cfg, with_density=True)
    d = float(np.mean(np.asarray(density)))
    assert 0.05 < d < 0.95, d

    # re-derive the tile labels + dynamic map exactly as the pipeline does
    # (relabeling afterwards is output-invariant, so the PRE-relabel map is
    # a valid oracle)
    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    (qlab_c, qcent_c, qsz_c), (klab_c, kcent_c, ksz_c), _ = svg2.sap_cluster(
        qf, kf, state, cfg, ks)
    qlab_c = svg2.seriate_labels(qlab_c, qcent_c, qsz_c, cfg.num_q_centroids)
    klab_c = svg2.seriate_labels(klab_c, kcent_c, ksz_c, cfg.num_k_centroids)
    bq, grain = cfg.block_q, (cfg.tile_grain or cfg.block_kv)
    QC, KC = -(-S // bq), -(-S // grain)
    qlab, qsz, qcent, _, _ = tile_quantize(qf, qlab_c, bq, QC)
    klab, ksz, kcent, _, _ = tile_quantize(kf, klab_c, grain, KC)
    dyn = identify_dynamic_map(
        qcent.reshape(B, H, QC, D), kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC), ksz.reshape(B, H, KC),
        cfg.top_p_kmeans, cfg.min_kc_ratio)
    dyn_f = np.asarray(dyn.reshape(B * H, QC, KC))
    qlab_n, klab_n = np.asarray(qlab), np.asarray(klab)
    qn, kn, vn = (np.asarray(t.reshape(B * H, S, D)) for t in (q, k, v))
    outs = []
    for b in range(B * H):
        mask = dyn_f[b][qlab_n[b]][:, klab_n[b]]  # (S, S) token-level
        logits = qn[b] @ kn[b].T / np.sqrt(D)
        logits = np.where(mask, logits, -np.inf)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        outs.append(p @ vn[b])
    oracle = np.stack(outs).reshape(B, H, S, D)
    rel = np.abs(np.asarray(out) - oracle).max() / np.abs(oracle).max()
    assert rel < 3e-5, rel


def test_tile_topp_text_last_matches_token_oracle():
    """Text-last (HunyuanVideo) tile mode with a REAL top-p subset: the CSR
    grain-aligned layout (video tiles padded to KC*grain, prompt + fake as
    trailing sub-block-aligned tiles) must exactly reproduce masked dense
    attention over the token mask implied by the extended tile dynamic map
    (reference post-processing semantics: hyvideo/attention.py:657-702)."""
    from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map

    rng = np.random.default_rng(23)
    B, H, D = 1, 2, 48
    layout = VideoLayout(num_frames=4, frame_size=96, context_length=45,
                         text_position="last", prompt_length=17)
    S, vl = layout.seq_len, layout.video_length
    centers = rng.standard_normal((5, D)) * 3
    qk = centers[rng.integers(0, 5, S)] + 0.2 * rng.standard_normal((S, D))
    q = jnp.asarray(np.broadcast_to(qk, (B, H, S, D)).copy(), jnp.float32)
    k = jnp.asarray(q)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    cfg = _mk_cfg(num_q_centroids=5, num_k_centroids=5, top_p_kmeans=0.85,
                  min_kc_ratio=0.0, block_q=32, block_kv=128)
    state = init_sap_state(B * H, D, cfg, dtype=jnp.float32)
    ks = jax.random.PRNGKey(0)
    out, _, density = sap_sparse_attention(
        q, k, v, state, ks, layout=layout, cfg=cfg, with_density=True)
    d = float(np.mean(np.asarray(density)))
    assert 0.05 < d < 0.95, d

    # re-derive tile labels + extended dynamic map exactly as the pipeline
    qf = q.reshape(B * H, S, D)[:, :vl]
    kf = k.reshape(B * H, S, D)[:, :vl]
    (qlab_c, qcent_c, qsz_c), (klab_c, kcent_c, ksz_c), _ = svg2.sap_cluster(
        qf, kf, state, cfg, ks)
    qlab_c = svg2.seriate_labels(qlab_c, qcent_c, qsz_c, cfg.num_q_centroids)
    klab_c = svg2.seriate_labels(klab_c, kcent_c, ksz_c, cfg.num_k_centroids)
    bq, grain = cfg.block_q, cfg.block_kv
    QC, KC = -(-vl // bq), -(-vl // grain)
    qlab, qsz, qcent, _, _ = tile_quantize(qf, qlab_c, bq, QC)
    klab, ksz, kcent, _, _ = tile_quantize(kf, klab_c, grain, KC)
    dyn = identify_dynamic_map(
        qcent.reshape(B, H, QC, D), kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC), ksz.reshape(B, H, KC),
        cfg.top_p_kmeans, cfg.min_kc_ratio)
    dyn2, qlab_e, _, klab_e, _ = svg2._extend_text_clusters(
        dyn.reshape(B * H, QC, KC), qlab, qsz, klab, ksz, layout)

    dyn_n = np.asarray(dyn2)
    qlab_n, klab_n = np.asarray(qlab_e), np.asarray(klab_e)
    qn, kn, vn = (np.asarray(t.reshape(B * H, S, D)) for t in (q, k, v))
    outs = []
    for b in range(B * H):
        mask = dyn_n[b][qlab_n[b]][:, klab_n[b]]  # (S, S) token-level
        logits = qn[b] @ kn[b].T / np.sqrt(D)
        logits = np.where(mask, logits, -np.inf)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        outs.append(p @ vn[b])
    oracle = np.stack(outs).reshape(B, H, S, D)
    rel = np.abs(np.asarray(out) - oracle).max() / np.abs(oracle).max()
    assert rel < 3e-5, rel


def test_tile_pc1_order_topp_matches_token_oracle():
    """tile_order="pc1" (no k-means; tokens sorted by their own PC1
    projection) with a real top-p subset: output equals masked dense
    attention over the token mask implied by the tile dynamic map, where
    tile(i) = rank-of-PC1-key // grain (svg2.token_pc1_keys)."""
    from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map

    rng = np.random.default_rng(29)
    B, H, D = 1, 2, 48
    layout = VideoLayout(num_frames=4, frame_size=96)
    S = layout.seq_len
    centers = rng.standard_normal((5, D)) * 3
    qk = centers[rng.integers(0, 5, S)] + 0.2 * rng.standard_normal((S, D))
    q = jnp.asarray(np.broadcast_to(qk, (B, H, S, D)).copy(), jnp.float32)
    k = jnp.asarray(q)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    cfg = _mk_cfg(top_p_kmeans=0.85, min_kc_ratio=0.0, block_q=32,
                  block_kv=128, tile_order="pc1")
    state = init_sap_state(B * H, D, cfg, dtype=jnp.float32)
    ks = jax.random.PRNGKey(0)
    out, _, density = sap_sparse_attention(
        q, k, v, state, ks, layout=layout, cfg=cfg, with_density=True)
    d = float(np.mean(np.asarray(density)))
    assert 0.05 < d < 0.95, d

    # re-derive the PC1 tile partition + dynamic map with the pipeline's own
    # primitives (bit-identical centroids, so top-p boundary selections
    # cannot flip)
    from sparse_videogen_tpu.core import permute as core_permute

    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    bq, grain = cfg.block_q, cfg.block_kv
    QC, KC = -(-S // bq), -(-S // grain)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B * H, S), 1)

    def partition(xs, keys, g, C):
        _, perm = jax.lax.sort_key_val(keys, iota, dimension=-1)
        _, rank = jax.lax.sort_key_val(perm, iota, dimension=-1)
        sz = svg2.tile_sizes(S, g, C, B * H)
        cent = svg2.tile_centroids(core_permute.flat_row_gather(xs, perm), sz, g, C)
        return (rank // g).astype(jnp.int32), sz, cent

    qlab, qsz, qcent = partition(qf, svg2.token_pc1_keys(qf), bq, QC)
    klab, ksz, kcent = partition(kf, svg2.token_pc1_keys(kf), grain, KC)
    dyn = identify_dynamic_map(
        qcent.reshape(B, H, QC, D), kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC), ksz.reshape(B, H, KC),
        cfg.top_p_kmeans, cfg.min_kc_ratio)
    dyn_f = np.asarray(dyn.reshape(B * H, QC, KC))
    qlab, klab = np.asarray(qlab), np.asarray(klab)
    qn, kn, vn = (np.asarray(t.reshape(B * H, S, D)) for t in (q, k, v))
    outs = []
    for b in range(B * H):
        mask = dyn_f[b][qlab[b]][:, klab[b]]
        logits = qn[b] @ kn[b].T / np.sqrt(D)
        logits = np.where(mask, logits, -np.inf)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        outs.append(p @ vn[b])
    oracle = np.stack(outs).reshape(B, H, S, D)
    rel = np.abs(np.asarray(out) - oracle).max() / np.abs(oracle).max()
    assert rel < 3e-5, rel


def test_tile_mode_dataclass_roundtrip():
    cfg = _mk_cfg()
    assert dataclasses.replace(cfg, block_mode="cluster").block_mode == "cluster"
    assert hash(cfg) is not None  # static jit arg
