"""SVG2 / SAP driver: k-means -> dynamic map -> block-aligned permutation ->
dynamic block-sparse attention -> inverse permutation.

Reference flow: WanAttn_SAPAttn_Processor.attention_core_logic
(/root/reference/svg/models/wan/attention.py:499-559) with
semantic_aware_permutation (:447-476).

TPU re-design decisions (vs the reference's CUDA/FlashInfer path):
- Queries: variable cluster blocks become block_q-aligned padded spans
  (core/permute.padded_permutation) so each q block maps to one q cluster.
- Keys/values: permuted cluster-contiguously UNPADDED; a row's visited set
  is a short list of maximal token runs [a, b) (adjacent selected clusters
  merge), walked in block_kv chunks by the kernel with exact [lo, hi)
  windows — softmax equals the variable-block formulation bit-for-bit and
  no padding inflation occurs (at kc=1000 padding would inflate KV 2.7x).
- The per-step FlashInfer plan() disappears: metadata is traced integer math
  (ops/metadata.run_meta_jnp) at (head, q-cluster) granularity.
- KV clusters are relabeled in descending keep-popularity order before
  permutation, which coalesces each row's visited blocks into longer runs so
  the kernel can use 512-token DMA chunks (a pure layout heuristic — the
  attention output is unchanged).
- The k-means warm-start state is an explicit functional carry (SAPState)
  threaded through the denoising loop, instead of mutated processor
  attributes (reference attention.py:406-408,427-429).
- block_mode="tile" (TPU-first alternative to the reference's variable
  cluster blocks): tokens are re-labeled into fixed block_q/block_kv tiles
  of the k-means-sorted order and the top-p dynamic map is computed
  natively at tile granularity from tile centroids (tile_quantize), so
  every selected KV tile is exactly one kernel DMA chunk — organic
  (scattered) top-p selections then run with zero padding waste, where
  cluster-granularity runs measured 1.7-13x wasted KV traffic on the
  128-lane MXU (NOTES_ROUND4.md organic saga).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, TextPosition, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.core.dynamic_map import density_calculation, identify_dynamic_map
from sparse_videogen_tpu.core.kmeans import batch_kmeans, init_centroids
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import (
    block_sparse_attention_kv,
    block_sparse_attention_runs,
    pack_kv,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SAPState:
    """k-means warm-start carry (one per attention layer).

    last_density mirrors the reference's per-(timestep, layer) density
    telemetry (svg/models/wan/attention.py:540-557): the sparse branch
    records the step's per-head kept-mass fraction so the host-side step
    loop can JSONL-log it (utils/density.DensityLogger) without a second
    device round trip; dense/warm-up steps leave zeros.
    """

    q_centroids: jnp.ndarray  # (B*H, QC, D)
    k_centroids: jnp.ndarray  # (B*H, KC, D)
    initialized: jnp.ndarray  # () bool
    last_density: jnp.ndarray  # (B*H,) f32


def init_sap_state(batch_heads: int, head_dim: int, cfg: SAPConfig, dtype=jnp.bfloat16) -> SAPState:
    return SAPState(
        q_centroids=jnp.zeros((batch_heads, cfg.num_q_centroids, head_dim), dtype),
        k_centroids=jnp.zeros((batch_heads, cfg.num_k_centroids, head_dim), dtype),
        initialized=jnp.zeros((), bool),
        last_density=jnp.zeros((batch_heads,), jnp.float32),
    )


def _kmeans_with_warmstart(x, n_clusters, state_centroids, initialized, cfg, rng):
    """cond(initialized): warm-start few iters; else: random init, many iters."""

    def cold(_):
        init = init_centroids(x, n_clusters, rng)
        return batch_kmeans(x, n_clusters, cfg.kmeans_iter_init, init, metric=cfg.kmeans_metric)

    def warm(_):
        return batch_kmeans(
            x, n_clusters, cfg.kmeans_iter_step, state_centroids.astype(x.dtype),
            metric=cfg.kmeans_metric,
        )

    return jax.lax.cond(initialized, warm, cold, None)


def sap_cluster(q, k, state: SAPState, cfg: SAPConfig, rng):
    """Run per-head k-means on Q and K. q,k: (BH, S, D)."""
    rq, rk = jax.random.split(rng)
    qlab, qcent, qsz = _kmeans_with_warmstart(
        q, cfg.num_q_centroids, state.q_centroids, state.initialized, cfg, rq
    )
    klab, kcent, ksz = _kmeans_with_warmstart(
        k, cfg.num_k_centroids, state.k_centroids, state.initialized, cfg, rk
    )
    # keep the carried state's dtype stable so warm-up (dense) and sparse
    # branches of lax.cond return identical pytree types
    new_state = SAPState(
        qcent.astype(state.q_centroids.dtype),
        kcent.astype(state.k_centroids.dtype),
        jnp.ones((), bool),
        state.last_density,
    )
    return (qlab, qcent, qsz), (klab, kcent, ksz), new_state


def tile_sizes(n_tokens: int, grain: int, n_tiles: int, batch: int):
    """(batch, n_tiles) int32 tile sizes: full `grain` except the last tile."""
    sizes = jnp.clip(n_tokens - jnp.arange(n_tiles, dtype=jnp.int32) * grain, 0, grain)
    return jnp.broadcast_to(sizes[None], (batch, n_tiles)).astype(jnp.int32)


def tile_centroids(xs, sizes, grain: int, n_tiles: int):
    """Segment means over fixed `grain`-token tiles of an ALREADY-SORTED
    token array. xs: (BH, L, D) with L >= the token count (extra rows are
    zero padding and the partial-tile sizes exclude them exactly)."""
    BH, L, D = xs.shape
    dt = xs.dtype
    pad = n_tiles * grain - L
    if pad > 0:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    xs = xs[:, : n_tiles * grain].reshape(BH, n_tiles, grain, D).astype(jnp.float32)
    cent = jnp.sum(xs, axis=2) / jnp.maximum(sizes[..., None].astype(jnp.float32), 1.0)
    return cent.astype(dt)


def tile_quantize(x, lab, grain: int, n_tiles: int):
    """Re-label tokens into fixed `grain`-token tiles of the cluster-sorted
    order; return (tile_labels, tile_sizes, tile_centroids, perm, rank)
    where perm is the sorted order (new -> old) and rank its inverse
    (old -> new) — tiles slice this order, so the sort IS the tile-mode
    token permutation and callers reuse it instead of re-sorting.

    TPU-first redesign of SVG2's variable-size cluster blocks (SURVEY §7).
    The reference's patched FlashInfer kernel walks variable cluster blocks
    at 64-token GPU tiles (assets/patches/modifications.patch:49-99); on a
    128-lane MXU every selected run instead pays a full static block_kv DMA
    chunk, and organic top-p maps select SCATTERED clusters — measured
    1.7-13x wasted KV traffic (NOTES_ROUND4.md, wan-14B organic sweep).
    Quantizing the k-means-sorted order into tiles of exactly the kernel
    chunk size makes every selected tile one full DMA chunk: zero padding
    waste, zero partial chunks, and a uniform run-metadata layout. k-means
    still provides the semantic ordering (a stable sort keeps within-cluster
    temporal order, so tiles inherit cluster homogeneity); the dynamic map
    is then computed natively at tile granularity from tile centroids
    (segment means), so the top-p selection semantics are unchanged — only
    the selection granularity is the hardware tile instead of the cluster.

    NOTE: sap_sparse_attention no longer calls this wrapper — it composes
    the pieces (sort, tile_sizes, tile_centroids) so the token gather is
    shared with the kernel input (the standalone K gather here is not
    CSE-able against the packed [K|V] kernel gather) and the kv-side rank
    sort is skipped. Kept as the reference implementation for tests/probes.

    x: (BH, S, D) tokens, lab: (BH, S) k-means labels. n_tiles = ceil(S/grain).
    """
    BH, S, D = x.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)
    _, perm = jax.lax.sort_key_val(lab, iota, dimension=-1)  # new -> old
    _, rank = jax.lax.sort_key_val(perm, iota, dimension=-1)  # old -> new
    tlab = (rank // grain).astype(jnp.int32)
    sizes = tile_sizes(S, grain, n_tiles, BH)
    xs = core_permute.flat_row_gather(x, perm)
    cent = tile_centroids(xs, sizes, grain, n_tiles).astype(x.dtype)
    return tlab, sizes, cent, perm, rank


def token_pc1_keys(x):
    """Per-head token PC1 projections: (BH, S, D) -> (BH, S) f32 sort keys.

    tile_order="pc1": in tile mode clustering exists only to ORDER tokens
    (the top-p selection runs on tile centroids), so the k-means + seriation
    + relabel chain can be replaced by sorting each token on its own
    principal-component projection — two einsum passes over x instead of
    several Lloyd iterations. 8 fixed power iterations on the token
    covariance (same scheme as pc1_order); the mean only shifts every key by
    a constant, so centering of the keys is skipped (sort-invariant).
    """
    BH, S, D = x.shape
    g = jnp.einsum("bsd,bse->bde", x, x, preferred_element_type=jnp.float32)
    mu = jnp.mean(x.astype(jnp.float32), axis=1)  # (BH, D)
    cov = g / S - mu[:, :, None] * mu[:, None, :]
    v = jnp.ones((BH, D, 1), jnp.float32)
    for _ in range(8):
        v = cov @ v
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-20)
    return jnp.einsum(
        "bsd,bd->bs", x, v[..., 0].astype(x.dtype),
        preferred_element_type=jnp.float32)


def popularity_relabel(dyn_map, klab, ksz, kcent):
    """Relabel KV clusters by descending keep-popularity (layout-only)."""
    from sparse_videogen_tpu.core.permute import gather_small_i32

    pop = jnp.sum(dyn_map, axis=-2)  # (BH', ..., KC) -> over q clusters
    pop = pop.reshape(klab.shape[0], -1)  # (BH, KC)
    order = jnp.argsort(-pop, axis=-1).astype(jnp.int32)  # new -> old
    rank = jnp.argsort(order, axis=-1).astype(jnp.int32)  # old -> new
    BH, KC = pop.shape
    # token-level relabel via one-hot matmul (XLA element gathers are slow)
    klab2 = gather_small_i32(rank, klab, KC)
    ksz2 = jnp.take_along_axis(ksz, order, axis=-1)
    kcent2 = jnp.take_along_axis(kcent, order[..., None], axis=-2)
    dyn2 = jnp.take_along_axis(
        dyn_map.reshape(BH, -1, KC), order[:, None, :], axis=-1
    )
    return dyn2, klab2, ksz2, kcent2


def pc1_order(cent, sizes):
    """Size-weighted centroid-PC1 seriation keys: (order, rank).

    cent: (BH, C, D), sizes: (BH, C). order is new->old, rank old->new.
    PC1 via 8 fixed power iterations on the size-weighted centroid
    covariance (deterministic start; degenerate spectra give some valid
    order). Shared by pc1_relabel (post-map layout) and the tile-mode
    pre-tiling seriation.
    """
    w = sizes[..., None].astype(jnp.float32)
    c = cent.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mu = jnp.sum(c * w, axis=1, keepdims=True) / wsum
    cw = (c - mu) * jnp.sqrt(w)
    v = jnp.ones((c.shape[0], c.shape[-1], 1), jnp.float32)
    for _ in range(8):
        v = jnp.einsum("bkd,bke->bde", cw, cw @ v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-20)
    key = ((c - mu) @ v)[..., 0]  # (BH, C)
    order = jnp.argsort(key, axis=-1).astype(jnp.int32)  # new -> old
    rank = jnp.argsort(order, axis=-1).astype(jnp.int32)  # old -> new
    return order, rank


def seriate_labels(lab, cent, sizes, n_clusters: int):
    """Relabel tokens so cluster ids follow centroid-PC1 order.

    Pre-tiling step for block_mode="tile": raw k-means label ids are
    ARBITRARY, so fixed tiles of the label-sorted order would span
    semantically unrelated clusters, blurring the tile centroids that feed
    the top-p selection (measured on wan-14B organic: tile density 0.54 vs
    0.24 at cluster granularity without seriation). PC1-adjacent clusters
    are similar, so each tile inherits cluster coherence.
    """
    from sparse_videogen_tpu.core.permute import gather_small_i32

    _, rank = pc1_order(cent, sizes)
    return gather_small_i32(rank, lab, n_clusters)


def pc1_relabel(dyn_map, klab, ksz, kcent):
    """Relabel KV clusters along the top principal component of their
    centroids (size-weighted spectral seriation). Layout-only permutation —
    output-invariant, like popularity_relabel — but chosen for RUN
    CONTIGUITY under organic dynamic maps: a q cluster's top-p selection is
    a similarity ball around its centroid, so ordering k clusters by a
    locality-preserving 1-D key turns each row's selection into a few long
    runs. Popularity ordering only coalesces the globally-popular prefix;
    the scattered tail fragments into per-cluster runs (measured ~10x
    kernel waste at block_kv=1024 on organic wan-14B maps, round 4).

    PC1 keys from pc1_order (8 fixed power iterations on the size-weighted
    centroid covariance).
    """
    from sparse_videogen_tpu.core.permute import gather_small_i32

    BH = klab.shape[0]
    KC = ksz.shape[-1]
    order, rank = pc1_order(kcent.reshape(BH, KC, -1), ksz.reshape(BH, KC))
    klab2 = gather_small_i32(rank, klab, KC)
    ksz2 = jnp.take_along_axis(ksz, order, axis=-1)
    kcent2 = jnp.take_along_axis(kcent, order[..., None], axis=-2)
    dyn2 = jnp.take_along_axis(
        dyn_map.reshape(BH, -1, KC), order[:, None, :], axis=-1
    )
    return dyn2, klab2, ksz2, kcent2


def _extend_text_dyn(dyn_f, layout: VideoLayout, QC: int, KC: int):
    """Extend a (BH, QC, KC) dynamic map with the two text clusters
    (prompt, padding) of a text-last layout — the map part of
    _extend_text_clusters, reused alone by the CSR tile path (whose static
    grain-aligned layout never reads the extended labels/sizes)."""
    pl_ = layout.prompt_length
    ul = layout.context_length - pl_
    dyn2 = jnp.pad(dyn_f, ((0, 0), (0, 2), (0, 2)))
    if pl_ > 0:
        dyn2 = dyn2.at[:, QC, : KC + 1].set(True)  # prompt q -> video + prompt k
        dyn2 = dyn2.at[:, :QC, KC].set(True)  # video q -> prompt k
    if ul > 0:
        dyn2 = dyn2.at[:, QC + 1, KC + 1].set(True)  # padding q -> padding k
    return dyn2


def _extend_text_clusters(dyn_f, qlab, qsz, klab, ksz, layout: VideoLayout):
    """Append prompt + padding clusters for text-last layouts (HunyuanVideo).

    Reference: dynamic_map_post_processing
    (/root/reference/svg/models/hyvideo/attention.py:657-702):
      - prompt queries attend all video clusters + the prompt cluster
      - every video cluster (and the prompt cluster) attends the prompt keys
      - padding queries attend padding keys only (avoids an all-masked row)
    Here prompt/padding become two extra clusters (indices C, C+1) whose
    tokens are the unpermuted text tail, so the whole runs-mode machinery
    (sort, run metadata, kernel) applies unchanged.
    """
    BH = qlab.shape[0]
    pl_ = layout.prompt_length
    ul = layout.context_length - pl_
    QC = qsz.shape[-1]
    KC = ksz.shape[-1]

    def ext_labels(lab, C):
        text = jnp.concatenate(
            [jnp.full((BH, pl_), C, jnp.int32), jnp.full((BH, ul), C + 1, jnp.int32)],
            axis=-1,
        )
        return jnp.concatenate([lab, text], axis=-1)

    def ext_sizes(sz):
        e = jnp.array([[pl_, ul]], jnp.int32)
        return jnp.concatenate([sz, jnp.broadcast_to(e, (BH, 2)).astype(sz.dtype)], axis=-1)

    dyn2 = _extend_text_dyn(dyn_f, layout, QC, KC)
    return dyn2, ext_labels(qlab, QC), ext_sizes(qsz), ext_labels(klab, KC), ext_sizes(ksz)


@partial(
    jax.jit,
    static_argnames=("layout", "cfg", "interpret", "with_density"),
)
def sap_sparse_attention(
    q,
    k,
    v,
    state: SAPState,
    rng,
    *,
    layout: VideoLayout,
    cfg: SAPConfig,
    interpret=None,
    with_density: bool = False,
):
    """The sparse branch. q,k,v: (B, H, S, D) -> (out, new_state[, density]).

    The reference requires cfg batch == 1 for SAP (wan/attention.py:502);
    here any B works (problems are batched over B*H).
    """
    B, H, S, D = q.shape
    BH = B * H
    QC, KC = cfg.num_q_centroids, cfg.num_k_centroids
    bq, bkv = cfg.block_q, cfg.block_kv
    # text-last layouts (HunyuanVideo): cluster ONLY the video tokens; the
    # text tail becomes two fixed extra clusters (_extend_text_clusters)
    text_last = layout.text_position == TextPosition.LAST and layout.context_length > 0
    vl = layout.video_length if text_last else S

    qf = q.reshape(BH, S, D)
    kf = k.reshape(BH, S, D)
    vf = v.reshape(BH, S, D)

    # 1. token ordering. Default: k-means (warm-startable) over the video
    # part. tile_order="pc1" (tile mode only) orders tokens by their own
    # PC1 projection instead — in tile mode clustering exists only to
    # order tokens, so k-means is skipped entirely (token_pc1_keys).
    tile_mode = cfg.block_mode == "tile"
    pc1_tiles = tile_mode and cfg.tile_order == "pc1"
    if pc1_tiles:
        new_state = state  # the k-means warm-start carry is unused
    else:
        (qlab, qcent, qsz), (klab, kcent, ksz), new_state = sap_cluster(
            qf[:, :vl], kf[:, :vl], state, cfg, rng
        )

    # 1b. tile mode: quantize the token order into fixed hardware tiles
    # (q tiles of block_q, KV tiles of block_kv) and select at tile
    # granularity — every selected KV tile is exactly one kernel DMA chunk
    if tile_mode:
        if pc1_tiles:
            qkeys = token_pc1_keys(qf[:, :vl])
            kkeys = token_pc1_keys(kf[:, :vl])
        else:
            # seriate cluster ids along centroid PC1 first: tiles slice the
            # key-sorted order, and raw k-means ids are arbitrary (see
            # seriate_labels — without this, tiles mix unrelated clusters
            # and the blurred tile centroids double the organic density)
            qkeys = seriate_labels(qlab, qcent, qsz, QC)
            kkeys = seriate_labels(klab, kcent, ksz, KC)
        kv_grain = cfg.tile_grain or bkv
        assert kv_grain % MD.SUB == 0, (kv_grain, MD.SUB)
        QC = -(-vl // bq)
        KC = -(-vl // kv_grain)
        # tile partition = one key sort per side (the sort IS the token
        # permutation; tiles slice it). Only the q side needs the inverse
        # (token -> padded position); the kv side's rank would only feed
        # tile labels the CSR path never reads — skipping it drops one
        # (BH, vl) sort per layer.
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (BH, vl), 1)
        _, qperm = jax.lax.sort_key_val(qkeys, iota_v, dimension=-1)
        _, qrank = jax.lax.sort_key_val(qperm, iota_v, dimension=-1)
        _, kperm_t = jax.lax.sort_key_val(kkeys, iota_v, dimension=-1)
        qsz = tile_sizes(vl, bq, QC, BH)
        ksz = tile_sizes(vl, kv_grain, KC, BH)
        # gather ONCE: these sorted arrays are also the kernel inputs
        # (step 4 below). The kv tile centroids read the K half of the
        # packed [K|V] gather — the old standalone K gather (774 MB/layer
        # at wan-14B geometry, tile_quantize) was not CSE-able against the
        # packed kernel gather and is gone.
        qp_video = core_permute.flat_row_gather(qf[:, :vl], qperm)
        kvp = core_permute.flat_row_gather(
            pack_kv(kf[:, :vl], vf[:, :vl]), kperm_t)
        qcent = tile_centroids(qp_video, qsz, bq, QC)
        kcent = tile_centroids(kvp[..., :D], ksz, kv_grain, KC)
    n_video_qc = QC

    # 2. dynamic map (cluster-pair top-p selection)
    dyn = identify_dynamic_map(
        qcent.reshape(B, H, QC, D),
        kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC),
        ksz.reshape(B, H, KC),
        cfg.top_p_kmeans,
        cfg.min_kc_ratio,
    )
    if cfg.force_density is not None:
        # BENCHMARK-ONLY override: with random weights the centroid attention
        # is flat and top-p selects ~90% of clusters — nothing like real
        # video statistics (the reference's density telemetry sits around
        # 10-30% at top_p=0.9). This pins the dynamic map to an exact
        # cluster fraction so system cost can be measured at a controlled,
        # representative density; every other stage (k-means, permutation,
        # run metadata, kernel) stays the real computation.
        import math as _math

        kcn = _math.ceil(cfg.force_density * KC)
        dyn = jnp.broadcast_to(
            (jnp.arange(KC) < kcn)[None, None, None, :], dyn.shape
        )
    density = density_calculation(dyn, qsz.reshape(B, H, QC), ksz.reshape(B, H, KC))
    new_state = dataclasses.replace(
        new_state, last_density=density.reshape(BH).astype(jnp.float32))

    # 3. KV relabel before run metadata (layout-only, output-invariant).
    # "auto": popularity for cluster mode (the contiguous popular prefix
    # coalesces); pc1 for tile mode (tiles live in the PC1-seriated order,
    # so a locality-preserving order merges adjacent selected tiles into
    # long runs — measured -10% vs popularity on wan-14B organic maps).
    # The CSR fast path (tile mode) skips relabeling: its chunk metadata is
    # offset-derived from fixed grain boundaries, so the KV order must stay
    # the tile_quantize order (the one partial tile has the largest id and
    # sorts last; text-last layouts get a grain-aligned padded layout below)
    # — and run coalescing buys the chunk walk nothing anyway.
    use_csr = tile_mode
    if use_csr:
        dyn_f = dyn.reshape(BH, QC, KC)
    else:
        rname = cfg.relabel
        if rname == "auto":
            rname = "pc1" if tile_mode else "popularity"
        relabel = pc1_relabel if rname == "pc1" else popularity_relabel
        dyn_f, klab, ksz, _ = relabel(dyn.reshape(BH, QC, KC), klab, ksz, kcent)

    if text_last:
        if use_csr:
            # tile mode: the static grain-aligned layout below never reads
            # the extended labels/sizes — extend the map only (the label
            # extension would otherwise keep dead sorts/labels alive)
            dyn_f = _extend_text_dyn(dyn_f, layout, QC, KC)
        else:
            dyn_f, qlab, qsz, klab, ksz = _extend_text_clusters(
                dyn_f, qlab, qsz, klab, ksz, layout)
        QC, KC = QC + 2, KC + 2

    # 4. permutations. Queries: block-aligned padded layout (each q block
    #    maps to exactly one q cluster). Keys/values: UNPADDED cluster-
    #    contiguous sort — no 128-alignment padding (which inflated KV 2.7x at
    #    the reference kc=1000 config); partial-block cluster boundaries are
    #    handled exactly by the run-list metadata windows.
    def pad_rows(seg, L):
        if L > seg.shape[1]:
            z = jnp.zeros((BH, 1, seg.shape[-1]), seg.dtype)
            pad = jnp.broadcast_to(z, (BH, L - seg.shape[1], seg.shape[-1]))
            return jnp.concatenate([seg, pad], axis=1)
        return seg

    if use_csr:
        # Tile fast path: tiles slice the label-sorted order, so the sort
        # already computed by tile_quantize IS the permutation — q blocks
        # map to tiles by identity, only the LAST video tile is partial
        # (padding sits at the region end), and a token's padded position
        # equals its sorted rank. The whole padded_permutation machinery
        # (cluster spans, one-hot block tables, scatter-free pos build) and
        # the second label sorts reduce to one gather per side: measured
        # q-side 102 -> ~35 ms and kv-side 63 -> ~35 ms per wan-14B layer
        # (probe_tile_breakdown.py round 5). qp_video/kvp were gathered in
        # the tile branch above (shared with the tile centroids).
        n_video_pad_q = n_video_qc * bq
        qp = pad_rows(qp_video, n_video_pad_q)
        pos = qrank  # video token -> padded position == sorted rank
        if text_last:
            # Grain-aligned CSR layout:
            #   q:  [video tiles | prompt | pad | fake | pad]  (block_q units)
            #   kv: [video tiles | pad to KC*grain | prompt | pad | fake | pad]
            # prompt/fake are unpermuted slices; padding slots never reach
            # softmax (per-sub-block valid counts below exclude them).
            pl_t = layout.prompt_length
            ul_t = layout.context_length - pl_t
            pl_qpad = -(-pl_t // bq) * bq
            ul_qpad = -(-ul_t // bq) * bq
            qp = jnp.concatenate(
                [qp, pad_rows(qf[:, vl : vl + pl_t], pl_qpad),
                 pad_rows(qf[:, vl + pl_t :], ul_qpad)], axis=1)
            text_pos = jnp.concatenate(
                [jnp.arange(pl_t, dtype=jnp.int32) + n_video_pad_q,
                 jnp.arange(ul_t, dtype=jnp.int32) + n_video_pad_q + pl_qpad])
            pos = jnp.concatenate(
                [pos, jnp.broadcast_to(text_pos[None], (BH, pl_t + ul_t))], axis=-1)

            n_video_kc = KC - 2
            n_video_pad = n_video_kc * kv_grain
            pl_pad = -(-pl_t // MD.SUB) * MD.SUB
            ul_pad = -(-ul_t // MD.SUB) * MD.SUB
            sk_pad = max(n_video_pad + pl_pad + ul_pad, bkv)
            kv = jnp.concatenate(
                [pad_rows(kvp, n_video_pad),
                 pad_rows(pack_kv(kf[:, vl : vl + pl_t], vf[:, vl : vl + pl_t]), pl_pad),
                 pad_rows(pack_kv(kf[:, vl + pl_t :], vf[:, vl + pl_t :]), ul_pad)],
                axis=1)
            kv = pad_rows(kv, sk_pad)
        else:
            sk_pad = max(-(-S // MD.SUB) * MD.SUB, bkv)
            kv = pad_rows(kvp, sk_pad)
    else:
        sq_pad = core_permute.padded_seq_len(S, QC, bq)
        qmaps = core_permute.padded_permutation(qlab, qsz, n_clusters=QC, block=bq, s_pad=sq_pad)
        qp = core_permute.gather_padded(qf, qmaps["src"])
        pos = qmaps["pos"]

        iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)
        _, kperm = jax.lax.sort_key_val(klab, iota, dimension=-1)
        kv = core_permute.flat_row_gather(pack_kv(kf, vf), kperm)
        sk_pad = max(-(-S // MD.SUB) * MD.SUB, bkv)
        if sk_pad != S:
            kv = jnp.pad(kv, ((0, 0), (0, sk_pad - S), (0, 0)))

    # 5. per-(head, q-cluster) kernel metadata, expanded to q blocks
    if use_csr:
        # CSR fast path: tile boundaries are fixed grain offsets of the
        # permuted KV array, so the tile dynamic map IS a block-sparse mask
        # over 128-token sub-blocks — expand tiles to sub-blocks (a static
        # repeat), let chunk_meta_jnp merge adjacent selected tiles into
        # block_kv chunk walks, and run the SAME bias-only kernel as
        # dense/SVG1 (block_sparse_attention_kv, mask kind "none": window
        # masking is one (8, bkv) broadcast add per chunk). Motivation
        # (measured, NOTES_ROUND4.md session 3): the runs kernel costs
        # ~2.3x the dense-class kernel per processed chunk at wan-14B
        # geometry — for uniform tiles the run-list generality buys nothing.
        import numpy as _np

        nsub = sk_pad // MD.SUB
        subs_per_tile = kv_grain // MD.SUB
        if text_last:
            # sub-block -> owning cluster map + per-sub-block valid counts,
            # both static trace-time numpy (the layout is fully static):
            # video tiles, then the prompt tile (id n_video_kc), then the
            # fake/padding tile (id n_video_kc + 1)
            s2c = _np.concatenate(
                [
                    _np.repeat(_np.arange(n_video_kc, dtype=_np.int32), subs_per_tile),
                    _np.full(pl_pad // MD.SUB, n_video_kc, _np.int32),
                    _np.full(ul_pad // MD.SUB, n_video_kc + 1, _np.int32),
                ]
            )
            counts_np = _np.concatenate(
                [
                    MD.kv_counts_for_seq(vl, n_video_pad),
                    MD.kv_counts_for_seq(pl_t, pl_pad),
                    MD.kv_counts_for_seq(ul_t, ul_pad),
                ],
                axis=-1,
            )
            if s2c.shape[0] < nsub:  # tiny-S case: sk_pad = block_kv floor
                extra = nsub - s2c.shape[0]
                s2c = _np.concatenate([s2c, _np.zeros(extra, _np.int32)])
                counts_np = _np.pad(counts_np, ((0, 0), (0, extra)))
            mask = jnp.take(dyn_f, jnp.asarray(s2c), axis=-1)
            # padding sub-blocks alias cluster 0 in s2c but their count is 0,
            # so chunk_meta never emits them
            cap_extra = -(-pl_pad // bkv) + -(-ul_pad // bkv) + 4
            kc_tiles = n_video_kc
        elif kv_grain == bkv:
            # uniform tiles, no text tail: each selected tile IS one chunk,
            # so the metadata is pure arithmetic over a tile-granularity
            # compaction sort (tile_meta_jnp — bit-identical to
            # chunk_meta_jnp on the expanded mask, ~3x cheaper to build)
            meta_c = MD.tile_meta_jnp(
                dyn_f, block_kv=bkv, n_tokens=S, nsub=nsub, cap=min(KC, nsub))
            counts_np = None
        else:
            mask = jnp.repeat(dyn_f, subs_per_tile, axis=-1)
            if mask.shape[-1] < nsub:  # tiny-S case: sk_pad = block_kv > S
                mask = jnp.pad(mask, ((0, 0), (0, 0), (0, nsub - mask.shape[-1])))
            else:
                mask = mask[..., :nsub]
            counts_np = MD.kv_counts_for_seq(S, sk_pad)
            cap_extra = 2
            kc_tiles = KC
        if counts_np is not None:
            counts = jnp.broadcast_to(
                jnp.asarray(counts_np, jnp.int32), (BH, nsub)
            )  # kv_counts_for_seq already carries a leading broadcast axis
            # worst case: a run of L consecutive selected tiles takes
            # ceil(L * grain / bkv) <= L * ceil(grain / bkv) chunks, so
            # kc_tiles * ceil(grain / bkv) bounds the video region of any row
            # (the factor is 1 whenever grain <= bkv; with grain > bkv each
            # tile alone needs several chunks — a KC+2 cap silently truncated
            # attention there). cap_extra covers the text tiles' own chunks
            # plus margin for partial tail sub-blocks breaking runs. nsub is
            # an absolute bound: chunks cover disjoint sub-block spans.
            cap_csr = min(nsub, kc_tiles * (-(-kv_grain // bkv)) + cap_extra)
            meta_c = MD.chunk_meta_jnp(mask, counts, block_kv=bkv, cap=cap_csr)
    else:
        # run-list metadata: variable cluster sizes need token-window runs
        zero = jnp.zeros_like(ksz[..., :1])
        kstarts = jnp.cumsum(jnp.concatenate([zero, ksz[..., :-1]], axis=-1), axis=-1)
        cap = min((cfg.max_runs or KC) + (2 if text_last else 0), KC)
        meta_c = MD.run_meta_jnp(dyn_f, kstarts, ksz, block_kv=bkv, cap=cap)
    if use_csr:
        # q blocks map to clusters by identity (video), then the two text
        # clusters at static offsets — the expansion is a static-index
        # gather (free) instead of the per-head dynamic take_along_axis
        if text_last:

            qb_np = _np.concatenate(
                [_np.arange(n_video_qc, dtype=_np.int32),
                 _np.full(pl_qpad // bq, n_video_qc, _np.int32),
                 _np.full(ul_qpad // bq, n_video_qc + 1, _np.int32)])
            valid_np = _np.concatenate(
                [_np.ones(n_video_qc, bool),
                 _np.arange(pl_qpad // bq) * bq < pl_t,
                 _np.arange(ul_qpad // bq) * bq < ul_t])
            meta = jnp.take(meta_c, jnp.asarray(qb_np), axis=1)
            meta0 = jnp.where(jnp.asarray(valid_np)[None, :], meta[..., 0], 0)
            meta = jnp.concatenate([meta0[..., None], meta[..., 1:]], axis=-1)
        else:
            meta = meta_c  # blocks ARE the video tiles, all non-empty
    else:
        qb_c = qmaps["block_to_cluster"]  # (BH, nQ)
        meta = jnp.take_along_axis(meta_c, qb_c[..., None], axis=1)  # (BH, nQ, L)
        qblk_valid = qmaps["kv_counts"] > 0  # (BH, nQ): block holds >=1 real token
        meta = meta.at[..., 0].set(jnp.where(qblk_valid, meta[..., 0], 0))

    # 6. kernel + inverse permutation
    if use_csr:
        out_pad = block_sparse_attention_kv(
            qp, kv, meta, block_q=bq, block_kv=bkv, qsplit=cfg.run_qsplit,
            interpret=interpret,
        )
    else:
        out_pad = block_sparse_attention_runs(
            qp, kv, meta, block_q=bq, block_kv=bkv, qsplit=cfg.run_qsplit,
            interpret=interpret,
        )
    out = core_permute.ungather_padded(out_pad, pos).reshape(B, H, S, D)

    if with_density:
        return out, new_state, density
    return out, new_state


def sap_attention(
    q,
    k,
    v,
    timestep,
    state: SAPState,
    rng,
    *,
    layout: VideoLayout,
    cfg: SAPConfig,
    warmup: WarmupSchedule,
    layer_idx: int,
    dense_fn,
    interpret=None,
):
    """Full SAP semantics with warm-up and zero_step_kmeans_init.

    dense_fn(q, k, v) -> out is the dense fallback (any backend).
    Matches attention_core_logic (wan/attention.py:499-527).
    """

    def dense_branch(args):
        q, k, v, state, rng = args
        if cfg.zero_step_kmeans_init:
            vid = layout.video_length
            B, H, S, D = q.shape
            qv = q[:, :, :vid].reshape(B * H, vid, D)
            kv_ = k[:, :, :vid].reshape(B * H, vid, D)
            _, _, state = sap_cluster(qv, kv_, state, cfg, rng)
        return dense_fn(q, k, v), state

    def sparse_branch(args):
        q, k, v, state, rng = args
        return sap_sparse_attention(
            q, k, v, state, rng, layout=layout, cfg=cfg, interpret=interpret
        )

    args = (q, k, v, state, rng)
    if layer_idx < warmup.first_layers:
        return dense_branch(args)
    return jax.lax.cond(timestep > warmup.first_times, dense_branch, sparse_branch, args)
