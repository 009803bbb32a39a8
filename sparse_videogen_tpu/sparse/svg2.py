"""SVG2 / SAP driver: k-means -> dynamic map -> block-aligned permutation ->
dynamic block-sparse attention -> inverse permutation.

Reference flow: WanAttn_SAPAttn_Processor.attention_core_logic
(/root/reference/svg/models/wan/attention.py:499-559) with
semantic_aware_permutation (:447-476).

TPU re-design decisions (vs the reference's CUDA/FlashInfer path):
- Variable cluster blocks become 128-aligned padded spans
  (core/permute.padded_permutation); per-chunk [lo,hi) windows mask the
  padding exactly, so the softmax equals the variable-block formulation
  bit-for-bit.
- The per-step FlashInfer plan() disappears: metadata is traced integer math
  (ops/metadata.chunk_meta_jnp).
- KV clusters are relabeled in descending keep-popularity order before
  permutation, which coalesces each row's visited blocks into longer runs so
  the kernel can use 512-token DMA chunks (a pure layout heuristic — the
  attention output is unchanged).
- The k-means warm-start state is an explicit functional carry (SAPState)
  threaded through the denoising loop, instead of mutated processor
  attributes (reference attention.py:406-408,427-429).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.core.dynamic_map import density_calculation, identify_dynamic_map
from sparse_videogen_tpu.core.kmeans import batch_kmeans, init_centroids
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SAPState:
    """k-means warm-start carry (one per attention layer)."""

    q_centroids: jnp.ndarray  # (B*H, QC, D)
    k_centroids: jnp.ndarray  # (B*H, KC, D)
    initialized: jnp.ndarray  # () bool


def init_sap_state(batch_heads: int, head_dim: int, cfg: SAPConfig, dtype=jnp.bfloat16) -> SAPState:
    return SAPState(
        q_centroids=jnp.zeros((batch_heads, cfg.num_q_centroids, head_dim), dtype),
        k_centroids=jnp.zeros((batch_heads, cfg.num_k_centroids, head_dim), dtype),
        initialized=jnp.zeros((), bool),
    )


def _kmeans_with_warmstart(x, n_clusters, state_centroids, initialized, cfg, rng):
    """cond(initialized): warm-start few iters; else: random init, many iters."""

    def cold(_):
        init = init_centroids(x, n_clusters, rng)
        return batch_kmeans(x, n_clusters, cfg.kmeans_iter_init, init)

    def warm(_):
        return batch_kmeans(x, n_clusters, cfg.kmeans_iter_step, state_centroids.astype(x.dtype))

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
    )
    return (qlab, qcent, qsz), (klab, kcent, ksz), new_state


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

    qf = q.reshape(BH, S, D)
    kf = k.reshape(BH, S, D)
    vf = v.reshape(BH, S, D)

    # 1. k-means (warm-startable)
    (qlab, qcent, qsz), (klab, kcent, ksz), new_state = sap_cluster(qf, kf, state, cfg, rng)

    # 2. dynamic map (cluster-pair top-p selection)
    dyn = identify_dynamic_map(
        qcent.reshape(B, H, QC, D),
        kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC),
        ksz.reshape(B, H, KC),
        cfg.top_p_kmeans,
        cfg.min_kc_ratio,
    )
    density = density_calculation(dyn, qsz.reshape(B, H, QC), ksz.reshape(B, H, KC))

    # 3. popularity relabel (coalesces kv runs; output-invariant)
    dyn_f, klab, ksz, _ = popularity_relabel(dyn.reshape(BH, QC, KC), klab, ksz, kcent)

    # 4. block-aligned padded permutations
    sq_pad = core_permute.padded_seq_len(S, QC, bq)
    sk_pad = max(core_permute.padded_seq_len(S, KC, MD.SUB), bkv)
    qmaps = core_permute.padded_permutation(qlab, qsz, n_clusters=QC, block=bq, s_pad=sq_pad)
    kmaps = core_permute.padded_permutation(klab, ksz, n_clusters=KC, block=MD.SUB, s_pad=sk_pad)

    qp = core_permute.gather_padded(qf, qmaps["src"])
    # pack K|V first so the permutation costs ONE row-gather, not two
    kv = core_permute.gather_padded(pack_kv(kf, vf), kmaps["src"])

    # 5. block mask -> chunked CSR metadata
    nQ = sq_pad // bq
    nsub = sk_pad // MD.SUB
    qb_c = qmaps["block_to_cluster"]  # (BH, nQ)
    kb_c = kmaps["block_to_cluster"]  # (BH, nsub)
    mask = jnp.take_along_axis(dyn_f, qb_c[..., None], axis=1)  # (BH, nQ, KC)
    mask = jnp.take_along_axis(mask, kb_c[:, None, :], axis=2)  # (BH, nQ, nsub)
    mask = mask & (qmaps["kv_counts"] > 0)[..., None]  # kill padding q rows
    meta = MD.chunk_meta_jnp(mask, kmaps["kv_counts"], block_kv=bkv, cap=nsub)

    # 6. kernel + inverse permutation
    out_pad = block_sparse_attention_kv(
        qp, kv, meta, block_q=bq, block_kv=bkv, interpret=interpret
    )
    out = core_permute.ungather_padded(out_pad, qmaps["pos"]).reshape(B, H, S, D)

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
