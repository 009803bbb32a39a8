"""Ring (context-parallel) x SAP/SVG2: semantic-aware permutation with the
sequence sharded over a mesh axis.

The reference never composes SAP with sequence parallelism (SAP is
single-GPU, cfg=1 — svg/models/wan/attention.py:502; its USP path
xdit_context_parallel.py only wraps dense attention).  SURVEY section 7
flags the composition as the hard case because SAP's cluster-contiguous
permutation is a GLOBAL argsort.  TPU design that avoids the global sort
while staying numerically exact w.r.t. the same cluster selection:

- k-means is EXACTLY global Lloyd without gathering tokens: assignment is
  token-local given centroids; the centroid update psums per-cluster
  sums/counts over the mesh axis (core/kmeans.batch_kmeans(axis_name=...)).
  Cold init draws global token indices (init_centroids_sharded).
- The dynamic map (cluster-pair top-p) uses only centroids + GLOBAL cluster
  sizes, both replicated after the psum -> identical on every shard.
- Permutation is SHARD-LOCAL: each shard sorts its own tokens
  cluster-contiguously.  A selected (q-cluster, k-cluster) pair's KV tokens
  are then distributed across shards, each shard holding one contiguous run.
- Attention runs as a ring: the packed permuted KV shard rotates with
  ppermute; every rotation runs the runs-mode kernel with metadata built
  from THAT shard's cluster offsets (cluster sizes per shard are
  all-gathered — kc ints per shard, not tokens).  Partial softmax results
  combine with (m, l) stats, so the output equals single-device SAP on the
  same labels/dynamic map up to fp reduction order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sparse_videogen_tpu.config import SAPConfig, TextPosition, VideoLayout
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map
from sparse_videogen_tpu.core.kmeans import (
    batch_kmeans,
    init_centroids_sharded,
    label_counts,
)
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_runs, pack_kv
from sparse_videogen_tpu.sparse.svg2 import SAPState, popularity_relabel


def sap_ring_attention(
    q,  # (B, H, S, D) — S divisible by n * block_q-friendly shard size
    k,
    v,
    state: SAPState,
    rng,
    mesh,
    *,
    axis: str = "sp",
    head_axis: str | None = None,
    layout: VideoLayout,
    cfg: SAPConfig,
    interpret: bool | None = None,
):
    """SAP sparse attention with the token axis sharded over `axis`.

    head_axis: additionally shard heads over a second mesh axis (USP hybrid,
    Ulysses x ring). Clustering, dynamic maps, and permutations are
    head-local, so the head split needs no extra communication; the k-means
    psums stay on the ring axis only.

    Returns (out (B, H, S, D) sharded like q, new SAPState (replicated over
    the ring axis, head-sharded over head_axis)).
    Text-last layouts are not supported here (the reference limits SAP+SP
    the same way — it never combines them at all).
    """
    assert not (layout.text_position == TextPosition.LAST and layout.context_length > 0), (
        "ring SAP supports video-only self-attention layouts"
    )
    assert cfg.block_mode == "cluster", (
        "ring SAP implements cluster-granularity selection only; tile mode "
        "is a single-chip layout optimization (shard-local tile offsets "
        "would diverge across the ring) — use block_mode='cluster' under "
        "sequence parallelism"
    )
    n = mesh.shape[axis]
    B, H, S, D = q.shape
    Sl = S // n
    QC, KC = cfg.num_q_centroids, cfg.num_k_centroids
    bq, bkv = cfg.block_q, cfg.block_kv
    # Sl need not be 128-aligned: the q side is padded per-cluster by
    # padded_permutation (pad rows excluded via empty run windows) and the
    # KV shard is padded to sk_pad below (pad tokens excluded because run
    # metadata is built from valid cluster sizes only). Only the shard split
    # itself must be exact.
    assert S % n == 0, (S, n)

    def local_fn(q, k, v, qc_state, kc_state, inited):
        my = jax.lax.axis_index(axis)
        Bl, Hl = q.shape[0], q.shape[1]
        BH = Bl * Hl
        # centroid carries arrive (B, H_local, C, D); flatten to match q/k
        qc_state = qc_state.reshape(BH, *qc_state.shape[2:])
        kc_state = kc_state.reshape(BH, *kc_state.shape[2:])
        qf = q.reshape(BH, Sl, D)
        kf = k.reshape(BH, Sl, D)
        vf = v.reshape(BH, Sl, D)
        rq, rk = jax.random.split(rng)

        def dist_kmeans(x, nc, state_c, r):
            def cold(_):
                init = init_centroids_sharded(x, nc, r, axis, n)
                return batch_kmeans(
                    x, nc, cfg.kmeans_iter_init, init,
                    metric=cfg.kmeans_metric, axis_name=axis,
                )

            def warm(_):
                return batch_kmeans(
                    x, nc, cfg.kmeans_iter_step, state_c.astype(x.dtype),
                    metric=cfg.kmeans_metric, axis_name=axis,
                )

            return jax.lax.cond(inited, warm, cold, None)

        # 1. distributed k-means: local labels, global centroids/sizes
        qlab, qcent, qsz_g = dist_kmeans(qf, QC, qc_state, rq)
        klab, kcent, ksz_g = dist_kmeans(kf, KC, kc_state, rk)

        # 2. dynamic map from replicated centroids + global sizes -> identical
        #    on every shard
        dyn = identify_dynamic_map(
            qcent.reshape(Bl, Hl, QC, D),
            kcent.reshape(Bl, Hl, KC, D),
            qsz_g.reshape(Bl, Hl, QC),
            ksz_g.reshape(Bl, Hl, KC),
            cfg.top_p_kmeans,
            cfg.min_kc_ratio,
        )

        # 3. popularity relabel (deterministic: same dyn everywhere)
        dyn_f, klab, _, _ = popularity_relabel(dyn.reshape(BH, QC, KC), klab, ksz_g, kcent)

        # 4. shard-local permutations
        qsz_l = label_counts(qlab, QC)
        sq_pad = core_permute.padded_seq_len(Sl, QC, bq)
        qmaps = core_permute.padded_permutation(qlab, qsz_l, n_clusters=QC, block=bq, s_pad=sq_pad)
        qp = core_permute.gather_padded(qf, qmaps["src"])

        iota = jax.lax.broadcasted_iota(jnp.int32, (BH, Sl), 1)
        _, kperm = jax.lax.sort_key_val(klab, iota, dimension=-1)
        kv = jnp.take_along_axis(pack_kv(kf, vf), kperm[..., None], axis=1)
        sk_pad = max(-(-Sl // MD.SUB) * MD.SUB, bkv)
        if sk_pad != Sl:
            kv = jnp.pad(kv, ((0, 0), (0, sk_pad - Sl), (0, 0)))

        # 5. run metadata per KV SHARD: cluster sizes per shard are tiny —
        #    all-gather them, build run lists against each shard's offsets
        ksz_l = label_counts(klab, KC)
        ksz_all = jax.lax.all_gather(ksz_l, axis)  # (n, BH, KC)
        cap = min(cfg.max_runs or KC, KC)
        qb_c = qmaps["block_to_cluster"]  # (BH, nQ_loc)
        qblk_valid = qmaps["kv_counts"] > 0
        metas = []
        for j in range(n):
            szj = ksz_all[j]
            zero = jnp.zeros_like(szj[..., :1])
            stj = jnp.cumsum(jnp.concatenate([zero, szj[..., :-1]], axis=-1), axis=-1)
            mc = MD.run_meta_jnp(dyn_f, stj, szj, block_kv=bkv, cap=cap)
            mj = jnp.take_along_axis(mc, qb_c[..., None], axis=1)
            mj = mj.at[..., 0].set(jnp.where(qblk_valid, mj[..., 0], 0))
            metas.append(mj)
        meta_all = jnp.stack(metas)  # (n, BH, nQ_loc, L)

        # 6. ring over KV shards with (m, l) stats combination
        nQp = qp.shape[1]
        acc = jnp.zeros((BH, nQp, D), jnp.float32)
        m = jnp.full((BH, nQp), -jnp.inf, jnp.float32)
        l = jnp.zeros((BH, nQp), jnp.float32)
        cur = kv
        for r in range(n):
            src = (my - r) % n
            meta = jax.lax.dynamic_index_in_dim(meta_all, src, axis=0, keepdims=False)
            o_r, m_r, l_r = block_sparse_attention_runs(
                qp, cur, meta,
                block_q=bq, block_kv=bkv, interpret=interpret, return_stats=True,
            )
            m_new = jnp.maximum(m, m_r)
            w_old = l * jnp.exp(m - m_new)
            w_r = l_r * jnp.exp(m_r - m_new)
            acc = acc * jnp.exp(m - m_new)[..., None] + o_r.astype(jnp.float32) * w_r[..., None]
            l = w_old + w_r
            m = m_new
            if r < n - 1:
                cur = jax.lax.ppermute(cur, axis, perm=[(t, (t + 1) % n) for t in range(n)])

        out_pad = (acc / jnp.maximum(l, 1e-20)[..., None]).astype(q.dtype)
        out = core_permute.ungather_padded(out_pad, qmaps["pos"]).reshape(Bl, Hl, Sl, D)
        return (
            out,
            qcent.astype(state.q_centroids.dtype).reshape(Bl, Hl, *qcent.shape[1:]),
            kcent.astype(state.k_centroids.dtype).reshape(Bl, Hl, *kcent.shape[1:]),
        )

    from jax import shard_map

    qkv_spec = P(None, head_axis, axis, None)
    cent_spec = P(None, head_axis)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(qkv_spec,) * 3 + (cent_spec, cent_spec, P()),
        out_specs=(qkv_spec, cent_spec, cent_spec),
        check_vma=False,
    )
    qc_bh = state.q_centroids.reshape(B, H, *state.q_centroids.shape[1:])
    kc_bh = state.k_centroids.reshape(B, H, *state.k_centroids.shape[1:])
    out, qcent, kcent = fn(q, k, v, qc_bh, kc_bh, state.initialized)
    return out, SAPState(
        qcent.reshape(B * H, *qcent.shape[2:]),
        kcent.reshape(B * H, *kcent.shape[2:]),
        jnp.ones((), bool),
        state.last_density,
    )
