"""Per-stage breakdown of tile-mode SAP at wan-14B geometry (real TPU).

The full wan-14B bench (round 5) measures warm SAP slope 3.60 s/unit vs an
analytic floor of ~0.54 (int8 linears) + ~1.2 (attention at measured
density 0.33, dense-kernel efficiency) — ~1.9 s/unit unexplained. This
probe times each SAP stage in isolation at one layer's geometry (B*H=40,
S=75,600, D=128) with organic-like clustered inputs, so the gap can be
attributed (sorts? gathers? metadata? kernel?).

Stages mirror sparse/svg2.sap_sparse_attention in tile mode AS OF the
round-5 baseline. NOTE: the permutation-reuse refactor that this probe
motivated (tile sort = token permutation) removed the padded_permutation
and kv-sort stages from the production path — the "q padded_perm" and
"kv sort" lines here time the OLD standalone constructions for comparison;
the "full sap_sparse_attention" line is the live path (measured 391 ->
306 ms at d=0.095 across the refactor).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SAPConfig, VideoLayout
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.sparse import svg2
from sparse_videogen_tpu.utils.benchmark import measure_fenced

B, H, S, D = 1, 40, 75600, 128
BH = B * H
cfg = SAPConfig(num_q_centroids=300, num_k_centroids=125, top_p_kmeans=0.9,
                min_kc_ratio=0.10, kmeans_iter_init=8, kmeans_iter_step=2,
                block_q=512, block_kv=512, block_mode="tile")
layout = VideoLayout(num_frames=21, frame_size=3600)
bq = bkv = 512

rng = np.random.default_rng(0)
centers = rng.standard_normal((12, D)) * 2.5
assign = rng.integers(0, 12, S)
base = centers[assign] + 0.35 * rng.standard_normal((S, D))
q = jnp.asarray(np.broadcast_to(base, (BH, S, D)).copy(), jnp.bfloat16)
k = q
v = jnp.asarray(rng.standard_normal((BH, S, D)), jnp.bfloat16)

state = svg2.init_sap_state(BH, D, cfg)
key = jax.random.PRNGKey(0)

# warm the state once
(_, _, _), (_, _, _), state = svg2.sap_cluster(q, k, state, cfg, key)
jax.block_until_ready(state.q_centroids)


def t(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ms = measure_fenced(lambda: f(*args), iters=3, warmup=1) * 1e3
    print(f"{name:28s} {ms:8.1f} ms", flush=True)
    return out


# 1. warm k-means (2 iters, q and k)
def kmeans_stage(q, k, state, key):
    return svg2.sap_cluster(q, k, state, cfg, key)


(qlab, qcent, qsz), (klab, kcent, ksz), _ = t("kmeans_warm(q+k)", kmeans_stage, q, k, state, key)

# 2. seriation + tile quantize (both sides)
QC = -(-S // bq)
KC = -(-S // bkv)


def tiles_stage(q, k, qlab, qcent, qsz, klab, kcent, ksz):
    ql = svg2.seriate_labels(qlab, qcent, qsz, cfg.num_q_centroids)
    kl = svg2.seriate_labels(klab, kcent, ksz, cfg.num_k_centroids)
    a = svg2.tile_quantize(q, ql, bq, QC)
    b = svg2.tile_quantize(k, kl, bkv, KC)
    return a, b


(qlab_t, qsz_t, qcent_t, qperm_t, qrank_t), (klab_t, ksz_t, kcent_t, kperm_t, _) = t(
    "seriate+tile_quantize", tiles_stage, q, k, qlab, qcent, qsz, klab, kcent, ksz)


# 3. dynamic map
def dyn_stage(qc, kc, qs, ks_):
    return identify_dynamic_map(
        qc.reshape(B, H, QC, D), kc.reshape(B, H, KC, D),
        qs.reshape(B, H, QC), ks_.reshape(B, H, KC),
        cfg.top_p_kmeans, cfg.min_kc_ratio)


dyn = t("identify_dynamic_map", dyn_stage, qcent_t, kcent_t, qsz_t, ksz_t)
print(f"    density: {float(jnp.mean(jnp.sum(jnp.where(dyn, 1.0, 0.0), (2, 3)) / (QC * KC))):.3f}")

# 4. q permutation maps + gather
sq_pad = QC * bq


def qperm_stage(qlab_t, qsz_t, q):
    qmaps = core_permute.padded_permutation(qlab_t, qsz_t, n_clusters=QC, block=bq, s_pad=sq_pad)
    qp = core_permute.gather_padded(q, qmaps["src"])
    return qmaps, qp


qmaps, qp = t("q padded_perm + gather", qperm_stage, qlab_t, qsz_t, q)


# 5. KV sort + gather + pad
def kv_stage(klab_t, k, v):
    iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)
    _, kperm = jax.lax.sort_key_val(klab_t, iota, dimension=-1)
    kv = core_permute.flat_row_gather(pack_kv(k, v), kperm)
    sk_pad = max(-(-S // MD.SUB) * MD.SUB, bkv)
    if sk_pad != S:
        kv = jnp.pad(kv, ((0, 0), (0, sk_pad - S), (0, 0)))
    return kv


kv = t("kv sort + gather", kv_stage, klab_t, k, v)
sk_pad = kv.shape[1]

# 6. chunk metadata
nsub = sk_pad // MD.SUB


def meta_stage(dyn, qmaps):
    dyn_f = dyn.reshape(BH, QC, KC)
    mask = jnp.repeat(dyn_f, bkv // MD.SUB, axis=-1)[..., :nsub]
    counts = jnp.broadcast_to(jnp.asarray(MD.kv_counts_for_seq(S, sk_pad), jnp.int32), (BH, nsub))
    meta_c = MD.chunk_meta_jnp(mask, counts, block_kv=bkv, cap=min(nsub, KC + 2))
    meta = jnp.take_along_axis(meta_c, qmaps["block_to_cluster"][..., None], axis=1)
    valid = qmaps["kv_counts"] > 0
    return meta.at[..., 0].set(jnp.where(valid, meta[..., 0], 0))


meta = t("chunk_meta + expand", meta_stage, dyn, qmaps)


# 7. kernel
def kern_stage(qp, kv, meta):
    return block_sparse_attention_kv(qp, kv, meta, block_q=bq, block_kv=bkv)


out_pad = t("csr kernel", kern_stage, qp, kv, meta)


# 8. inverse gather
def inv_stage(out_pad, qmaps):
    return core_permute.ungather_padded(out_pad, qmaps["pos"])


t("inverse gather", inv_stage, out_pad, qmaps)


# whole thing fused (as the model runs it) for cross-check
def full(q, k, v, state, key):
    return svg2.sap_sparse_attention(q.reshape(B, H, S, D), k.reshape(B, H, S, D),
                                     v.reshape(B, H, S, D), state, key,
                                     layout=layout, cfg=cfg)


t("full sap_sparse_attention", full, q, k, v, state, key)

# reference points: dense-metadata kernel at same (Sq, Skv) and density 1
meta_d = jnp.asarray(MD.dense_meta(sq_pad, sk_pad, block_q=bq, block_kv=bkv))
t("kernel dense(d=1.0) ref", kern_stage, qp, kv, meta_d)
