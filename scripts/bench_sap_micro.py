"""Micro-breakdown of SAP overhead internals (720p config, real TPU)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, popularity_relabel, sap_cluster
from sparse_videogen_tpu.utils.benchmark import measure

B, H, S, D = 1, 40, 75600, 128
cfg = SAPConfig(num_q_centroids=300, num_k_centroids=1000, max_runs=256)
BH, QC, KC, bq, bkv = B * H, cfg.num_q_centroids, cfg.num_k_centroids, cfg.block_q, cfg.block_kv


@jax.jit
def gen(key):
    ks = jax.random.split(key, 3)
    out = []
    for i in range(2):
        steps = jax.random.normal(ks[i], (B, H, S, D), jnp.float32)
        base = jnp.cumsum(steps * 0.05, axis=2)
        out.append((base + jax.random.normal(ks[i], (B, H, S, D)) * 0.5).astype(jnp.bfloat16))
    return tuple(out)


q, k = gen(jax.random.PRNGKey(0))
qf, kf = (x.reshape(BH, S, D) for x in (q, k))
rng = jax.random.PRNGKey(1)
state = init_sap_state(BH, D, cfg)


@jax.jit
def cluster(qf, kf, state, rng):
    return sap_cluster(qf, kf, state, cfg, rng)


(_, _, _), (_, _, _), warm = cluster(qf, kf, state, rng)
jax.block_until_ready(warm)
(qlab, qcent, qsz), (klab, kcent, ksz), _ = cluster(qf, kf, warm, rng)
jax.block_until_ready(qlab)

# kmeans blk_n sweep
from sparse_videogen_tpu.ops.kmeans_pallas import kmeans_assign_update

for blk_n in (512, 1024, 2048):
    f = jax.jit(lambda x, c: kmeans_assign_update(x, c, blk_n=blk_n)[1])
    try:
        t = measure(lambda: f(kf, warm.k_centroids.astype(kf.dtype)), iters=3, warmup=1)
        print(f"[kmeans assign k=1000 blk_n={blk_n}] {t*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"[kmeans assign blk_n={blk_n}] FAIL {type(e).__name__}", flush=True)

# dynamic map (after scatter-free fix)
@jax.jit
def dmap(qcent, kcent, qsz, ksz):
    return identify_dynamic_map(
        qcent.reshape(B, H, QC, D), kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC), ksz.reshape(B, H, KC), cfg.top_p_kmeans, cfg.min_kc_ratio)


dyn = dmap(qcent, kcent, qsz, ksz)
t = measure(lambda: dmap(qcent, kcent, qsz, ksz), iters=5, warmup=1)
print(f"[dmap scatter-free]  {t*1e3:7.1f} ms", flush=True)

dyn_f, klab2, ksz2, _ = jax.jit(
    lambda d, kl, ks, kc: popularity_relabel(d.reshape(BH, QC, KC), kl, ks, kc)
)(dyn, klab, ksz, kcent)
jax.block_until_ready(dyn_f)

# --- q side internals ---
sq_pad = core_permute.padded_seq_len(S, QC, bq)


@jax.jit
def qmaps_only(qlab, qsz):
    return core_permute.padded_permutation(qlab, qsz, n_clusters=QC, block=bq, s_pad=sq_pad)


qmaps = qmaps_only(qlab, qsz)
t = measure(lambda: qmaps_only(qlab, qsz)["src"], iters=3, warmup=1)
print(f"[q padded_perm maps] {t*1e3:7.1f} ms", flush=True)


@jax.jit
def qgather(qf, src):
    return core_permute.gather_padded(qf, src)


t = measure(lambda: qgather(qf, qmaps["src"]), iters=3, warmup=1)
print(f"[q row gather {sq_pad}] {t*1e3:6.1f} ms", flush=True)

# --- meta internals ---
zero = jnp.zeros_like(ksz2[..., :1])
kstarts = jnp.cumsum(jnp.concatenate([zero, ksz2[..., :-1]], axis=-1), axis=-1)
cap = cfg.max_runs


@jax.jit
def build_only(dyn_f, kstarts, ksz2):
    return MD.run_meta_jnp(dyn_f, kstarts, ksz2, block_kv=bkv, cap=cap)


meta_c = build_only(dyn_f, kstarts, ksz2)
t = measure(lambda: build_only(dyn_f, kstarts, ksz2), iters=3, warmup=1)
print(f"[meta build (QC rows)] {t*1e3:5.1f} ms", flush=True)


@jax.jit
def expand_only(meta_c, qmaps):
    qb_c = qmaps["block_to_cluster"]
    meta = jnp.take_along_axis(meta_c, qb_c[..., None], axis=1)
    return meta.at[..., 0].set(jnp.where(qmaps["kv_counts"] > 0, meta[..., 0], 0))


meta = expand_only(meta_c, qmaps)
t = measure(lambda: expand_only(meta_c, qmaps), iters=3, warmup=1)
print(f"[meta expand]        {t*1e3:7.1f} ms", flush=True)
