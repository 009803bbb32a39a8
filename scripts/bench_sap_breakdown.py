"""Per-stage SAP overhead breakdown on the real TPU (720p config)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, VideoLayout
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_runs, pack_kv
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, popularity_relabel, sap_cluster
from sparse_videogen_tpu.utils.benchmark import measure

scale = sys.argv[1] if len(sys.argv) > 1 else "720p"
if scale == "720p":
    B, H, S, D = 1, 40, 75600, 128
    cfg = SAPConfig(num_q_centroids=300, num_k_centroids=1000, max_runs=256)
elif scale == "wan13b":
    # the exact bench_wan_e2e SAP config: wan 1.3B heads, reference 720p SAP
    # flags incl. min_kc_ratio=0.10 and default (exact) max_runs
    B, H, S, D = 1, 12, 75600, 128
    cfg = SAPConfig(num_q_centroids=300, num_k_centroids=1000, top_p_kmeans=0.9,
                    min_kc_ratio=0.10, kmeans_iter_step=2)
else:
    B, H, S, D = 1, 12, 32760, 128
    cfg = SAPConfig(num_q_centroids=50, num_k_centroids=200, max_runs=128)
BH, QC, KC, bq, bkv = B * H, cfg.num_q_centroids, cfg.num_k_centroids, cfg.block_q, cfg.block_kv


@jax.jit
def gen(key):
    ks = jax.random.split(key, 3)
    out = []
    for i in range(3):
        steps = jax.random.normal(ks[i], (B, H, S, D), jnp.float32)
        base = jnp.cumsum(steps * 0.05, axis=2)
        out.append((base + jax.random.normal(ks[i], (B, H, S, D)) * 0.5).astype(jnp.bfloat16))
    return tuple(out)


q, k, v = gen(jax.random.PRNGKey(0))
qf, kf, vf = (x.reshape(BH, S, D) for x in (q, k, v))
rng = jax.random.PRNGKey(1)
state = init_sap_state(BH, D, cfg)

# warm state first
@jax.jit
def cluster(qf, kf, state, rng):
    return sap_cluster(qf, kf, state, cfg, rng)

(_, _, _), (_, _, _), warm = cluster(qf, kf, state, rng)
jax.block_until_ready(warm)

t = measure(lambda: cluster(qf, kf, warm, rng)[2].q_centroids, iters=3, warmup=1)
print(f"[1 kmeans warm]      {t*1e3:7.1f} ms", flush=True)

(qlab, qcent, qsz), (klab, kcent, ksz), _ = cluster(qf, kf, warm, rng)
jax.block_until_ready(qlab)

@jax.jit
def dmap(qcent, kcent, qsz, ksz):
    return identify_dynamic_map(
        qcent.reshape(B, H, QC, D), kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC), ksz.reshape(B, H, KC), cfg.top_p_kmeans, cfg.min_kc_ratio)

dyn = dmap(qcent, kcent, qsz, ksz)
t = measure(lambda: dmap(qcent, kcent, qsz, ksz), iters=3, warmup=1)
print(f"[2 dynamic map]      {t*1e3:7.1f} ms", flush=True)

@jax.jit
def relab(dyn, klab, ksz, kcent):
    return popularity_relabel(dyn.reshape(BH, QC, KC), klab, ksz, kcent)

dyn_f, klab2, ksz2, _ = relab(dyn, klab, ksz, kcent)
t = measure(lambda: relab(dyn, klab, ksz, kcent)[0], iters=3, warmup=1)
print(f"[3 relabel]          {t*1e3:7.1f} ms", flush=True)

sq_pad = core_permute.padded_seq_len(S, QC, bq)

@jax.jit
def qside(qlab, qsz, qf):
    qmaps = core_permute.padded_permutation(qlab, qsz, n_clusters=QC, block=bq, s_pad=sq_pad)
    qp = core_permute.gather_padded(qf, qmaps["src"])
    return qmaps, qp

qmaps, qp = qside(qlab, qsz, qf)
t = measure(lambda: qside(qlab, qsz, qf)[1], iters=3, warmup=1)
print(f"[4 q perm+gather]    {t*1e3:7.1f} ms  (sq_pad={sq_pad})", flush=True)

sk_pad = max(-(-S // MD.SUB) * MD.SUB, bkv)

@jax.jit
def kvside(klab2, kf, vf):
    iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)
    _, kperm = jax.lax.sort_key_val(klab2, iota, dimension=-1)
    kv = jnp.take_along_axis(pack_kv(kf, vf), kperm[..., None], axis=1)
    if sk_pad != S:
        kv = jnp.pad(kv, ((0, 0), (0, sk_pad - S), (0, 0)))
    return kv

kv = kvside(klab2, kf, vf)
t = measure(lambda: kvside(klab2, kf, vf), iters=3, warmup=1)
print(f"[5 kv sort+gather]   {t*1e3:7.1f} ms", flush=True)

@jax.jit
def sortonly(klab2):
    iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)
    return jax.lax.sort_key_val(klab2, iota, dimension=-1)[1]

t = measure(lambda: sortonly(klab2), iters=3, warmup=1)
print(f"[5a   kv sort only]  {t*1e3:7.1f} ms", flush=True)

kperm = sortonly(klab2)

@jax.jit
def gatheronly(kperm, kf, vf):
    return jnp.take_along_axis(pack_kv(kf, vf), kperm[..., None], axis=1)

t = measure(lambda: gatheronly(kperm, kf, vf), iters=3, warmup=1)
print(f"[5b   kv gather only]{t*1e3:7.1f} ms", flush=True)

cap = cfg.max_runs or KC

@jax.jit
def metaside(dyn_f, ksz2, qmaps):
    zero = jnp.zeros_like(ksz2[..., :1])
    kstarts = jnp.cumsum(jnp.concatenate([zero, ksz2[..., :-1]], axis=-1), axis=-1)
    meta_c = MD.run_meta_jnp(dyn_f, kstarts, ksz2, block_kv=bkv, cap=cap)
    qb_c = qmaps["block_to_cluster"]
    meta = jnp.take_along_axis(meta_c, qb_c[..., None], axis=1)
    qblk_valid = qmaps["kv_counts"] > 0
    return meta.at[..., 0].set(jnp.where(qblk_valid, meta[..., 0], 0))

meta = metaside(dyn_f, ksz2, qmaps)
t = measure(lambda: metaside(dyn_f, ksz2, qmaps), iters=3, warmup=1)
print(f"[6 run meta+expand]  {t*1e3:7.1f} ms", flush=True)

for qs in (1, 2, 4):
    kern = jax.jit(lambda qp, kv, meta, qs=qs: block_sparse_attention_runs(
        qp, kv, meta, block_q=bq, block_kv=bkv, qsplit=qs))
    out_pad = kern(qp, kv, meta)
    t = measure(lambda: kern(qp, kv, meta), iters=3, warmup=1)
    print(f"[7 kernel qsplit={qs}] {t*1e3:7.1f} ms", flush=True)

@jax.jit
def inv(out_pad, qmaps):
    return core_permute.ungather_padded(out_pad, qmaps["pos"])

t = measure(lambda: inv(out_pad, qmaps), iters=3, warmup=1)
print(f"[8 inverse gather]   {t*1e3:7.1f} ms", flush=True)
