"""Old runs kernel (in-loop scalar walk) vs expand kernel (scalar-prologue
SMEM chunk table + chunked main loops) at the production SAP config.

Usage: python scripts/bench_runs_expand.py [density]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig
from sparse_videogen_tpu.core import permute as core_permute
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_runs, pack_kv
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, popularity_relabel, sap_cluster
from sparse_videogen_tpu.utils.benchmark import measure

fd = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
B, H, S, D = 1, 40, 75600, 128
cfg = SAPConfig(num_q_centroids=300, num_k_centroids=1000, max_runs=256,
                force_density=fd)
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


@jax.jit
def prep(qf, kf, vf, state, rng):
    (qlab, qcent, qsz), (klab, kcent, ksz), _ = sap_cluster(qf, kf, state, cfg, rng)
    kcn = int(-(-fd * KC // 1))
    dyn = jnp.broadcast_to((jnp.arange(KC) < kcn)[None, None, :], (BH, QC, KC))
    dyn_f, klab2, ksz2, _ = popularity_relabel(dyn, klab, ksz, kcent)
    sq_pad = core_permute.padded_seq_len(S, QC, bq)
    qmaps = core_permute.padded_permutation(qlab, qsz, n_clusters=QC, block=bq, s_pad=sq_pad)
    qp = core_permute.gather_padded(qf, qmaps["src"])
    iota = jax.lax.broadcasted_iota(jnp.int32, (BH, S), 1)
    _, kperm = jax.lax.sort_key_val(klab2, iota, dimension=-1)
    kv = core_permute.flat_row_gather(pack_kv(kf, vf), kperm)
    sk_pad = max(-(-S // MD.SUB) * MD.SUB, bkv)
    if sk_pad != S:
        kv = jnp.pad(kv, ((0, 0), (0, sk_pad - S), (0, 0)))
    zero = jnp.zeros_like(ksz2[..., :1])
    kstarts = jnp.cumsum(jnp.concatenate([zero, ksz2[..., :-1]], axis=-1), axis=-1)
    meta_c = MD.run_meta_jnp(dyn_f, kstarts, ksz2, block_kv=bkv, cap=cfg.max_runs or KC)
    qb_c = qmaps["block_to_cluster"]
    meta = jnp.take_along_axis(meta_c, qb_c[..., None], axis=1)
    qblk_valid = qmaps["kv_counts"] > 0
    meta = meta.at[..., 0].set(jnp.where(qblk_valid, meta[..., 0], 0))
    return qp, kv, meta, qmaps["pos"]


import numpy as np

qp, kv, meta, pos = jax.block_until_ready(prep(qf, kf, vf, state, rng))
del q, k, v, qf, kf, vf, pos
print(f"density={fd} qp={qp.shape} kv={kv.shape} meta={meta.shape}", flush=True)

ref = None
configs = [
    dict(expand=True, use_exp2=True),
    dict(expand=True, use_exp2=True, mxu_lsum=True),
    dict(expand=True, use_exp2=True, mxu_lsum=True, nbuf=4),
]
for kw in configs:
    kern = jax.jit(lambda qp, kv, meta, kw=kw: block_sparse_attention_runs(
        qp, kv, meta, block_q=bq, block_kv=bkv, **kw))
    out = kern(qp, kv, meta)
    # host-side slice comparison (keeping two full outputs OOMs the chip)
    probe = np.asarray(out[:, ::97].astype(jnp.float32))
    del out
    if ref is None:
        ref = probe
    else:
        err = float(np.max(np.abs(probe - ref)))
        print(f"  max-abs vs old (probe): {err:.2e}", flush=True)
    t = measure(lambda: kern(qp, kv, meta), iters=5, warmup=2)
    print(f"[kernel {kw}] {t*1e3:7.1f} ms", flush=True)
