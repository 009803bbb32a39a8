"""SAP perf measurement on the real TPU (round-2 runs-mode path).

Usage: python scripts/bench_sap.py [480p|720p]

Measures (steady-state, warm kmeans state):
  - dense attention at the same shape (baseline)
  - sap_sparse_attention total
  - run-count stats (to size SAPConfig.max_runs without truncation)
  - achieved density

One TPU job at a time; data generated on-device (host->device through the
relay is ~1 MB/s-class).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, SVGConfig, VideoLayout
from sparse_videogen_tpu.sparse.svg1 import dense_attention_kernel, make_svg1_plan
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, sap_cluster, sap_sparse_attention, popularity_relabel
from sparse_videogen_tpu.core.dynamic_map import identify_dynamic_map
from sparse_videogen_tpu.utils.benchmark import measure

scale = sys.argv[1] if len(sys.argv) > 1 else "720p"
max_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 256

if scale == "720p":
    B, H, S, D = 1, 40, 75600, 128
    layout = VideoLayout(num_frames=21, frame_size=3600)
    cfg = SAPConfig(num_q_centroids=300, num_k_centroids=1000, max_runs=max_runs)
else:
    B, H, S, D = 1, 12, 32760, 128
    layout = VideoLayout(num_frames=21, frame_size=1560)
    cfg = SAPConfig(num_q_centroids=50, num_k_centroids=200, max_runs=max_runs)

BH = B * H
print(f"[cfg] {scale}: BH={BH} S={S} qc={cfg.num_q_centroids} kc={cfg.num_k_centroids} "
      f"max_runs={cfg.max_runs} bq={cfg.block_q} bkv={cfg.block_kv}", flush=True)


@jax.jit
def gen(key):
    """Random-walk tokens: smooth along the sequence => realistic clusters."""
    ks = jax.random.split(key, 3)
    out = []
    for i in range(3):
        steps = jax.random.normal(ks[i], (B, H, S, D), jnp.float32)
        base = jnp.cumsum(steps * 0.05, axis=2)
        out.append((base + jax.random.normal(ks[i], (B, H, S, D)) * 0.5).astype(jnp.bfloat16))
    return tuple(out)


q, k, v = gen(jax.random.PRNGKey(0))
q.block_until_ready()
print("[gen] data ready", flush=True)

# dense baseline
plan = make_svg1_plan(layout, SVGConfig(), block_q=512, block_kv=512)
t_dense = measure(lambda: dense_attention_kernel(q, k, v, plan), iters=3, warmup=1)
flops = 4 * S * S * D * BH
print(f"[dense] {t_dense*1e3:.1f} ms ({flops/t_dense/1e12:.1f} TFLOPs)", flush=True)

# run-count probe: same clustering path as sap_sparse_attention
@jax.jit
def probe(q, k, state, rng):
    qf = q.reshape(BH, S, D)
    kf = k.reshape(BH, S, D)
    (qlab, qcent, qsz), (klab, kcent, ksz), st = sap_cluster(qf, kf, state, cfg, rng)
    QC, KC = cfg.num_q_centroids, cfg.num_k_centroids
    dyn = identify_dynamic_map(
        qcent.reshape(B, H, QC, D), kcent.reshape(B, H, KC, D),
        qsz.reshape(B, H, QC), ksz.reshape(B, H, KC),
        cfg.top_p_kmeans, cfg.min_kc_ratio)
    dyn_f, klab2, ksz2, _ = popularity_relabel(dyn.reshape(BH, QC, KC), klab, ksz, kcent)
    sel = dyn_f & (ksz2 > 0)[:, None, :]
    nxt = jnp.concatenate([sel[..., 1:], jnp.zeros_like(sel[..., :1])], axis=-1)
    run_end = sel & ~nxt
    runs = jnp.sum(run_end, axis=-1)  # (BH, QC)
    return runs.max(), runs.mean(), st

rng = jax.random.PRNGKey(1)
state0 = init_sap_state(BH, D, cfg)
rmax, rmean, warm_state = probe(q, k, state0, rng)
print(f"[runs] max={int(rmax)} mean={float(rmean):.1f} (cap={cfg.max_runs})", flush=True)

# density + warm state
out, warm_state2, dens = sap_sparse_attention(q, k, v, warm_state, rng, layout=layout, cfg=cfg, with_density=True)
out.block_until_ready()
print(f"[density] {float(dens.mean()):.4f}", flush=True)

t_sap = measure(
    lambda: sap_sparse_attention(q, k, v, warm_state, rng, layout=layout, cfg=cfg)[0],
    iters=3, warmup=1,
)
print(f"[sap] {t_sap*1e3:.1f} ms  speedup vs dense = {t_dense/t_sap:.2f}x", flush=True)
