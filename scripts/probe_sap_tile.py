"""Tile-mode SAP: per-call cost + stage breakdown at wan-14B attention
geometry (H=40, S=75,600, D=128) on organic-style clustered data.

Isolates the attention+glue cost per layer (no linears) so the
cluster-vs-tile comparison and the remaining glue levers are visible.

Usage: python scripts/probe_sap_tile.py [spec ...]
  spec = mode,relabel,kc,bq,bkv,grain,top_p   (grain 0 = block_kv)
  e.g.   tile,pc1,250,256,512,128,0.9
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SAPConfig, VideoLayout
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, sap_cluster, sap_sparse_attention
from sparse_videogen_tpu.utils.benchmark import measure


def _parse(a):
    p = a.split(",")
    return (p[0], p[1] if len(p) > 1 else "popularity",
            int(p[2]) if len(p) > 2 else 250,
            int(p[3]) if len(p) > 3 else 256,
            int(p[4]) if len(p) > 4 else 512,
            int(p[5]) if len(p) > 5 else 0,
            float(p[6]) if len(p) > 6 else 0.9)


specs = [_parse(a) for a in sys.argv[1:]] or [
    # density sweep at fixed config: slope = kernel cost per unit density,
    # intercept = density-independent glue (kmeans + permute + metadata)
    ("tile", "auto", 250, 256, 512, 0, 0.9),
    ("tile", "auto", 250, 256, 512, 0, 0.5),
    ("tile", "auto", 250, 256, 512, 0, 0.2),
    ("tile", "auto", 250, 512, 512, 0, 0.9),
    ("cluster", "auto", 250, 256, 512, 0, 0.9),
]

B, H, S, D = 1, 40, 75600, 128
layout = VideoLayout(num_frames=21, frame_size=3600)


@jax.jit
def gen(key):
    """Clustered q (k := q) — PSD similarity logits like utils/organic.py.

    Center lookup is a one-hot MXU matmul: a (B, H, S)-indexed dynamic
    take_along_axis ABORTS the axon TPU worker (NOTES_ROUND4.md gotcha).
    """
    kc_, kn, kv_ = jax.random.split(key, 3)
    centers = jax.random.normal(kc_, (B, H, 64, D), jnp.float32) * 2.0
    steps = jax.random.randint(kn, (B, H, S), 0, 64)
    onehot = jax.nn.one_hot(steps, 64, dtype=jnp.bfloat16)
    q = jnp.einsum("bhsc,bhcd->bhsd", onehot, centers.astype(jnp.bfloat16))
    q = q.astype(jnp.float32) + 0.4 * jax.random.normal(kv_, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv_, (B, H, S, D), jnp.float32)
    return q.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


q, v = gen(jax.random.PRNGKey(0))
k = q  # PSD logits: token attends tokens that resemble it
rng = jax.random.PRNGKey(1)

tk_cache = {}
for mode, rel, kc, bq, bkv, grain, top_p in specs:
    # iter_init=8: a standalone 50-iteration cold k-means program aborts the
    # axon worker (NOTES_ROUND4.md); only warm steps (iter_step=2) are timed
    cfg = SAPConfig(num_q_centroids=300, num_k_centroids=kc, top_p_kmeans=top_p,
                    min_kc_ratio=0.10, kmeans_iter_init=8, kmeans_iter_step=2,
                    block_q=bq, block_kv=bkv, block_mode=mode, relabel=rel,
                    tile_grain=grain or None)
    state = init_sap_state(B * H, D, cfg)
    out, warm = sap_sparse_attention(q, k, v, state, rng, layout=layout, cfg=cfg)
    jax.block_until_ready(out)
    d = float(np.mean(np.asarray(warm.last_density, np.float64)))
    t = measure(lambda: sap_sparse_attention(q, k, v, warm, rng, layout=layout, cfg=cfg)[0],
                iters=3, warmup=1)

    # stage split: kmeans-only (warm); everything-after-kmeans is the diff
    if kc not in tk_cache:
        @jax.jit
        def kmeans_only(qf, kf, st, r):
            return sap_cluster(qf, kf, st, cfg, r)[2].q_centroids

        qf, kf = q.reshape(B * H, S, D), k.reshape(B * H, S, D)
        jax.block_until_ready(kmeans_only(qf, kf, warm, rng))
        tk_cache[kc] = measure(lambda: kmeans_only(qf, kf, warm, rng), iters=3, warmup=1)
    tk = tk_cache[kc]
    print(f"[{mode:7s} rel={rel:10s} kc={kc:4d} bq={bq} bkv={bkv} g={grain or bkv:4d} "
          f"p={top_p}] op {t*1e3:7.1f} ms (density {d:.3f}; kmeans {tk*1e3:5.1f}, "
          f"rest {(t-tk)*1e3:7.1f})", flush=True)
