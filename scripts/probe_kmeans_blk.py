"""k-means fused-pass grid granularity sweep (real TPU).

probe_tile_breakdown measures the warm k-means stage (2 iters x q/k sides)
at 79 ms/layer against a ~20 ms analytic floor (x read ~1 ms/pass at HBM
bandwidth + ~3 ms of MXU work per side-iteration). Hypothesis: blk_n=512
gives 40 x 148 = 5920 grid steps per pass, and per-step fixed costs
(semaphore waits, block bookkeeping) dominate. This sweeps blk_n and the
warm sap_cluster composite so the default can be set from data.

Usage: python scripts/probe_kmeans_blk.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SAPConfig
from sparse_videogen_tpu.ops.kmeans_pallas import kmeans_assign_update
from sparse_videogen_tpu.sparse import svg2
from sparse_videogen_tpu.utils.benchmark import measure_fenced

B, N, D = 40, 75600, 128
rng = np.random.default_rng(0)
centers = rng.standard_normal((12, D)) * 2.5
assign = rng.integers(0, 12, N)
base = centers[assign] + 0.35 * rng.standard_normal((N, D))
x = jnp.asarray(np.broadcast_to(base, (B, N, D)).copy(), jnp.bfloat16)

for K in (300, 125):
    cents = jnp.asarray(rng.standard_normal((B, K, D)), jnp.bfloat16)
    for blk_n in (512, 1024, 2048, 4096):
        f = jax.jit(lambda x, c, b=blk_n: kmeans_assign_update(x, c, blk_n=b))
        jax.block_until_ready(f(x, cents))
        ms = measure_fenced(lambda: f(x, cents), iters=5, warmup=2) * 1e3
        print(f"K={K:4d} blk_n={blk_n:5d}: {ms:7.2f} ms/pass", flush=True)

# composite: warm sap_cluster (2 iters q @ K=300 + 2 iters k @ K=125),
# the live per-layer cost in sap_sparse_attention
cfg = SAPConfig(num_q_centroids=300, num_k_centroids=125,
                kmeans_iter_init=8, kmeans_iter_step=2,
                block_q=512, block_kv=512, block_mode="tile")
state = svg2.init_sap_state(B, D, cfg)
key = jax.random.PRNGKey(0)
(_, _, _), (_, _, _), state = svg2.sap_cluster(x, x, state, cfg, key)
jax.block_until_ready(state.q_centroids)
f = jax.jit(lambda q, k, s, r: svg2.sap_cluster(q, k, s, cfg, r))
jax.block_until_ready(f(x, x, state, key))
ms = measure_fenced(lambda: f(x, x, state, key), iters=3, warmup=1) * 1e3
print(f"sap_cluster warm (q+k, 2 iters each): {ms:7.2f} ms", flush=True)
