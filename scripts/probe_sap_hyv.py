"""SAP attention-op probe at HunyuanVideo 720p scale (the SVG2 sweet spot).

Dense attention grows ~quadratically with S while SAP's glue (kmeans,
permutation gathers) grows ~linearly, so the SVG2 op-level win should be
far larger at S=119k than at Wan's S=75.6k where the 14B op ratio is only
790/678. Reference SVG2 hyvideo config: qc=400 kc=1000 top_p=0.9
min_kc=0.10 (scripts/hyvideo/hyvideo_t2v_720p_sap.sh).

Usage: python scripts/probe_sap_hyv.py [density] [block_q]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, TextPosition, VideoLayout
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.ops.mask_spec import MaskSpec
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, sap_sparse_attention
from sparse_videogen_tpu.utils.benchmark import measure

fd = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
bq = int(sys.argv[2]) if len(sys.argv) > 2 else 128

B, H, D = 1, 24, 128
VID = 33 * 3600  # 720p x 129f post-patchify
CTX = 256
S = VID + CTX  # 119,056
PROMPT = 100
layout = VideoLayout(num_frames=33, frame_size=3600, context_length=CTX,
                     text_position=TextPosition.LAST, prompt_length=PROMPT)
cfg = SAPConfig(num_q_centroids=400, num_k_centroids=1000, top_p_kmeans=0.9,
                min_kc_ratio=0.10, kmeans_iter_step=2, block_q=bq,
                force_density=fd, max_runs=256)
BH = B * H


@jax.jit
def gen(key):
    ks = jax.random.split(key, 3)
    out = []
    for i in range(3):
        steps = jax.random.normal(ks[i], (B, H, S, D), jnp.float32)
        base = jnp.cumsum(steps * 0.05, axis=2)
        out.append((base + jax.random.normal(ks[i], (B, H, S, D)) * 0.5).astype(jnp.bfloat16))
    return tuple(out)


q, k, v = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
state = init_sap_state(BH, D, cfg)
rng = jax.random.PRNGKey(1)

# warm the kmeans state (cold init is charged to dense warm-up steps via
# zero_step_kmeans_init in the e2e blend)
_, warm = sap_sparse_attention(q, k, v, state, rng, layout=layout, cfg=cfg)
jax.block_until_ready(warm.q_centroids)

sap = jax.jit(lambda q, k, v, st, rng: sap_sparse_attention(
    q, k, v, st, rng, layout=layout, cfg=cfg)[0])
out = jax.block_until_ready(sap(q, k, v, warm, rng))
t = measure(lambda: sap(q, k, v, warm, rng), iters=3, warmup=1)
print(f"[sap op warm  fd={fd} bq={bq}] {t*1e3:8.1f} ms", flush=True)
del out

# dense comparator: the bench's masked text-last dense op
import numpy as np

spec = MaskSpec(kind="hyvideo", video_len=VID, band_width=VID * 2)
aux = jnp.array([VID + PROMPT, 0, 0, 0], jnp.int32)
Sq_pad = -(-S // 1024) * 1024  # q rows to a block_q multiple
Sp = -(-S // 128) * 128  # kv to sub-block granularity
qp = jnp.pad(q.reshape(BH, S, D), ((0, 0), (0, Sq_pad - S), (0, 0)))
kvp = jnp.pad(pack_kv(k.reshape(BH, S, D), v.reshape(BH, S, D)),
              ((0, 0), (0, Sp - S), (0, 0)))
meta = MD.chunk_meta_np(np.ones((1, Sq_pad // 1024, Sp // 128), bool),
                        MD.kv_counts_for_seq(S, Sp), block_kv=1024)
meta = jnp.asarray(MD.classify_cheap_np(meta, spec, np.asarray(aux),
                                        block_q=1024, block_kv=1024, seq_q=S))
dense = jax.jit(lambda qp, kvp, meta: block_sparse_attention_kv(
    qp, kvp, meta, aux, block_q=1024, block_kv=1024, mask_spec=spec, qsplit=4))
o = jax.block_until_ready(dense(qp, kvp, meta))
del o
t_d = measure(lambda: dense(qp, kvp, meta), iters=3, warmup=1)
print(f"[dense masked op] {t_d*1e3:8.1f} ms  ratio {t_d/t:.2f}x", flush=True)
