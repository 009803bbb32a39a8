"""A/B the tile-mode token ordering: k-means+seriation vs per-token PC1.

In tile mode the k-means machinery exists only to ORDER tokens (the top-p
selection runs on tile centroids either way), so tile_order="pc1"
(svg2.token_pc1_keys) replaces it with two einsum passes. This probe
measures, at the wan-14B bench geometry (u=1 unit of 4 blocks, organic
inputs, int8 linears), for each (order, gain):

  - measured dynamic-map density (telemetry band target: 0.1-0.3)
  - warm per-forward time (batched measure; the fenced variant pays a 30 ms
    tunnel RTT per call — probe_rtt round 5)

Usage: python scripts/probe_tile_order.py [gains...]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SAPConfig, SVGConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.models.wan import model as WM
from sparse_videogen_tpu.sparse.runtimes import SAPRuntime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.benchmark import measure
from sparse_videogen_tpu.utils.organic import align_self_attn_qk, smooth_latents
from sparse_videogen_tpu.utils.quant import quantize_linears_int8

gains = [float(g) for g in sys.argv[1:]] or [3.0, 3.5, 4.5, 6.0]
UNIT = 4
base = WM.WAN_14B
F, H, W = 21, 90, 160
layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25), WarmupSchedule())
cfg_r = dataclasses.replace(base, num_layers=UNIT)
params0 = WM.init_wan_params(jax.random.PRNGKey(0), cfg_r, dtype=jnp.bfloat16)
x = smooth_latents(jax.random.PRNGKey(1), (1, base.in_dim, F, H, W), (3, 6, 6), jnp.bfloat16)
ctx = jax.random.normal(jax.random.PRNGKey(2), (1, base.text_len, base.text_dim), jnp.bfloat16)

import os
variants = os.environ.get("ORDERS", "kmeans,pc1").split(",")
for order in variants:
    iter_step = 1 if order == "kmeans1" else 2
    sap_cfg = SAPConfig(num_q_centroids=300, num_k_centroids=125,
                        top_p_kmeans=0.9, min_kc_ratio=0.10,
                        kmeans_iter_init=50, kmeans_iter_step=iter_step,
                        block_q=512, block_kv=512, block_mode="tile",
                        tile_order="kmeans" if order == "kmeans1" else order)
    rt = SAPRuntime(plan, sap_cfg, WarmupSchedule(first_layers=0, first_times=1001.0))
    consts = rt.consts()

    @jax.jit
    def fwd(params, x, ctx, states, consts):
        v, st = WM.wan_forward(params, cfg_r, x, jnp.full((1,), 500.0, jnp.float32),
                               ctx, attention=rt, attn_states=states,
                               attn_consts=consts, rng=jax.random.PRNGKey(0))
        return v, st

    for g in gains:
        p = align_self_attn_qk(params0, gain=g)
        p["blocks"] = quantize_linears_int8(p["blocks"])
        s0 = rt.init_state(cfg_r.num_heads, cfg_r.head_dim, cfg_r.num_layers)
        _, st = jax.block_until_ready(fwd(p, x, ctx, s0, consts))  # cold
        d = np.asarray(st.last_density, np.float64)
        sec = measure(lambda: fwd(p, x, ctx, st, consts), iters=4, warmup=1)
        print(f"order={order:6s} gain={g}: density mean {d.mean():.3f} "
              f"min {d.min():.3f} max {d.max():.3f}  warm fwd {sec:.3f} s",
              flush=True)
