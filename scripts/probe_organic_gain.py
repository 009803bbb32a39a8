"""Calibrate the organic-density gain: one wan-14B u=1 SAP forward per gain,
report the measured mean/min/max dynamic-map density (no force_density).

Usage: python scripts/probe_organic_gain.py [gains...]
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
from sparse_videogen_tpu.utils.organic import align_self_attn_qk, smooth_latents
from sparse_videogen_tpu.utils.quant import quantize_linears_int8

gains = [float(g) for g in sys.argv[1:]] or [1.0, 2.0, 3.0, 4.0]
UNIT = 4
base = WM.WAN_14B
F, H, W = 21, 90, 160
layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25), WarmupSchedule())
sap_cfg = SAPConfig(num_q_centroids=300, num_k_centroids=1000, top_p_kmeans=0.9,
                    min_kc_ratio=0.10, kmeans_iter_init=50, kmeans_iter_step=2)
rt = SAPRuntime(plan, sap_cfg, WarmupSchedule(first_layers=0, first_times=1001.0))
consts = rt.consts()
cfg_r = dataclasses.replace(base, num_layers=UNIT)
params0 = WM.init_wan_params(jax.random.PRNGKey(0), cfg_r, dtype=jnp.bfloat16)
x = smooth_latents(jax.random.PRNGKey(1), (1, base.in_dim, F, H, W), (3, 6, 6), jnp.bfloat16)
ctx = jax.random.normal(jax.random.PRNGKey(2), (1, base.text_len, base.text_dim), jnp.bfloat16)


@jax.jit
def fwd(params, x, ctx, states, consts):
    v, st = WM.wan_forward(params, cfg_r, x, jnp.full((1,), 500.0, jnp.float32), ctx,
                           attention=rt, attn_states=states, attn_consts=consts,
                           rng=jax.random.PRNGKey(0))
    return v, st


for g in gains:
    p = align_self_attn_qk(params0, gain=g)
    p["blocks"] = quantize_linears_int8(p["blocks"])
    s0 = rt.init_state(cfg_r.num_heads, cfg_r.head_dim, cfg_r.num_layers)
    _, st = jax.block_until_ready(fwd(p, x, ctx, s0, consts))
    d = np.asarray(st.last_density, np.float64)
    print(f"gain={g}: density mean {d.mean():.3f} min {d.min():.3f} max {d.max():.3f}",
          flush=True)
