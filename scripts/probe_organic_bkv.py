"""Organic-density SAP: block_kv/block_q sweep at wan-14B u=1.

Under force_density the dynamic map selected a contiguous cluster prefix ->
ONE coalesced KV run per row -> block_kv=1024 was optimal (fewest DMA
descriptors). Under ORGANIC top-p maps the selected clusters scatter (after
popularity relabeling the popular prefix coalesces but the tail fragments),
so each short run still pays a full block_kv-token chunk of DMA + MXU:
block_kv=1024 is ~13x waste on a 76-token run. This probe measures the warm
SAP forward across (block_q, block_kv) at the measured organic density.

Usage: python scripts/probe_organic_bkv.py [bq:bkv ...]  (default sweep)
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
from sparse_videogen_tpu.utils.benchmark import measure_fenced
from sparse_videogen_tpu.utils.organic import align_self_attn_qk, smooth_latents
from sparse_videogen_tpu.utils.quant import quantize_linears_int8

def _parse(a):
    parts = a.split(":")
    return (int(parts[0]), int(parts[1]),
            parts[2] if len(parts) > 2 else "popularity",
            int(parts[3]) if len(parts) > 3 else 1000,
            parts[4] if len(parts) > 4 else "cluster",
            int(parts[5]) if len(parts) > 5 else 0,  # tile_grain (0 = block_kv)
            float(parts[6]) if len(parts) > 6 else 0.9,  # top_p
            int(parts[7]) if len(parts) > 7 else 0)  # qsplit (0 = 1)


pairs = [_parse(a) for a in sys.argv[1:]] or [
    (256, 1024, "popularity", 1000, "cluster", 0, 0.9, 0), (256, 512, "popularity", 1000, "cluster", 0, 0.9, 0),
    (256, 256, "popularity", 1000, "cluster", 0, 0.9, 0), (256, 128, "popularity", 1000, "cluster", 0, 0.9, 0),
    (128, 256, "popularity", 1000, "cluster", 0, 0.9, 0),
]
UNIT = 4
base = WM.WAN_14B
F, H, W = 21, 90, 160
layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25), WarmupSchedule())
cfg_r = dataclasses.replace(base, num_layers=UNIT)
GAIN = float(os.environ.get("ORGANIC_GAIN", "2.0"))
params = align_self_attn_qk(
    WM.init_wan_params(jax.random.PRNGKey(0), cfg_r, dtype=jnp.bfloat16), gain=GAIN)
params["blocks"] = quantize_linears_int8(params["blocks"])
x = smooth_latents(jax.random.PRNGKey(1), (1, base.in_dim, F, H, W), (3, 6, 6))
ctx = jax.random.normal(jax.random.PRNGKey(2), (1, base.text_len, base.text_dim), jnp.bfloat16)

for bq, bkv, rel, kc, mode, grain, top_p, qs in pairs:
    sap_cfg = SAPConfig(num_q_centroids=300, num_k_centroids=kc, top_p_kmeans=top_p,
                        min_kc_ratio=0.10, kmeans_iter_init=50, kmeans_iter_step=2,
                        block_q=bq, block_kv=bkv, relabel=rel, block_mode=mode,
                        tile_grain=grain or None, qsplit=qs or None)
    rt = SAPRuntime(plan, sap_cfg, WarmupSchedule(first_layers=0, first_times=1001.0))
    consts = rt.consts()

    @jax.jit
    def fwd(params, x, ctx, states, consts, rt=rt):
        v, st = WM.wan_forward(params, cfg_r, x, jnp.full((1,), 500.0, jnp.float32), ctx,
                               attention=rt, attn_states=states, attn_consts=consts,
                               rng=jax.random.PRNGKey(0))
        return v, st

    s0 = rt.init_state(cfg_r.num_heads, cfg_r.head_dim, cfg_r.num_layers)
    _, s1 = jax.block_until_ready(fwd(params, x, ctx, s0, consts))
    d = float(np.mean(np.asarray(s1.last_density, np.float64)))
    t = measure_fenced(lambda: fwd(params, x, ctx, s1, consts)[0], iters=2, warmup=1)
    print(f"bq={bq} bkv={bkv} relabel={rel} kc={kc} mode={mode} grain={grain or bkv} "
          f"p={top_p} qs={qs or 1} gain={GAIN}: warm u=1 {t:.2f} s (density {d:.3f})", flush=True)
