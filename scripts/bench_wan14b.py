"""Wan 2.1 **14B** 720p e2e TPU benchmark — the model the reference's 720p
rows actually measure (dense 31:35 vs SVG 20:51 = 1.51x on H100,
/root/reference/README.md:127; SVG2 ~2x claim README.md:18).

Same methodology as bench_hyvideo.py (validated there with 1 ms fit
residuals): 14B bf16 = 28 GB does not fit a 16 GB v5e, so weights are fp8
(the reference's own --use-fp8 trick) and step time is measured at full
sequence (S=75,600) on reduced depths, then composed linearly
t(L) = a + L*b. One unit = 4 layers; full model = 10 units (40 layers).

Per pattern: everything runs B=1 with cond/uncond as two forwards per step
(14B activations at B=2 with SVG1's placement copies exceed 16 GB HBM — a
real single-chip constraint; every pattern pays the same x2 so ratios are
unaffected). SAP density is ORGANIC by default (--organic): self-attn K:=Q
+ smooth latents (utils/organic.py) make the top-p dynamic map emerge from
data statistics, and the measured mean density is reported
(sap_density_source: "organic"); --pinned restores the legacy
force_density=0.25 override. Cold k-means (iter_init=50) charged once per
stream.

At H=40 heads the SAP glue (k-means, permutation, metadata) amortizes far
better than at the 1.3B's 12 heads — this is the geometry where round-2
measured the 2.13x op-level SAP win.

Prints one JSON line; detail on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_STEPS = 50
SVG_TFP, SVG_LFP = 0.075, 0.025
SAP_TFP, SAP_LFP = 0.2, 0.03
REF_SVG = 1.51
UNIT = 4  # layers per depth unit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--density", type=float, default=0.25,
                    help="force_density for the pinned SAP leg (ignored with --organic)")
    ap.add_argument("--organic", action="store_true", default=True,
                    help="SAP density emerges from data: self-attn K:=Q "
                         "(PSD similarity logits) + smooth latents "
                         "(utils/organic.py); force_density disabled and the "
                         "measured mean density is reported")
    ap.add_argument("--pinned", dest="organic", action="store_false",
                    help="legacy force_density SAP leg instead of --organic")
    ap.add_argument("--kc", type=int, default=125,
                    help="k-centroids. TPU-adapted default 125 (vs the "
                         "reference's GPU-tuned 1000): organic top-p maps "
                         "select SCATTERED clusters, and on TPU every run "
                         "pays a full block_kv chunk — coarser clusters "
                         "coalesce runs at the SAME top-p semantics (>= "
                         "selected mass per cluster, higher recall). Sweep "
                         "(probe_organic_bkv.py, u=1 warm): kc=1000 8.18 s "
                         "@d=0.183, 500 5.67 @0.207, 250 4.63 @0.236, 125 "
                         "4.57 @0.271, 50 4.29 @0.326. In tile mode kc only "
                         "shapes the pre-tiling seriation: kc=125 beat 250 "
                         "(3.91 vs 4.06 s @ bq=512, gain 2.0). Use 1000 to "
                         "measure the reference config.")
    ap.add_argument("--qc", type=int, default=300)
    ap.add_argument("--sap_bq", type=int, default=512,
                    help="SAP block_q (= q tile grain in tile mode). 512 is "
                         "the measured optimum: at bq=256 the kernel is "
                         "KV-DMA-re-read-bound (each q block re-reads its "
                         "selected chunks) and qsplit/pair variants all "
                         "regress; 512 doubles per-chunk MXU work at the "
                         "same DMA volume (slope 3.81 vs 5.07 s/unit-"
                         "density); 1024 dilutes the q-side selection "
                         "(density 0.578 vs 0.528)")
    ap.add_argument("--sap_bkv", type=int, default=512,
                    help="SAP block_kv; 512 is the fragmented-regime "
                         "optimum (1024 wins only on contiguous/forced maps)")
    ap.add_argument("--kmeans_iter_step", type=int, default=1,
                    help="warm-start Lloyd iterations per sparse step. 1 "
                         "measured bit-identical same-step density to the "
                         "reference default 2 (the carried centroids "
                         "converge in one assign) at -21 ms/layer "
                         "(probe_tile_order.py kmeans1); quality gate runs "
                         "with the same setting")
    ap.add_argument("--sap_block_mode", type=str, default="tile",
                    choices=["cluster", "tile"],
                    help="SAP selection granularity: 'cluster' = reference "
                         "variable-size clusters; 'tile' = fixed block_kv "
                         "tiles of the PC1-seriated k-means order (every "
                         "selected tile is one DMA chunk). tile is the "
                         "organic-density TPU default: measured e2e 0.899x "
                         "@ d=0.50 vs cluster 0.759x @ d=0.27 (same top_p; "
                         "tile processes MORE true attention mass per "
                         "second — NOTES_ROUND4.md session 3)")
    ap.add_argument("--organic_gain", type=float, default=3.5,
                    help="q-norm gain for --organic; calibrated on TPU so "
                         "the density of the selection granularity actually "
                         "benched lands mid-telemetry-band (reference "
                         "telemetry 0.1-0.3): tile-mode maps measure "
                         "d=0.33 at gain 3.0, d=0.26 at 3.5 (cluster-"
                         "granularity maps land at the min_kc floor "
                         "0.10-0.13; gain 2.0 puts tiles at 0.47-0.53, "
                         "above band)")
    ap.add_argument("--smooth", type=int, nargs=3, default=[3, 6, 6],
                    help="latent correlation lengths (F, H, W) for --organic")
    ap.add_argument("--budget", type=float, default=0,
                    help="soft wall-clock budget in seconds (0 = unlimited); "
                         "the SAP legs are skipped when exhausted (a "
                         "dense+svg1 JSON snapshot is always emitted first)")
    args = ap.parse_args()
    t_start = time.monotonic()

    def rem():
        return (args.budget - (time.monotonic() - t_start)) if args.budget else 1e9

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SAPConfig, SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.models.wan import model as WM
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure_fenced
    from sparse_videogen_tpu.utils.quant import quantize_linears_int8

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"metric": "wan14b_720p_svg1_e2e_speedup", "value": 0.0,
                          "unit": "x", "vs_baseline": 0.0, "note": "no TPU"}))
        return

    base = WM.WAN_14B
    F, H, W = 21, 90, 160
    layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
    timesteps = np.linspace(1000.0, 0.0, NUM_STEPS, endpoint=False)
    warm_svg = WarmupSchedule.from_fractions(SVG_LFP, SVG_TFP, base.num_layers, timesteps)
    warm_sap = WarmupSchedule.from_fractions(SAP_LFP, SAP_TFP, base.num_layers, timesteps)
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64), warm_svg)
    sap_cfg = SAPConfig(num_q_centroids=args.qc, num_k_centroids=args.kc,
                        block_q=args.sap_bq,
                        top_p_kmeans=0.9, min_kc_ratio=0.10,
                        kmeans_iter_init=50,
                        kmeans_iter_step=args.kmeans_iter_step,
                        block_kv=args.sap_bkv, block_mode=args.sap_block_mode,
                        force_density=None if args.organic else args.density)

    unit_cfg = dataclasses.replace(base, num_layers=UNIT)
    params_unit = WM.init_wan_params(jax.random.PRNGKey(0), unit_cfg, dtype=jnp.bfloat16)
    if args.organic:
        # K := Q per self-attn (PSD similarity logits) so the top-p dynamic
        # map emerges from data statistics instead of force_density; same
        # shapes/FLOPs, density becomes a *measured* output (utils/organic.py)
        from sparse_videogen_tpu.utils.organic import align_self_attn_qk, smooth_latents

        params_unit = align_self_attn_qk(params_unit, gain=args.organic_gain)
    params_unit["blocks"] = quantize_linears_int8(params_unit["blocks"])

    def tiled(u):
        out = dict(params_unit)
        out["blocks"] = jax.tree.map(
            lambda x: jnp.tile(x, (u,) + (1,) * (x.ndim - 1)), params_unit["blocks"])
        return out

    if args.organic:
        x2 = smooth_latents(jax.random.PRNGKey(1), (2, base.in_dim, F, H, W),
                            tuple(args.smooth), jnp.bfloat16)
    else:
        x2 = jax.random.normal(jax.random.PRNGKey(1), (2, base.in_dim, F, H, W), jnp.bfloat16)
    ctx2 = jax.random.normal(jax.random.PRNGKey(2), (2, base.text_len, base.text_dim), jnp.bfloat16)
    t_sparse = 500.0
    measured_density = []  # per-(layer, head) mean from warm SAP states

    def step_time(runtime, B, u, warm_state=False):
        cfg_r = dataclasses.replace(base, num_layers=UNIT * u)
        consts = runtime.consts()
        x, ctx = x2[:B], ctx2[:B]

        @jax.jit
        def fwd(params, x, t, ctx, states, consts):
            v, states = WM.wan_forward(
                params, cfg_r, x, jnp.full((B,), t, jnp.float32), ctx,
                attention=runtime, attn_states=states, attn_consts=consts,
                rng=jax.random.PRNGKey(0))
            return v, states

        params_r = tiled(u)
        s0 = runtime.init_state(B * cfg_r.num_heads, cfg_r.head_dim, cfg_r.num_layers)
        if warm_state:
            out = fwd(params_r, x, t_sparse, ctx, s0, consts)
            jax.block_until_ready(out)
            s0 = out[1]
            if hasattr(s0, "last_density"):
                d = np.asarray(s0.last_density, np.float64)
                measured_density.append(float(d.mean()))
        return measure_fenced(lambda: fwd(params_r, x, t_sparse, ctx, s0, consts),
                              iters=args.iters, warmup=1)

    def fit(name, runtime, B, warm_state=False):
        ts = []
        for u in args.units:
            t = step_time(runtime, B, u, warm_state)
            print(f"[bench_wan14b] {name} u={u} ({UNIT*u} layers, B={B}): {t:.2f} s",
                  file=sys.stderr, flush=True)
            ts.append(t)
        us = np.asarray(args.units, np.float64)
        b, a = np.polyfit(us, np.asarray(ts), 1)
        full = a + (base.num_layers // UNIT) * b
        print(f"[bench_wan14b] {name}: full-depth {full:.2f} s "
              f"(per-unit {b:.2f}, overhead {a:.2f})", file=sys.stderr, flush=True)
        return full

    t_dense = fit("dense", DenseRuntime(plan), 1)
    t_svg = fit("svg1", SVG1Runtime(plan), 1)

    # steps = 2 x B=1 forwards for every pattern (see docstring)
    n_warm_svg = int(np.sum(timesteps > warm_svg.first_times))
    n_warm_sap = int(np.sum(timesteps > warm_sap.first_times))
    e2e_dense = NUM_STEPS * 2 * t_dense
    e2e_svg = 2 * (n_warm_svg * t_dense + (NUM_STEPS - n_warm_svg) * t_svg)
    svg_speedup = e2e_dense / e2e_svg
    # analytic linear-FLOPs floor MFU (PROFILE_r04 method): 2 FLOP/MAC x
    # block params x tokens per forward, against the v5e bf16 peak (197
    # TFLOPs; int8 W8A8 runs 2x that rate, so this is conservative).
    # Cross-round regression scalar, not a utilization claim.
    n_blk_params_unit = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params_unit["blocks"]))
    fl_fwd = 2.0 * n_blk_params_unit * (base.num_layers // UNIT) * layout.seq_len
    mfu = lambda t_fwd: round(fl_fwd / max(t_fwd, 1e-9) / 197e12, 4)
    out = {
        "metric": "wan14b_720p_svg1_e2e_speedup",
        "value": round(svg_speedup, 3), "unit": "x",
        "vs_baseline": round(svg_speedup / REF_SVG, 3),
        "dense_step_s": round(2 * t_dense, 3), "svg1_step_s": round(2 * t_svg, 3),
        "dense_step_mfu": mfu(t_dense), "svg1_step_mfu": mfu(t_svg),
    }
    # partial snapshot before the SAP legs (driver takes the LAST JSON line)
    print(json.dumps(out), flush=True)
    if rem() <= 0:
        print("[bench_wan14b] budget exhausted; skipping sap legs",
              file=sys.stderr, flush=True)
        return

    sap_rt = SAPRuntime(plan, sap_cfg, WarmupSchedule(first_layers=0, first_times=1001.0))
    t_sap_cold = fit("sap-cold", sap_rt, 1)
    t_sap_warm = fit("sap-warm", sap_rt, 1, warm_state=True)
    e2e_sap = 2 * (n_warm_sap * t_dense + t_sap_cold
                   + (NUM_STEPS - n_warm_sap - 1) * t_sap_warm)
    sap_speedup = e2e_dense / e2e_sap
    if args.organic:
        density = float(np.mean(measured_density)) if measured_density else None
        density_source = "organic"
    else:
        density, density_source = args.density, "forced"
    print(f"[bench_wan14b] svg1 e2e {svg_speedup:.3f}x, sap e2e {sap_speedup:.3f}x "
          f"(density {density} [{density_source}])", file=sys.stderr, flush=True)
    out.update(sap_e2e_speedup=round(sap_speedup, 3),
               sap_cold_fwd_s=round(t_sap_cold, 3),
               sap_warm_fwd_s=round(t_sap_warm, 3),
               sap_density=round(density, 4) if density is not None else None,
               sap_density_source=density_source,
               sap_config={"qc": args.qc, "kc": args.kc,
                           "block_kv": args.sap_bkv, "top_p": 0.9,
                           "block_mode": args.sap_block_mode})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
