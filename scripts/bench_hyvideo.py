"""HunyuanVideo 720p x 129f e2e TPU benchmark — the BASELINE north star.

Reference: HunyuanVideo T2V 720p dense 29:57 vs SVG 15:38 = 1.91x on H100
(/root/reference/README.md:126, BASELINE.md). This measures the TPU
counterpart: full HYVideo-T/2 architecture (double + single stream blocks,
text-last layout with real_len aux, embedded guidance, B=1) at the exact
720p x 129f token count S = 33*3600 + 256 = 119,056, dense vs SVG1, blended
over the reference's 50-step schedule with its warm-up fractions
(first_layers_fp=0.03, first_times_fp=0.1 —
scripts/hyvideo/hyvideo_t2v_720p_svg.sh).

Memory/compute strategy (13B bf16 = 25 GB does not fit a 16 GB v5e chip;
the reference measures on 80 GB H100s): block linears run int8 W8A8
(utils/quant.quantize_linears_int8) — the v5e MXU's double-rate format and
the TPU-native analog of the reference's own fp8 compute path
(hyvideo_orig/modules/fp8_optimization.py) — and the step time is measured
at full sequence length on reduced-DEPTH models, then composed linearly:

    t_step(d, s) = a + d*b_d + s*b_s        (a = embeds/refiner/final/rope)

Block cost is depth-independent under lax.scan (one compiled block body), so
depth configs with the full model's 1:2 double:single ratio pin (a, b_unit)
exactly; the full step is t(u=10) for unit=(2 double, 4 single). The
intercept a (embeds, token refiner, final head, rope tables) is measured
DIRECTLY as the depth-0 model (u=0) — it is runtime-independent (blocks are
the only runtime-dependent computation), so one cheap u=0 point anchors
every runtime's fit and a single u=1 point per runtime already yields an
honest fresh full-depth composition (the round-4 deadline failure mode was
needing 2 big cold compiles per runtime before anything composed).
Both runtimes share the identical quantized linear stream, so the reported
ratio is apples-to-apples.
The one warm dense layer inside sparse steps (first_layers = floor(.03*60)
= 1 of 60) is modeled as 1/6 unit of the dense-vs-sparse block delta.

Usage: python scripts/bench_hyvideo.py [--units 1 5] [--iters 2] [--small]
Prints one JSON line on stdout; detail on stderr.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_E2E = 1.91  # H100 hyvideo 720p T2V SVG speedup
# the reference's own 720p schedule: first_times_fp=0.1, first_layers_fp=0.03
# (/root/reference/scripts/hyvideo/hyvideo_t2v_720p_svg.sh) -> 5 dense warm
# steps of 50, floor(0.03*60)=1 warm layer. (An earlier revision used
# TFP=0.15 = 7 warm steps — stricter than the reference's actual config.)
LFP, TFP = 0.03, 0.1
NUM_STEPS = 50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, nargs="+", default=[1, 3],
                    help="depth configs in units of (2 double + 4 single) blocks; "
                         "a least-squares line through them gives (a, b_unit)")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--small", action="store_true",
                    help="360p x 33f smoke config (fast; for bring-up)")
    ap.add_argument("--prompt_length", type=int, default=70)
    ap.add_argument("--no_sap", action="store_true",
                    help="skip the SVG2/SAP runtime (dense + svg1 only)")
    ap.add_argument("--sap_block_q", type=int, default=None,
                    help="SAP q block. Default resolves per mode: tile -> 512 "
                         "(q tiles are exact, no padding at any bq, and the "
                         "CSR kernel wants big q blocks — the wan-14B sweep "
                         "optimum), cluster -> 128 (variable cluster sizes "
                         "pad ~21%% at qc=400 vs ~43%% at 256)")
    ap.add_argument("--budget", type=float, default=0,
                    help="soft wall-clock budget in seconds (0 = unlimited); "
                         "the bench bails out cleanly between measurements "
                         "and composes/emits whatever it has")
    ap.add_argument("--organic", action="store_true", default=True,
                    help="SAP density emerges from data: fused-QKV K:=Q + "
                         "smooth latents (utils/organic.py); force_density "
                         "disabled, measured density reported")
    ap.add_argument("--pinned", dest="organic", action="store_false",
                    help="legacy force_density=0.25 SAP leg")
    ap.add_argument("--organic_gain", type=float, default=3.5,
                    help="q-norm gain for --organic, calibrated so the "
                         "TILE-granularity top-p density lands in the "
                         "reference's real-video telemetry band (0.1-0.3): "
                         "gain 2.0 -> d=0.47, 3.0 -> 0.385, 3.5 -> 0.310")
    ap.add_argument("--kc", type=int, default=250,
                    help="k-centroids. TPU-adapted default (reference 720p "
                         "SVG2 uses 1000, tuned for the GPU variable-block "
                         "kernel's 64-token tiles): organic top-p maps "
                         "scatter, and coarser clusters coalesce KV runs at "
                         "the same top-p semantics — see bench_wan14b.py "
                         "--kc and probe_organic_bkv.py")
    ap.add_argument("--qc", type=int, default=400)
    ap.add_argument("--sap_bkv", type=int, default=512)
    ap.add_argument("--kmeans_iter_step", type=int, default=1,
                    help="warm-start Lloyd iterations per sparse step; 1 is "
                         "density-identical to the reference default 2 at "
                         "-21 ms/layer (probe_tile_order.py)")
    ap.add_argument("--sap_block_mode", type=str, default="tile",
                    choices=["cluster", "tile"],
                    help="'tile' (default) = fixed block_kv tiles of the "
                         "PC1-seriated k-means order — the organic-density "
                         "TPU mode (see bench_wan14b.py --sap_block_mode)")
    args = ap.parse_args()
    t_start = time.monotonic()

    def rem():
        return (args.budget - (time.monotonic() - t_start)) if args.budget else 1e9

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SAPConfig, SVGConfig, WarmupSchedule
    from sparse_videogen_tpu.models.hyvideo import model as HM
    from sparse_videogen_tpu.pipelines.hyvideo import hyvideo_layout
    from sparse_videogen_tpu.schedulers import FlowMatchEuler
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure_fenced
    from sparse_videogen_tpu.utils.quant import quantize_linears_int8

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        print(json.dumps({"metric": "hyvideo_720p_svg1_e2e_speedup", "value": 0.0,
                          "unit": "x", "vs_baseline": 0.0, "note": "no TPU"}))
        return

    if args.small:
        height, width, frames = 384, 640, 33
    else:
        height, width, frames = 720, 1280, 129

    base = HM.HYVIDEO_T2
    layout = hyvideo_layout(base, height, width, frames)
    layout = dataclasses.replace(layout, prompt_length=args.prompt_length)
    sch = FlowMatchEuler(NUM_STEPS, shift=7.0)
    n_layers_full = base.mm_double_blocks_depth + base.mm_single_blocks_depth  # 60
    warm_full = WarmupSchedule.from_fractions(LFP, TFP, n_layers_full, sch.timesteps)
    n_warm_steps = int(np.sum(np.asarray(sch.timesteps) > warm_full.first_times))
    svg = SVGConfig(sparsity=0.25, num_sampled_rows=64, profile_multiplier=1.5)
    plan = make_svg1_plan(layout, svg, WarmupSchedule(first_layers=0, first_times=1001.0))

    # --- params: init ONE unit (2 double + 4 single) in bf16, int8-quantize
    # (W8A8: the v5e's double-rate MXU format, the TPU analog of the
    # reference's own fp8 compute path on H100 — also required for FIT: 13B
    # bf16 = 25 GB vs 16 GB HBM; both runtimes share it so the ratio is
    # honest), then tile the stacked block axes to the measured depths.
    # Weight values repeat across layers — irrelevant for throughput; avoids
    # a 12.5 GB bf16 transient on the 16 GB chip.
    unit_cfg = dataclasses.replace(base, mm_double_blocks_depth=2, mm_single_blocks_depth=4)
    params_unit = HM.init_hyvideo_params(jax.random.PRNGKey(0), unit_cfg, dtype=jnp.bfloat16)
    if args.organic:
        # fused-QKV K:=Q (PSD similarity logits): the SAP top-p dynamic map
        # emerges from data statistics instead of force_density; identical
        # shapes/FLOPs (utils/organic.py). Dense/SVG1 timing is
        # value-independent, so all runtimes share the surgery.
        from sparse_videogen_tpu.utils.organic import align_fused_qkv

        params_unit = align_fused_qkv(params_unit, hidden=base.hidden_size,
                                      gain=args.organic_gain)
    params_unit = quantize_linears_int8(params_unit)

    def tiled(params, u):
        tile = lambda t: jax.tree.map(
            lambda x: jnp.tile(x, (u,) + (1,) * (x.ndim - 1)), t)
        out = dict(params)
        out["double_blocks"] = tile(params["double_blocks"])
        out["single_blocks"] = tile(params["single_blocks"])
        return out

    F_lat = 1 + (frames - 1) // 4
    H_lat, W_lat = height // 8, width // 8
    if args.organic:
        from sparse_videogen_tpu.utils.organic import smooth_latents

        x = smooth_latents(jax.random.PRNGKey(1),
                           (1, base.in_channels, F_lat, H_lat, W_lat), (3, 6, 6))
    else:
        x = jax.random.normal(jax.random.PRNGKey(1), (1, base.in_channels, F_lat, H_lat, W_lat), jnp.bfloat16)
    text_states = jax.random.normal(jax.random.PRNGKey(2), (1, base.text_len, base.text_states_dim), jnp.bfloat16)
    text_mask = (jnp.arange(base.text_len) < args.prompt_length).astype(jnp.int32)[None]
    text_pooled = jax.random.normal(jax.random.PRNGKey(3), (1, base.text_states_dim_2), jnp.bfloat16)
    guidance = jnp.full((1,), 6000.0, jnp.float32)
    t_sparse = 500.0  # < warm threshold -> sparse path active

    measured_density = []  # mean per-(layer, head) density from warm SAP states

    def step_time(runtime, cfg_r, params_r, carry_state=False):
        """Fenced s/step; carry_state=True (SAP) returns (cold, warm) where
        cold starts from the fresh state (iter_init Lloyd per layer) and warm
        threads the carried centroids (iter_step)."""
        consts = runtime.consts()
        nl = cfg_r.mm_double_blocks_depth + cfg_r.mm_single_blocks_depth

        @jax.jit
        def fwd(params, x, t, consts, states):
            v, st = HM.hyvideo_forward(
                params, cfg_r, x, jnp.full((1,), t, jnp.float32),
                text_states, text_mask, text_pooled, guidance=guidance,
                attention=runtime, attn_states=states, attn_consts=consts,
                rng=jax.random.PRNGKey(0))
            return v, st

        s0 = runtime.init_state(cfg_r.heads_num, cfg_r.head_dim, nl)
        # per-run fenced timing: the axon tunnel kills the worker when too
        # much execution time is enqueued unfenced (two crashes at this
        # scale with batched-queue timing; per-run fencing is stable). RTT
        # (~0.1 s) is noise against 15-70 s steps.
        if not carry_state:
            return measure_fenced(lambda: fwd(params_r, x, t_sparse, consts, s0)[0],
                                  iters=args.iters, warmup=1)
        _, s1 = fwd(params_r, x, t_sparse, consts, s0)
        jax.block_until_ready(s1.q_centroids)
        if hasattr(s1, "last_density"):
            measured_density.append(float(np.mean(np.asarray(s1.last_density, np.float64))))
        t_cold = measure_fenced(lambda: fwd(params_r, x, t_sparse, consts, s0)[0],
                                iters=args.iters, warmup=0)
        t_warm = measure_fenced(lambda: fwd(params_r, x, t_sparse, consts, s1)[0],
                                iters=args.iters, warmup=1)
        return t_cold, t_warm

    if args.sap_block_q is None:
        args.sap_block_q = 512 if args.sap_block_mode == "tile" else 128

    sap_rt = None
    if not args.no_sap:
        # reference hyvideo 720p SVG2 config (hyvideo_t2v_720p_sap.sh):
        # qc=400 kc=1000 top_p=0.9 min_kc=0.10 iter_init=50 iter_step=2.
        # force_density pins the dynamic map at a representative 25% (random
        # weights give flat centroid attention -> degenerate ~90% top-p);
        # every stage (k-means, permutation, run metadata, kernel, inverse)
        # is the real computation.
        sap_cfg = SAPConfig(num_q_centroids=args.qc, num_k_centroids=args.kc,
                            top_p_kmeans=0.9, min_kc_ratio=0.10,
                            kmeans_iter_init=50,
                            kmeans_iter_step=args.kmeans_iter_step,
                            block_q=args.sap_block_q, block_kv=args.sap_bkv,
                            block_mode=args.sap_block_mode,
                            # tile mode: metadata rows hold up to one run per
                            # KV *tile* (ceil(video_length / sap_bkv) ~ 233 at
                            # 720p) regardless of --kc — deriving the cap from
                            # kc would silently truncate runs and drop
                            # attention mass. None = exact cap.
                            max_runs=(None if args.sap_block_mode == "tile"
                                      else min(256, args.kc + 2)),
                            force_density=None if args.organic else 0.25)
        sap_rt = SAPRuntime(plan, sap_cfg,
                            WarmupSchedule(first_layers=0, first_times=1001.0))
    runtimes = {"dense": DenseRuntime(plan, prompt_length=args.prompt_length),
                "svg1": SVG1Runtime(plan, prompt_length=args.prompt_length)}

    # analytic linear-FLOPs floor for step-level MFU (the PROFILE_r04
    # method): block linear MACs ~ block params x tokens, x2 FLOP/MAC; the
    # v5e bf16 peak is 197 TFLOPs (int8 W8A8 runs at 2x that rate, so this
    # is a conservative floor either way). Attention FLOPs excluded — MFU
    # here is a cross-round regression scalar, not a utilization claim.
    n_blk_params_unit = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(
            {k: params_unit[k] for k in ("double_blocks", "single_blocks")}))
    PEAK_TFLOPS = 197.0

    def mfu(t_step, u_full):
        fl = 2.0 * n_blk_params_unit * u_full * layout.seq_len
        return fl / max(t_step, 1e-9) / (PEAK_TFLOPS * 1e12)

    def compose_and_report(results, final):
        """Emit the JSON line; called once after dense+svg1 (so a sap-leg
        hang killed by the driver's subprocess timeout still leaves a
        parseable headline — run_sub takes the LAST JSON line) and again
        with the sap fields once the sap leg finishes."""
        U_FULL = n_layers_full // 6
        t_dense = results["dense"]["a"] + U_FULL * results["dense"]["b_unit"]
        warm_frac_units = warm_full.first_layers / 6.0
        t_svg = (results["svg1"]["a"] + U_FULL * results["svg1"]["b_unit"]
                 + warm_frac_units * (results["dense"]["b_unit"] - results["svg1"]["b_unit"]))
        e2e_dense = NUM_STEPS * t_dense
        e2e_svg = n_warm_steps * t_dense + (NUM_STEPS - n_warm_steps) * t_svg
        speedup = e2e_dense / e2e_svg
        out = {
            "metric": "hyvideo_720p_svg1_e2e_speedup",
            "value": round(speedup, 3), "unit": "x",
            "vs_baseline": round(speedup / REF_E2E, 3),
            "dense_step_s": round(t_dense, 3), "svg1_step_s": round(t_svg, 3),
            "dense_step_mfu": round(mfu(t_dense, U_FULL), 4),
            "svg1_step_mfu": round(mfu(t_svg, U_FULL), 4),
        }
        if final:
            print(f"[bench_hyvideo] composed full-depth: dense {t_dense:.2f} s/step, "
                  f"svg1 {t_svg:.2f} s/step (step {t_dense/t_svg:.2f}x); blend with "
                  f"{n_warm_steps} dense warm steps -> e2e {speedup:.3f}x "
                  f"(ref H100 {REF_E2E}x)", file=sys.stderr)
        if "sap" in results:
            r = results["sap"]
            t_sap = (r["a"] + U_FULL * r["b_unit"]
                     + warm_frac_units * (results["dense"]["b_unit"] - r["b_unit"]))
            t_sap_cold = (r["a_cold"] + U_FULL * r["b_cold"]
                          + warm_frac_units * (results["dense"]["b_unit"] - r["b_cold"]))
            e2e_sap = (n_warm_steps * t_dense + t_sap_cold
                       + (NUM_STEPS - n_warm_steps - 1) * t_sap)
            sap_speedup = e2e_dense / e2e_sap
            if final:
                print(f"[bench_hyvideo] sap full-depth warm {t_sap:.2f} s/step "
                      f"(cold {t_sap_cold:.2f}) -> e2e {sap_speedup:.3f}x",
                      file=sys.stderr)
            out["sap_e2e_speedup"] = round(sap_speedup, 3)
            out["sap_warm_step_s"] = round(t_sap, 3)
            out["sap_cold_step_s"] = round(t_sap_cold, 3)
            if args.organic:
                out["sap_density"] = (round(float(np.mean(measured_density)), 4)
                                      if measured_density else None)
                out["sap_density_source"] = "organic"
            else:
                out["sap_density"] = 0.25
                out["sap_density_source"] = "forced"
            out["sap_block_mode"] = args.sap_block_mode
        print(json.dumps(out), flush=True)

    times = {"dense": {}, "svg1": {}}
    results = {}

    # measure the runtime-independent intercept DIRECTLY: the depth-0 model
    # (u=0) is embeds + token refiner + final head + rope only — no blocks,
    # hence no attention runtime. One cheap compile anchors every fit, so a
    # single u=1 point per runtime already composes a fresh full-depth
    # number (deadline-robust: the round-4 driver run died needing two big
    # cold compiles per runtime before anything composed).
    cfg0 = dataclasses.replace(base, mm_double_blocks_depth=0, mm_single_blocks_depth=0)
    t0 = step_time(runtimes["dense"], cfg0, tiled(params_unit, 0))
    print(f"[bench_hyvideo] u=0 intercept (no blocks): {t0:.2f} s/step "
          f"[budget rem {rem():.0f}s]", file=sys.stderr)

    def refit():
        """(Re)fit (a, b_unit) per runtime through the measured u=0 anchor
        plus the per-runtime points measured so far (least squares with >=2
        real points; exact 2-point line with 1)."""
        results.clear()
        for name, pts in times.items():
            if not pts:
                continue
            us = np.asarray([0.0] + sorted(pts), np.float64)
            ts = np.asarray([t0] + [pts[u] for u in sorted(pts)])
            b, a = np.polyfit(us, ts, 1)
            resid = float(np.max(np.abs(a + b * us - ts)))
            print(f"[bench_hyvideo] {name}: per-unit {b:.2f} s, overhead {a:.2f} s "
                  f"(u0 anchor {t0:.2f}), max fit residual {resid*1e3:.0f} ms",
                  file=sys.stderr)
            results[name] = {"a": a, "b_unit": b}

    sap_times = {}  # u -> (cold, warm)

    def refit_sap():
        if not sap_times:
            return
        # anchored at the measured u=0 intercept like every runtime
        us = np.asarray([0.0] + sorted(sap_times), np.float64)
        tw = np.asarray([t0] + [sap_times[u][1] for u in sorted(sap_times)])
        tc = np.asarray([t0] + [sap_times[u][0] for u in sorted(sap_times)])
        b, a = np.polyfit(us, tw, 1)
        bc, ac = np.polyfit(us, tc, 1)
        results["sap"] = {"a": a, "b_unit": b, "a_cold": ac, "b_cold": bc}

    # Measurement schedule: (dense u1, svg1 u1, SAP u1), then the larger
    # depths. The u=0 anchor makes every u=1-only fit already honest, so
    # the FIRST three measurements produce a complete fresh set (incl. the
    # SAP number); u>=2 points only refine the fits. Round-5 rehearsal
    # data: each big program costs 30-100 s of compile-cache
    # deserialization even when warm, so all-units-before-SAP ordering
    # (round 4) burned the whole driver budget before SAP ever ran.
    # A JSON snapshot is emitted after every point (driver takes the last).
    schedule = [(n, u) for u in args.units for n in ("dense", "svg1", "sap")]
    for name, u in schedule:
        if name == "sap" and sap_rt is None:
            continue
        have_min = times["dense"] and times["svg1"]
        if rem() <= 0 and have_min:
            print(f"[bench_hyvideo] budget exhausted before {name} u={u}",
                  file=sys.stderr)
            break
        # never START a measurement that cannot finish inside the driver's
        # kill grace (~150 s past budget): a mid-TPU kill wedges the chip
        # for the driver's remaining legs. Rough per-entry costs at
        # --iters 1 (s): dense ~30u+30, svg1 ~15u+20, sap ~40u+80 (cold+warm).
        # Without a minimal set yet (startup stall ate the budget), squeeze
        # whatever still fits into the grace, then bail.
        est_s = {"dense": 30 * u + 30, "svg1": 15 * u + 20,
                 "sap": 40 * u + 80}[name] * max(1, args.iters)
        if rem() - est_s < -120:
            if have_min:
                print(f"[bench_hyvideo] skipping {name} u={u}: ~{est_s:.0f}s "
                      f"won't fit in {rem():.0f}s + grace", file=sys.stderr)
                continue
            print("[bench_hyvideo] startup stall consumed the budget; bailing "
                  "before the kill grace expires", file=sys.stderr)
            break
        cfg_r = dataclasses.replace(
            base, mm_double_blocks_depth=2 * u, mm_single_blocks_depth=4 * u)
        if name == "sap":
            try:
                tc, tw = step_time(sap_rt, cfg_r, tiled(params_unit, u), carry_state=True)
                sap_times[u] = (tc, tw)
                print(f"[bench_hyvideo] sap u={u}: warm {tw:.2f} (cold {tc:.2f}) s/step "
                      f"[budget rem {rem():.0f}s]", file=sys.stderr)
            except Exception as e:
                print(f"[bench_hyvideo] sap u={u} failed ({e!r}); continuing",
                      file=sys.stderr)
                continue
        else:
            t = step_time(runtimes[name], cfg_r, tiled(params_unit, u))
            times[name][u] = t
            print(f"[bench_hyvideo] {name} u={u} ({2*u}d+{4*u}s, S={layout.seq_len}): "
                  f"{t:.2f} s/step  [budget rem {rem():.0f}s]", file=sys.stderr)
        refit()
        refit_sap()
        if "dense" in results and "svg1" in results:
            compose_and_report(results, final=False)

    if not ("dense" in results and "svg1" in results):
        print(json.dumps({"metric": "hyvideo_720p_svg1_e2e_speedup", "value": 0.0,
                          "unit": "x", "vs_baseline": 0.0,
                          "note": "budget too small for one dense+svg1 pair"}))
        return

    compose_and_report(results, final=True)


if __name__ == "__main__":
    main()
