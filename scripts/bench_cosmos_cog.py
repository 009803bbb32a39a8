"""Cosmos + CogVideoX DiT-level e2e TPU benchmarks at the reference's own
production configs — extends the per-model e2e coverage beyond Wan/HunyuanVideo
(round-2 VERDICT item 8 measured these shapes at the attention-op level only).

1. **Cosmos-14B Text2World 704x1280x121f** (reference cosmos_t2v_inference.py:
   35 steps; SVG config TFP=0.3 LFP=0.03 sparsity=0.25,
   scripts/cosmos/cosmos_t2v_svg.sh). Latent (16, 16, 88, 160), patch (1,2,2)
   -> S = 16*44*80 = 56,320 video-only tokens (text via cross-attn).
   14B bf16 = 28 GB > 16 GB v5e, so block linears run int8 W8A8 (shared by
   both runtimes; same methodology as bench_hyvideo.py) and step time is
   depth-composed: one unit = 4 of 36 layers, linear fit over --units.

2. **CogVideoX1.5-5B I2V 1360x768x81f** (reference cog_inference.py: 50
   steps, SVG TFP=0.2 LFP=0.025 sparsity=0.25; SVG-only — the reference has
   no cog SAP). Text-FIRST layout: S = 226 + 11*48*85 = 45,106. 5B bf16
   (10 GB) runs whole-depth, B=1 with cond/uncond as two forwards.

The reference publishes no cosmos/cog e2e numbers (BASELINE.md end-to-end
table covers hyvideo/wan only), so vs_baseline is reported against the
repo-wide ~2x SVG claim (/root/reference/README.md:14).

Prints ONE JSON line; detail on stderr. Not wired into bench.py (headline
stays hyvideo); run manually, numbers recorded in NOTES_ROUND3.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

UNIT = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--skip_cosmos", action="store_true")
    ap.add_argument("--skip_cog", action="store_true")
    ap.add_argument("--cog_quant", choices=["none", "int8"], default="none",
                    help="int8 fallback if bf16 5B does not fit next to activations")
    ap.add_argument("--no_sap", action="store_true",
                    help="skip the cosmos SVG2/SAP leg (dense + svg1 only)")
    ap.add_argument("--density", type=float, default=0.25,
                    help="SAP force_density (random weights degenerate top-p)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + tiny models on CPU (path validation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SAPConfig, SVGConfig, WarmupSchedule
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure_fenced as measure
    from sparse_videogen_tpu.utils.quant import quantize_linears_int8

    if jax.devices()[0].platform != "tpu" and not args.smoke:
        print(json.dumps({"metric": "cosmos14b_svg1_e2e_speedup", "value": 0.0,
                          "unit": "x", "vs_baseline": 0.0, "note": "no TPU"}))
        return

    # value always present (a consumer reading result["value"] must not
    # KeyError when --skip_cosmos is passed)
    out = {"metric": "cosmos14b_svg1_e2e_speedup", "unit": "x",
           "value": 0.0, "vs_baseline": 0.0}

    # ---- leg 1: Cosmos-14B 704x1280x121f (depth-composed, int8) ----------
    if not args.skip_cosmos:
        from sparse_videogen_tpu.models.cosmos import model as CM
        from sparse_videogen_tpu.pipelines.cosmos import cosmos_layout

        base = CM.COSMOS_14B
        height, width, frames, steps, tfp, lfp = 704, 1280, 121, 35, 0.3, 0.03
        ctx_len = 512
        if args.smoke:
            base = dataclasses.replace(base, num_attention_heads=2,
                                       attention_head_dim=32, num_layers=2 * UNIT,
                                       text_embed_dim=32, adaln_lora_dim=16)
            height, width, frames, ctx_len = 64, 96, 9, 8
        layout = cosmos_layout(base, height, width, frames)
        steps_proxy = np.linspace(1000.0, 0.0, steps, endpoint=False)
        warm = WarmupSchedule.from_fractions(lfp, tfp, base.num_layers, steps_proxy)
        # first_layers is constant across measured depths -> absorbed into the
        # linear fit's intercept -> the composed full-depth step carries
        # exactly floor(lfp * num_layers) dense layers (reference semantics)
        plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64), warm)

        unit_cfg = dataclasses.replace(base, num_layers=UNIT)
        params_unit = CM.init_cosmos_params(jax.random.PRNGKey(0), unit_cfg,
                                            dtype=jnp.bfloat16)
        params_unit["blocks"] = quantize_linears_int8(params_unit["blocks"])

        def tiled(u):
            p = dict(params_unit)
            p["blocks"] = jax.tree.map(
                lambda v: jnp.tile(v, (u,) + (1,) * (v.ndim - 1)), params_unit["blocks"])
            return p

        f_lat = layout.num_frames  # patch_t = 1
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (1, base.in_channels, f_lat, height // 8, width // 8),
                              jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2),
                                (1, ctx_len, base.text_embed_dim), jnp.bfloat16)

        def fit(name, runtime, warm_state=False):
            consts = runtime.consts()
            ts = []
            for u in args.units:
                cfg_r = dataclasses.replace(base, num_layers=UNIT * u)

                @jax.jit
                def fwd(params, x, t, ctx, states, consts):
                    return CM.cosmos_forward(
                        params, cfg_r, x, jnp.full((1,), t, jnp.float32), ctx,
                        attention=runtime, attn_states=states, attn_consts=consts,
                        rng=jax.random.PRNGKey(0))

                s0 = runtime.init_state(cfg_r.num_attention_heads,
                                        cfg_r.attention_head_dim, cfg_r.num_layers)
                params_u = tiled(u)
                if warm_state:
                    _, s0 = jax.block_until_ready(
                        fwd(params_u, x, 500.0, ctx, s0, consts))
                t_u = measure(lambda: fwd(params_u, x, 500.0, ctx, s0, consts),
                              iters=args.iters, warmup=1)
                print(f"[bench_cc] cosmos {name} u={u}: {t_u:.2f} s",
                      file=sys.stderr, flush=True)
                ts.append(t_u)
            b, a = np.polyfit(np.asarray(args.units, np.float64), np.asarray(ts), 1)
            full = a + (base.num_layers // UNIT) * b
            print(f"[bench_cc] cosmos {name}: full-depth {full:.2f} s",
                  file=sys.stderr, flush=True)
            return full

        t_dense = fit("dense", DenseRuntime(plan))
        t_svg = fit("svg1", SVG1Runtime(plan))
        n_warm = int(np.sum(steps_proxy > warm.first_times))
        # cond/uncond = two B=1 forwards per step for both patterns
        e2e = (steps * t_dense) / (n_warm * t_dense + (steps - n_warm) * t_svg)
        print(f"[bench_cc] cosmos14b 704x1280x121f (S={layout.seq_len}): dense "
              f"{2*t_dense:.2f} s/step, svg1 {2*t_svg:.2f} s/step, {n_warm} warm "
              f"-> e2e {e2e:.3f}x", file=sys.stderr, flush=True)
        out.update(value=round(e2e, 3), vs_baseline=round(e2e / 2.0, 3),
                   cosmos_dense_step_s=round(2 * t_dense, 3),
                   cosmos_svg1_step_s=round(2 * t_svg, 3))

        if not args.no_sap:
            # reference cosmos SVG2 config (cosmos_t2v_sap.sh): qc=400 kc=1000
            # top_p=0.9 min_kc=0.10 iter_init=50 iter_step=2 TFP=0.3; SAP leg
            # is best-effort (must not kill the svg1 result above)
            try:
                qc, kc, it = (6, 8, 3) if args.smoke else (400, 1000, 50)
                sap_cfg = SAPConfig(num_q_centroids=qc, num_k_centroids=kc,
                                    top_p_kmeans=0.9, min_kc_ratio=0.10,
                                    kmeans_iter_init=it, kmeans_iter_step=2,
                                    force_density=args.density)
                sap_rt = SAPRuntime(plan, sap_cfg,
                                    WarmupSchedule(first_layers=0, first_times=1001.0))
                t_cold = fit("sap-cold", sap_rt)
                t_warms = fit("sap-warm", sap_rt, warm_state=True)
                e2e_sap = (steps * t_dense) / (
                    n_warm * t_dense + t_cold + (steps - n_warm - 1) * t_warms)
                print(f"[bench_cc] cosmos sap: warm {2*t_warms:.2f} s/step "
                      f"(cold {2*t_cold:.2f}) -> e2e {e2e_sap:.3f}x",
                      file=sys.stderr, flush=True)
                out.update(cosmos_sap_e2e_speedup=round(e2e_sap, 3),
                           cosmos_sap_density=args.density)
            except Exception as e:
                print(f"[bench_cc] cosmos sap leg failed ({e!r})",
                      file=sys.stderr, flush=True)

    # ---- leg 2: CogVideoX1.5-5B I2V 1360x768x81f (whole-depth) -----------
    if not args.skip_cog:
        from sparse_videogen_tpu.models.cog import model as GM
        from sparse_videogen_tpu.pipelines.cog import cog_layout

        base = GM.COG_1_5_5B_I2V
        height, width, frames, steps, tfp, lfp = 768, 1360, 81, 50, 0.2, 0.025
        if args.smoke:
            base = dataclasses.replace(base, num_layers=2, hidden_size=128,
                                       heads_num=2, head_dim=64, text_len=16,
                                       text_dim=32, time_embed_dim=32)
            height, width, frames = 64, 96, 9
        layout = cog_layout(base, height, width, frames)
        steps_proxy = np.linspace(1000.0, 0.0, steps, endpoint=False)
        warm = WarmupSchedule.from_fractions(lfp, tfp, base.num_layers, steps_proxy)
        plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64), warm)

        params = GM.init_cog_params(jax.random.PRNGKey(0), base, dtype=jnp.bfloat16)
        if args.cog_quant == "int8":
            params["blocks"] = quantize_linears_int8(params["blocks"])

        f_lat = 1 + (frames - 1) // 4
        f_pad = f_lat + ((-f_lat) % base.patch_size_t)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (1, base.in_channels, f_pad, height // 8, width // 8),
                              jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2),
                                (1, base.text_len, base.text_dim), jnp.bfloat16)

        def step_t(runtime):
            consts = runtime.consts()

            @jax.jit
            def fwd(params, x, t, ctx, states, consts):
                return GM.cog_forward(
                    params, base, x, jnp.full((1,), t, jnp.float32), ctx,
                    attention=runtime, attn_states=states, attn_consts=consts,
                    rng=jax.random.PRNGKey(0))

            s0 = runtime.init_state(base.heads_num, base.head_dim, base.num_layers)
            return measure(lambda: fwd(params, x, 500.0, ctx, s0, consts),
                           iters=args.iters, warmup=1)

        t_dense = step_t(DenseRuntime(plan, prompt_length=base.text_len))
        t_svg = step_t(SVG1Runtime(plan, prompt_length=base.text_len))
        n_warm = int(np.sum(steps_proxy > warm.first_times))
        e2e = (steps * t_dense) / (n_warm * t_dense + (steps - n_warm) * t_svg)
        print(f"[bench_cc] cog1.5-5b 1360x768x81f (S={layout.seq_len}): dense "
              f"{2*t_dense:.2f} s/step, svg1 {2*t_svg:.2f} s/step, {n_warm} warm "
              f"-> e2e {e2e:.3f}x", file=sys.stderr, flush=True)
        out.update(cog5b_svg1_e2e_speedup=round(e2e, 3),
                   cog_dense_step_s=round(2 * t_dense, 3),
                   cog_svg1_step_s=round(2 * t_svg, 3))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
