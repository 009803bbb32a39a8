"""Wan 2.1 benches for the two BASELINE rows not covered elsewhere:

1. **T2V 480p** (ref: dense 8:05 vs SVG 6:11 = 1.32x H100,
   /root/reference/README.md:128): Wan 1.3B at 480p token count
   (832x480x81f -> latent (21, 60, 104) -> S = 21*30*52 = 32,760), B=2 CFG
   pair, reference T2V defaults (sparsity 0.25, TFP 0.075, LFP 0.025,
   /root/reference/wan_t2v_inference.py:84-97), 50 steps.
   The interesting question this answers: does the SVG1 win survive the
   3x shorter sequence, where attention is a smaller share of the step?

2. **I2V 14B 720p** (ref: dense 24:05 vs SVG 16:03 = 1.50x H100,
   /root/reference/README.md:129): the I2V model (in_dim=36 latent+mask
   concat, CLIP image tokens through img_emb into a 257-token cross-attn
   branch) at full 720p sequence, depth-composed like bench_wan14b.py
   (int8 W8A8 block linears; one unit = 4 layers, linear fit over units),
   reference I2V SVG config (sparsity 0.3, TFP 0.35, LFP 0.03, 40 steps,
   /root/reference/scripts/wan/wan_i2v_720p_svg.sh).

Methodology identical to bench_wan_e2e.py / bench_wan14b.py (full-DiT
fenced step times, blend over the reference schedule). Prints ONE JSON
line with both legs; detail on stderr. Not part of the bench.py headline —
run manually; numbers recorded in NOTES_ROUND3.md / README.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_480P, REF_I2V = 1.32, 1.50
UNIT = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--skip_480p", action="store_true")
    ap.add_argument("--skip_i2v", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + tiny model, runs on CPU (path validation only)")
    ap.add_argument("--budget", type=float, default=0,
                    help="soft wall-clock budget in seconds (0 = unlimited); "
                         "the i2v leg is skipped when exhausted (a 480p JSON "
                         "snapshot is emitted after leg 1)")
    args = ap.parse_args()
    t_start = time.monotonic()

    def rem():
        return (args.budget - (time.monotonic() - t_start)) if args.budget else 1e9

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.models.wan import model as WM
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure_fenced as measure
    from sparse_videogen_tpu.utils.quant import quantize_linears_int8

    if jax.devices()[0].platform != "tpu" and not args.smoke:
        print(json.dumps({"metric": "wan_480p_svg1_e2e_speedup", "value": 0.0,
                          "unit": "x", "vs_baseline": 0.0, "note": "no TPU"}))
        return

    def shrink(c):
        return dataclasses.replace(c, dim=128, ffn_dim=256, num_heads=2,
                                   num_layers=2, text_len=16, text_dim=64)

    out = {"metric": "wan_480p_svg1_e2e_speedup", "unit": "x",
           "value": 0.0, "vs_baseline": 0.0}

    # ---- leg 1: 1.3B T2V 480p --------------------------------------------
    if not args.skip_480p:
        cfg = WM.WAN_1_3B
        F, H, W = 21, 60, 104
        if args.smoke:
            cfg, (F, H, W) = shrink(cfg), (3, 12, 20)
        layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
        steps = np.linspace(1000.0, 0.0, 50, endpoint=False)
        warm = WarmupSchedule.from_fractions(0.025, 0.075, cfg.num_layers, steps)
        plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64), warm)

        params = WM.init_wan_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        B = 2
        x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.in_dim, F, H, W), jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)

        def step_t(runtime):
            consts = runtime.consts()

            @jax.jit
            def fwd(params, x, t, ctx, states, consts):
                return WM.wan_forward(
                    params, cfg, x, jnp.full((B,), t, jnp.float32), ctx,
                    attention=runtime, attn_states=states, attn_consts=consts,
                    rng=jax.random.PRNGKey(0))

            s0 = runtime.init_state(B * cfg.num_heads, cfg.head_dim, cfg.num_layers)
            return measure(lambda: fwd(params, x, 500.0, ctx, s0, consts),
                           iters=args.iters, warmup=1)

        t_dense = step_t(DenseRuntime(plan))
        t_svg = step_t(SVG1Runtime(plan))
        n_warm = int(np.sum(steps > warm.first_times))
        e2e = (50 * t_dense) / (n_warm * t_dense + (50 - n_warm) * t_svg)
        print(f"[bench_extra] 480p (S={layout.seq_len}): dense {t_dense:.2f} s, "
              f"svg1 {t_svg:.2f} s -> e2e {e2e:.3f}x (ref {REF_480P})",
              file=sys.stderr, flush=True)
        out.update(value=round(e2e, 3), vs_baseline=round(e2e / REF_480P, 3),
                   dense_step_s=round(t_dense, 3), svg1_step_s=round(t_svg, 3))
        # partial snapshot (driver takes the LAST JSON line)
        print(json.dumps(out), flush=True)
        # free the 1.3B params/activations before the 14B leg: keeping them
        # alive OOMed the i2v dense fit on the 16 GB chip (measured r4)
        del params, x, ctx, step_t
        import gc

        gc.collect()

    if rem() <= 0:
        print("[bench_extra] budget exhausted; skipping i2v leg",
              file=sys.stderr, flush=True)
        return

    # ---- leg 2: 14B I2V 720p (depth-composed, int8) ----------------------
    if not args.skip_i2v:
        # 2 layers per unit (vs 4 for T2V): the i2v variant's extra
        # k_img/v_img weights + image branch pushed u=2 x 4-layer past the
        # 16 GB chip (RESOURCE_EXHAUSTED, measured r4); same linear-fit
        # methodology, full model = 20 units
        UNIT_I = 2 if not args.smoke else UNIT
        base = dataclasses.replace(WM.WAN_14B, model_type="i2v", in_dim=36)
        F, H, W = 21, 90, 160
        if args.smoke:
            base = dataclasses.replace(shrink(base), model_type="i2v", in_dim=36,
                                       num_layers=2 * UNIT, image_dim=64)
            F, H, W = 3, 12, 20
        layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
        steps = np.linspace(1000.0, 0.0, 40, endpoint=False)
        warm = WarmupSchedule.from_fractions(0.03, 0.35, base.num_layers, steps)
        plan = make_svg1_plan(layout, SVGConfig(sparsity=0.3, num_sampled_rows=64), warm)

        unit_cfg = dataclasses.replace(base, num_layers=UNIT_I)
        params_unit = WM.init_wan_params(jax.random.PRNGKey(0), unit_cfg, dtype=jnp.bfloat16)
        params_unit["blocks"] = quantize_linears_int8(params_unit["blocks"])

        def tiled(u):
            p = dict(params_unit)
            p["blocks"] = jax.tree.map(
                lambda v: jnp.tile(v, (u,) + (1,) * (v.ndim - 1)), params_unit["blocks"])
            return p

        x = jax.random.normal(jax.random.PRNGKey(1), (1, base.in_dim, F, H, W), jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, base.text_len, base.text_dim), jnp.bfloat16)
        fea = jax.random.normal(jax.random.PRNGKey(3), (1, 257, base.image_dim), jnp.bfloat16)

        def fit(name, runtime):
            consts = runtime.consts()
            ts = []
            for u in args.units:
                cfg_r = dataclasses.replace(base, num_layers=UNIT_I * u)

                @jax.jit
                def fwd(params, x, t, ctx, fea, states, consts):
                    return WM.wan_forward(
                        params, cfg_r, x, jnp.full((1,), t, jnp.float32), ctx,
                        clip_fea=fea, attention=runtime, attn_states=states,
                        attn_consts=consts, rng=jax.random.PRNGKey(0))

                s0 = runtime.init_state(cfg_r.num_heads, cfg_r.head_dim, cfg_r.num_layers)
                # hoist the tiled params: tiling inside the measure lambda
                # re-materializes ~GBs per iteration and OOMed u=2 on the
                # 16 GB chip (two tiled copies alive at once)
                params_u = tiled(u)
                t_u = measure(lambda: fwd(params_u, x, 500.0, ctx, fea, s0, consts),
                              iters=args.iters, warmup=1)
                del params_u
                jax.clear_caches()  # free the previous unit's executables
                print(f"[bench_extra] i2v {name} u={u}: {t_u:.2f} s",
                      file=sys.stderr, flush=True)
                ts.append(t_u)
            b, a = np.polyfit(np.asarray(args.units, np.float64), np.asarray(ts), 1)
            full = a + (base.num_layers // UNIT_I) * b
            print(f"[bench_extra] i2v {name}: full-depth {full:.2f} s",
                  file=sys.stderr, flush=True)
            return full

        t_dense = fit("dense", DenseRuntime(plan))
        t_svg = fit("svg1", SVG1Runtime(plan))
        n_warm = int(np.sum(steps > warm.first_times))
        # cond/uncond as two B=1 forwards per step (same for both patterns)
        e2e = (40 * t_dense) / (n_warm * t_dense + (40 - n_warm) * t_svg)
        print(f"[bench_extra] i2v 14B 720p: dense {2*t_dense:.2f} s/step, "
              f"svg1 {2*t_svg:.2f} s/step, {n_warm} warm steps -> e2e {e2e:.3f}x "
              f"(ref {REF_I2V})", file=sys.stderr, flush=True)
        out.update(i2v14b_720p_svg1_e2e_speedup=round(e2e, 3),
                   i2v14b_vs_ref=round(e2e / REF_I2V, 3),
                   i2v_dense_step_s=round(2 * t_dense, 3),
                   i2v_svg1_step_s=round(2 * t_svg, 3))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
