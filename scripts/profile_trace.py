"""jax.profiler trace + XLA cost-analysis cross-check of the headline step.

VERDICT r3 item 10: every perf number so far rests on the bespoke
fenced-readback timer (utils/benchmark.measure_fenced — needed because
block_until_ready can lie through the axon tunnel). This script produces two
independent cross-checks of one production step and records them:

1. **XLA cost analysis**: compiled.cost_analysis() FLOPs / bytes-accessed of
   the jitted step; with the fenced wall time this gives implied TFLOPs and
   HBM GB/s, which must land under the v5e roofline (197 bf16 TFLOPs,
   819 GB/s) and above the absurd (a wrong timer shows up as >roofline or
   ~0 utilization).
2. **jax.profiler trace** (--trace): a real device trace written to
   PROFILE_r04/ for offline inspection; the summary line records the trace
   size and the wall time measured *by the trace window* as a third clock.

Runs the Wan 1.3B 720p SVG1 step (the wan leg of bench_wan_e2e.py, same
jit program). Prints one JSON line; detail on stderr.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true", help="also write a profiler trace")
    ap.add_argument("--trace_dir", default=os.path.join(REPO, "PROFILE_r04"))
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.models.wan import model as WM
    from sparse_videogen_tpu.sparse.runtimes import SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure_fenced

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"note": "no TPU; profile cross-check not run"}))
        return

    cfg = WM.WAN_1_3B
    F, H, W = 21, 90, 160
    layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64),
                          WarmupSchedule())
    runtime = SVG1Runtime(plan)
    consts = runtime.consts()
    params = WM.init_wan_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.in_dim, F, H, W), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    states = runtime.init_state(B * cfg.num_heads, cfg.head_dim, cfg.num_layers)

    def step(params, x, t, ctx, states, consts):
        v, st = WM.wan_forward(params, cfg, x, jnp.full((B,), t, jnp.float32), ctx,
                               attention=runtime, attn_states=states,
                               attn_consts=consts, rng=jax.random.PRNGKey(0))
        return v

    lowered = jax.jit(step).lower(params, x, 500.0, ctx, states, consts)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    # CAVEAT (measured): XLA cost_analysis counts a lax.scan BODY once, not
    # x num_layers, and Pallas custom calls report 0 FLOPs — the raw number
    # (13.3 TFLOP here ~= one transformer layer at B=2) is NOT the step's
    # work. Keep it as recorded evidence of that semantics and use an
    # analytic matmul count for the utilization cross-check.
    flops_xla = float(ca.get("flops", 0.0))
    bytes_xla = float(ca.get("bytes accessed", 0.0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    S_tok = layout.seq_len
    # linear-layer MACs: ~params x tokens; x2 FLOP/MAC; x B (CFG pair);
    # attention (Pallas) adds ~2 x 2 x S^2 x D x H_eff sparse-masked — use
    # the dense-equivalent x the SVG1 measured ~3x reduction as a band
    flops_lin = 2.0 * n_params * S_tok * B
    fn = jax.jit(step)
    t_step = measure_fenced(lambda: fn(params, x, 500.0, ctx, states, consts),
                            iters=args.iters, warmup=1)
    tflops = flops_lin / t_step / 1e12
    print(f"[profile] fenced step {t_step:.3f} s; analytic linear FLOPs "
          f"{flops_lin/1e12:.0f} TFLOP -> implied >= {tflops:.0f} TFLOPs "
          f"utilization floor (v5e roofline 197); XLA cost_analysis reports "
          f"{flops_xla/1e12:.1f} TFLOP / {bytes_xla/1e9:.1f} GB (scan body "
          f"counted once — recorded, not used)", file=sys.stderr, flush=True)

    trace_info = None
    if args.trace:
        os.makedirs(args.trace_dir, exist_ok=True)
        t0 = time.time()
        with jax.profiler.trace(args.trace_dir):
            fn(params, x, 500.0, ctx, states, consts)[0].block_until_ready()
        wall = time.time() - t0
        files = glob.glob(os.path.join(args.trace_dir, "**", "*"), recursive=True)
        total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
        trace_info = {"dir": args.trace_dir, "files": len(files),
                      "bytes": total, "traced_step_wall_s": round(wall, 3)}
        print(f"[profile] trace: {len(files)} files, {total/1e6:.1f} MB, "
              f"traced-step wall {wall:.3f} s", file=sys.stderr, flush=True)

    out = {
        "metric": "wan_720p_svg1_step_cross_check",
        "fenced_step_s": round(t_step, 4),
        "analytic_linear_tflop": round(flops_lin / 1e12, 1),
        "implied_tflops_floor": round(tflops, 1),
        "xla_cost_tflop_scan_body_once": round(flops_xla / 1e12, 2),
        "xla_cost_gb_scan_body_once": round(bytes_xla / 1e9, 2),
        "roofline": {"bf16_tflops": 197, "hbm_gbps": 819},
        "sane": bool(0.05 * 197 < tflops < 210),
        "trace": trace_info,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
