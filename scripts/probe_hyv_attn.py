"""Bring-up probe: hyvideo-720p-scale pieces in isolation on the TPU.

Stages (each printed with flush so a worker crash pinpoints the stage):
  1. dense attention op at S=119,056, H=24 (text-last hyvideo mask)
  2. svg1 sparse op at the same scale
  3. one full u=1 (2 double + 4 single) hyvideo forward, dense

Usage: python scripts/probe_hyv_attn.py [stage...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    stages = [int(s) for s in sys.argv[1:]] or [1, 2, 3]
    from sparse_videogen_tpu.config import SVGConfig, WarmupSchedule
    from sparse_videogen_tpu.models.hyvideo import model as HM
    from sparse_videogen_tpu.pipelines.hyvideo import hyvideo_layout
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan

    base = HM.HYVIDEO_T2
    layout = hyvideo_layout(base, 720, 1280, 129)
    layout = dataclasses.replace(layout, prompt_length=70)
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25, num_sampled_rows=64,
                                            profile_multiplier=1.5),
                          WarmupSchedule(first_layers=0, first_times=1001.0))
    S = layout.seq_len
    H = base.heads_num
    log(f"layout S={S} video={layout.video_length} dense_exec={plan.dense_exec}")

    if 1 in stages or 2 in stages:
        q = jax.random.normal(jax.random.PRNGKey(0), (1, H, S, 128), jnp.bfloat16)
        for stage, rt in [(1, DenseRuntime(plan, prompt_length=70)),
                          (2, SVG1Runtime(plan, prompt_length=70))]:
            if stage not in stages:
                continue
            consts = rt.consts()
            st = rt.init_state(H, 128, 1)

            @jax.jit
            def op(q, consts, st):
                out, _ = rt(q, q, q, jnp.float32(500.0), jax.random.PRNGKey(1),
                            jnp.int32(0), jax.tree.map(lambda s: s[0], st), consts)
                return out

            t0 = time.time()
            o = op(q, consts, st)
            fence(o)
            log(f"stage {stage} compiled+ran in {time.time()-t0:.1f}s")
            t0 = time.time()
            fence(op(q, consts, st))
            log(f"stage {stage} steady: {time.time()-t0:.2f}s")

    if 3 in stages:
        from sparse_videogen_tpu.utils.quant import quantize_linears_fp8

        cfg = dataclasses.replace(base, mm_double_blocks_depth=2, mm_single_blocks_depth=4)
        params = quantize_linears_fp8(
            HM.init_hyvideo_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
        log("stage 3 params ready")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_channels, 33, 90, 160), jnp.bfloat16)
        text = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_states_dim), jnp.bfloat16)
        mask = (jnp.arange(cfg.text_len) < 70).astype(jnp.int32)[None]
        pooled = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.text_states_dim_2), jnp.bfloat16)
        rt = DenseRuntime(plan, prompt_length=70)
        consts = rt.consts()

        @jax.jit
        def fwd(params, x, consts):
            states = rt.init_state(cfg.heads_num, cfg.head_dim, 6)
            v, _ = HM.hyvideo_forward(params, cfg, x, jnp.full((1,), 500.0, jnp.float32),
                                      text, mask, pooled,
                                      guidance=jnp.full((1,), 6000.0, jnp.float32),
                                      attention=rt, attn_states=states,
                                      attn_consts=consts, rng=jax.random.PRNGKey(0))
            return v

        t0 = time.time()
        fence(fwd(params, x, consts))
        log(f"stage 3 compiled+ran in {time.time()-t0:.1f}s")
        t0 = time.time()
        fence(fwd(params, x, consts))
        log(f"stage 3 steady: {time.time()-t0:.2f}s")
    log("probe done")


if __name__ == "__main__":
    main()
