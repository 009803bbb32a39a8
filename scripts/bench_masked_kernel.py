"""Masked-path kernel sweep on the real TPU (VERDICT r2 item 4).

Two production scenarios:
  1. SVG1 sparse at Wan 720p: S=75,600, BH=24 (B=2 CFG x 12 heads),
     band+sink spec, sparse band metadata (the steady-state SVG1 kernel —
     202 ms/op after round-2's m_safe work).
  2. hyvideo DENSE at 720p x 129f: S=119,056, BH=24, text-last real/fake
     spec, full metadata (the hyvideo dense baseline path - 2.66 s/op
     before the fast-predicate rewrite).

Sweeps (block_q, qsplit) over the fast masked path. Compare against the
numbers recorded in the docstrings/NOTES to judge the hoisted-predicate
rewrite and whether masked paths now profit from qsplit > 2.

Usage: python scripts/bench_masked_kernel.py [wan] [hyv]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SVGConfig, WarmupSchedule
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.benchmark import measure_fenced

assert jax.devices()[0].platform == "tpu"

GRID = [(512, 1), (512, 2), (512, 4), (1024, 2), (1024, 4), (1024, 8)]


def sweep(name, layout_args, spec_of, meta_of, aux_of, BH):
    from sparse_videogen_tpu.config import VideoLayout

    layout = VideoLayout(**layout_args)
    for bq, qsplit in GRID:
        plan = make_svg1_plan(
            layout,
            SVGConfig(sparsity=0.25, profile_multiplier=1.5),
            WarmupSchedule(),
            block_q=bq,
            block_kv=1024,
        )
        spec = spec_of(plan)
        meta = meta_of(plan)
        aux = aux_of(plan)
        if "--classified" in sys.argv:
            import numpy as np

            from sparse_videogen_tpu.ops import metadata as MD

            aux_np = None if aux is None else np.asarray(aux)
            meta = MD.classify_cheap_np(meta, spec, aux_np, block_q=bq,
                                        block_kv=1024, seq_q=layout.seq_len)
            n_cheap = (np.asarray(meta)[..., 0] // MD.N_CHEAP_SCALE).sum()
            n_tot = (np.asarray(meta)[..., 0] % MD.N_CHEAP_SCALE).sum()
            print(f"{name} bq={bq}: cheap {n_cheap}/{n_tot} chunks", flush=True)
        meta = jnp.asarray(meta)
        Sq = plan.seq_pad_q
        Skv = plan.seq_pad_kv
        kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (BH, Sq, 128), jnp.bfloat16)
        kvp = pack_kv(
            jax.random.normal(kk, (BH, Skv, 128), jnp.bfloat16),
            jax.random.normal(kv_, (BH, Skv, 128), jnp.bfloat16),
        )
        try:
            t = measure_fenced(
                lambda: block_sparse_attention_kv(
                    q, kvp, meta, aux, block_q=bq, block_kv=1024, mask_spec=spec,
                    qsplit=qsplit,
                ),
                iters=3, warmup=1,
            )
            print(f"{name} bq={bq} qsplit={qsplit}: {t*1e3:7.1f} ms", flush=True)
        except Exception as e:
            print(f"{name} bq={bq} qsplit={qsplit}: FAIL {type(e).__name__} {str(e)[:100]}",
                  flush=True)


def main():
    which = sys.argv[1:] or ["wan", "hyv"]
    if "wan" in which:
        sweep(
            "wan-svg1-sparse",
            dict(num_frames=21, frame_size=3600),
            lambda plan: plan.mask_spec,
            lambda plan: plan.sparse_meta(),
            lambda plan: None,
            24,
        )
    if "hyv" in which:
        from sparse_videogen_tpu.config import TextPosition

        sweep(
            "hyv-dense",
            dict(num_frames=33, frame_size=3600, context_length=256,
                 text_position=TextPosition.LAST, prompt_length=70),
            lambda plan: plan.dense_mask_spec,
            lambda plan: plan.dense_meta(),
            lambda plan: jnp.asarray([plan.layout.video_length + 70, 0, 0, 0], jnp.int32),
            24,
        )


if __name__ == "__main__":
    main()
