"""SVG1 attention-op benches at Cosmos and Cog production shapes (VERDICT r2
item 8): shows the sparse win is not Wan-shape-specific.

Configs (reference entry defaults):
  cosmos: 704x1280x121f, CV8x8x8 tokenizer, patch (1,2,2) -> nf=16,
          fs=44*80=3520, S=56,320; 32 heads D=128 (7B);
          band_sink masks (video-only self-attention).
  cog:    1360x768x81f (cog_inference.py sample), patch 2 / patch_t 2,
          nf=11, fs=(768/16)*(1360/16)=48*85=4080, S=44,880+226 text-FIRST;
          48 heads D=64 (CogVideoX1.5-5B) -> packed KV 2D=128 OK.

Measures dense vs SVG1 sparse op time per layer (B=1 x CFG handled by the
model level; attention batches over heads). Usage:
  python scripts/bench_shapes.py [cosmos] [cog]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SVGConfig, TextPosition, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.benchmark import measure_fenced

assert jax.devices()[0].platform == "tpu"


def run(name, layout, H, D, sparsity, prompt_length=None):
    plan = make_svg1_plan(layout, SVGConfig(sparsity=sparsity, num_sampled_rows=64),
                          WarmupSchedule())
    S = layout.seq_len
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (1, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (1, H, S, D), jnp.bfloat16)
    for label, rt in [("dense", DenseRuntime(plan, prompt_length=prompt_length)),
                      ("svg1", SVG1Runtime(plan, prompt_length=prompt_length))]:
        consts = rt.consts()
        st = rt.init_state(H, D, 1)

        @jax.jit
        def op(q, k, v, consts, st):
            out, _ = rt(q, k, v, jnp.float32(500.0), jax.random.PRNGKey(1),
                        jnp.int32(0), jax.tree.map(lambda s: s[0], st), consts)
            return out

        t = measure_fenced(lambda: op(q, k, v, consts, st), iters=3, warmup=1)
        print(f"{name} {label}: {t*1e3:8.1f} ms/op (S={S}, H={H}, D={D})", flush=True)


def main():
    which = sys.argv[1:] or ["cosmos", "cog"]
    if "cosmos" in which:
        # 704x1280x121f: nf = (1 + 120//8) // 1 = 16, fs = (704/16)*(1280/16)
        run("cosmos-704x1280x121f",
            VideoLayout(num_frames=16, frame_size=44 * 80), H=32, D=128,
            sparsity=0.25)
    if "cog" in which:
        # 1360x768x81f: f_lat = 21 -> pad 22 -> nf 11; fs = 48*85 = 4080;
        # text FIRST 226 tokens
        run("cog-1360x768x81f",
            VideoLayout(num_frames=11, frame_size=4080, context_length=226,
                        text_position=TextPosition.FIRST),
            H=48, D=64, sparsity=0.3, prompt_length=226)


if __name__ == "__main__":
    main()
