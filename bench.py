"""Headline benchmark: sparse-attention speedup vs dense at Wan 720p scale.

Run on one real TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N / 1.51}
vs_baseline compares against the reference's published Wan 2.1 T2V 720p
end-to-end SVG speedup on H100 (1.51x, BASELINE.md) — the reference's own
headline for this config; our number is the attention-operator speedup that
drives it.

Extra context lines (per-op timings) go to stderr.
"""

import json
import math
import sys

import numpy as np  # noqa: F401 (kept for ad-hoc analysis)


def main():
    import jax
    import jax.numpy as jnp

    from sparse_videogen_tpu.config import SVGConfig, VideoLayout
    from sparse_videogen_tpu.sparse.svg1 import (
        dense_attention_kernel,
        make_svg1_plan,
        svg1_sparse_attention,
    )
    from sparse_videogen_tpu.utils.benchmark import measure

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        print(
            json.dumps(
                {"metric": "wan_720p_svg1_attn_speedup_vs_dense", "value": 0.0,
                 "unit": "x", "vs_baseline": 0.0, "note": "no TPU available"}
            )
        )
        return

    # Wan 2.1 14B 720p T2V: 1280x720, 81 frames -> 21 latent frames x
    # (80x45=3600) tokens; 40 heads x 128 head_dim (SURVEY.md section 6 config).
    layout = VideoLayout(num_frames=21, frame_size=3600)
    BH, D = 40, 128
    S = layout.seq_len
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.25))

    # generate on-device: host->device transfer of 2.3 GB through this
    # environment's TPU relay costs minutes
    shape = (1, BH, S, D)
    kq, kk, kv, key = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    t_dense = measure(lambda: dense_attention_kernel(q, k, v, plan), iters=3, warmup=1)
    t_svg1 = measure(lambda: svg1_sparse_attention(q, k, v, key, plan), iters=3, warmup=1)
    flops = 4 * S * S * D * BH
    print(
        f"[bench] wan720p S={S} BH={BH}: dense {t_dense*1e3:.1f} ms "
        f"({flops/t_dense/1e12:.1f} TFLOPs), svg1 {t_svg1*1e3:.1f} ms "
        f"(profiling+placement+sparse kernel)",
        file=sys.stderr,
    )
    speedup = t_dense / t_svg1
    print(
        json.dumps(
            {
                "metric": "wan_720p_svg1_attn_speedup_vs_dense",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / 1.51, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
