"""A/B the exp2-domain softmax in the chunked kernel on the real TPU.

The runs-expand kernel measured 376 -> 369 ms from folding log2(e) into the
q scale and using the VPU-native exp2 (jnp.exp lowers to exp2(x*log2e) with
an extra full-tile multiply per chunk). This probe measures the same change
on the chunked-CSR kernel at the two production masked configs:

  1. wan-svg1-sparse: S=75,600, BH=24, band+sink, cheap-classified metadata
     (the steady-state SVG1 kernel, 192.8 ms best in NOTES_ROUND3).
  2. hyv-dense: S=119,056, BH=24, text-last real/fake, cheap-classified
     (1259 ms best in NOTES_ROUND3).

Usage: python scripts/probe_exp2.py [wan] [hyv] [dense32k]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.benchmark import measure_fenced

assert jax.devices()[0].platform == "tpu"

BQ, BKV, QSPLIT = 1024, 1024, 4


def ab(name, layout_args, spec_of, meta_of, aux_of, BH):
    layout = VideoLayout(**layout_args)
    plan = make_svg1_plan(
        layout, SVGConfig(sparsity=0.25, profile_multiplier=1.5),
        WarmupSchedule(), block_q=BQ, block_kv=BKV,
    )
    spec = spec_of(plan)
    meta = meta_of(plan)
    aux = aux_of(plan)
    aux_np = None if aux is None else np.asarray(aux)
    meta = jnp.asarray(MD.classify_cheap_np(
        meta, spec, aux_np, block_q=BQ, block_kv=BKV, seq_q=layout.seq_len))
    Sq, Skv = plan.seq_pad_q, plan.seq_pad_kv
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (BH, Sq, 128), jnp.bfloat16)
    kvp = pack_kv(
        jax.random.normal(kk, (BH, Skv, 128), jnp.bfloat16),
        jax.random.normal(kv_, (BH, Skv, 128), jnp.bfloat16),
    )
    outs = {}
    for use_exp2 in (False, True):
        t = measure_fenced(
            lambda: block_sparse_attention_kv(
                q, kvp, meta, aux, block_q=BQ, block_kv=BKV, mask_spec=spec,
                qsplit=QSPLIT, use_exp2=use_exp2,
            ),
            iters=3, warmup=1,
        )
        outs[use_exp2] = block_sparse_attention_kv(
            q, kvp, meta, aux, block_q=BQ, block_kv=BKV, mask_spec=spec,
            qsplit=QSPLIT, use_exp2=use_exp2)
        print(f"{name} use_exp2={use_exp2}: {t*1e3:7.1f} ms", flush=True)
    # scalar device-side reduction: pulling the full (BH, S, D) outputs over
    # the axon tunnel is ~0.5 GB per leg
    err = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                - outs[False].astype(jnp.float32))))
    print(f"{name} max |exp2 - exp| = {err:.3e}", flush=True)


def main():
    which = sys.argv[1:] or ["wan", "hyv"]
    if "wan" in which:
        ab("wan-svg1-sparse", dict(num_frames=21, frame_size=3600),
           lambda p: p.mask_spec, lambda p: p.sparse_meta(), lambda p: None, 24)
    if "hyv" in which:
        from sparse_videogen_tpu.config import TextPosition
        ab("hyv-dense",
           dict(num_frames=33, frame_size=3600, context_length=256,
                text_position=TextPosition.LAST, prompt_length=70),
           lambda p: p.dense_mask_spec, lambda p: p.dense_meta(),
           lambda p: jnp.asarray([p.layout.video_length + 70, 0, 0, 0], jnp.int32),
           24)


if __name__ == "__main__":
    main()
