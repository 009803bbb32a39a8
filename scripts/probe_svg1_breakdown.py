"""Decompose the SVG1 sparse op at hyvideo-720p scale on the TPU.

Stages: sample_mse profiler | placement fwd+inv (temporal_transpose+select) |
sparse kernel alone | full svg1_sparse_impl. The sum of the parts should
~match the whole; the largest part is the optimization target.

Usage: python scripts/probe_svg1_breakdown.py [--wan]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wan", action="store_true", help="Wan 1.3B 720p shape instead")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--block_q", type=int, default=None, help="override plan block_q")
    ap.add_argument("--qsplit", type=int, default=None, help="override sparse qsplit (stage c only)")
    args = ap.parse_args()

    from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.core import placement as P
    from sparse_videogen_tpu.core.profiler import best_mask_idx, sample_mse
    from sparse_videogen_tpu.sparse import svg1 as SVG1
    from sparse_videogen_tpu.sparse.runtimes import SVG1Runtime

    if args.wan:
        layout = VideoLayout(num_frames=21, frame_size=3600)
        H, pl = 12, None
        svg = SVGConfig(sparsity=0.3, num_sampled_rows=64)
    else:
        from sparse_videogen_tpu.models.hyvideo import model as HM
        from sparse_videogen_tpu.pipelines.hyvideo import hyvideo_layout

        base = HM.HYVIDEO_T2
        layout = hyvideo_layout(base, 720, 1280, 129)
        layout = dataclasses.replace(layout, prompt_length=70)
        H, pl = base.heads_num, 70
        svg = SVGConfig(sparsity=0.25, num_sampled_rows=64, profile_multiplier=1.5)

    plan = SVG1.make_svg1_plan(layout, svg, WarmupSchedule(first_layers=0, first_times=1001.0),
                               block_q=args.block_q)
    S = layout.seq_len
    log(f"S={S} H={H} kind={plan.mask_kind} sparse_exec=(bq={plan.block_q}, qs={plan.sparse_qsplit})")

    rt = SVG1Runtime(plan, prompt_length=pl)
    consts = rt.consts()
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, H, S, 128), jnp.bfloat16)

    # a) profiler
    prof = jax.jit(lambda q, key: best_mask_idx(sample_mse(
        q, q, q, plan.profile_preds(), key,
        num_sampled_rows=svg.num_sampled_rows,
        sample_mse_max_row=svg.sample_mse_max_row)))
    ta = timeit(prof, q, key, iters=args.iters)
    best = prof(q, key)
    log(f"a) sample_mse+argmin: {ta*1e3:8.1f} ms  (temporal heads: {int(np.asarray(best).sum())}/{H})")

    # b) placement fwd (x3 tensors) + inverse, with select
    def place_fn(q, best):
        is_t = (best == 1)[..., None, None]
        pl_ = lambda x: jnp.where(is_t, P.temporal_transpose(x, plan.layout), x)
        qp, kp, vp = pl_(q), pl_(q), pl_(q)
        o = P.temporal_transpose(qp + kp + vp, plan.layout, inverse=True)
        return jnp.where(is_t, o, qp)
    tb = timeit(jax.jit(place_fn), q, best, iters=args.iters)
    log(f"b) placement 3xfwd+inv: {tb*1e3:8.1f} ms")

    # c) kernel alone (classified metadata, aux)
    kern = jax.jit(lambda q, meta, aux: SVG1._run_kernel(
        q, q, q, meta, plan, plan.mask_spec, None, aux, qsplit=args.qsplit))
    tc = timeit(kern, q, consts["sparse_meta"], consts["aux"], iters=args.iters)
    log(f"c) sparse kernel:    {tc*1e3:8.1f} ms")

    # c2) dense kernel for reference
    kern_d = jax.jit(lambda q, meta, aux: SVG1._run_kernel(
        q, q, q, meta, plan, plan.dense_mask_spec, None, aux,
        block_q=plan.dense_exec[0], qsplit=plan.dense_exec[1]))
    tc2 = timeit(kern_d, q, consts["dense_meta"], consts["aux"], iters=max(2, args.iters // 2))
    log(f"c2) dense kernel:    {tc2*1e3:8.1f} ms")

    # d) full sparse impl
    full = jax.jit(lambda q, meta, aux, key: SVG1.svg1_sparse_impl(
        q, q, q, key, meta, plan, aux))
    td = timeit(full, q, consts["sparse_meta"], consts["aux"], key, iters=args.iters)
    log(f"d) full svg1 op:     {td*1e3:8.1f} ms   (a+b+c = {(ta+tb+tc)*1e3:.1f})")


if __name__ == "__main__":
    main()
