"""Experiment: ping-pong q-tiles inside one grid step (dense attention).

Hypothesis (NOTES round-2 item: 'multi-q-tile shared-KV scheduling'): two
q sub-tiles with INDEPENDENT online-softmax states per KV chunk give the
scheduler two dependency chains — VPU softmax of tile A can hide under
tile B's MXU matmuls — without the state-merge cost that made the
split-stream (kv-interleaved) unroll lose 4%.

Standalone kernel (dense only) so the production kernel stays untouched
until the idea wins. Usage: python scripts/bench_qsplit.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_videogen_tpu.utils.benchmark import measure

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(q_ref, kv_ref, o_ref, kvbuf, kv_sems, *, bq, bkv, D, nkv, nbuf, qsplit, scale):
    b = pl.program_id(0)

    def kv_copy(slot, c):
        return pltpu.make_async_copy(
            kv_ref.at[b, pl.ds(c * bkv, bkv), :], kvbuf.at[slot], kv_sems.at[slot]
        )

    for w in range(nbuf - 1):
        kv_copy(w, w).start()

    SQ = bq // qsplit
    q_s = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    qs = [q_s[t * SQ : (t + 1) * SQ] for t in range(qsplit)]

    def body(c, carry):
        states = list(carry)
        slot = c % nbuf

        @pl.when(c + nbuf - 1 < nkv)
        def _():
            kv_copy((c + nbuf - 1) % nbuf, c + nbuf - 1).start()

        kv_copy(slot, c).wait()
        k_blk = kvbuf[slot][:, :D]
        v_blk = kvbuf[slot][:, D:]
        for t in range(qsplit):
            acc, m, l = states[3 * t : 3 * t + 3]
            s = jax.lax.dot_general(
                qs[t], k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            states[3 * t : 3 * t + 3] = [acc * alpha + pv, m_new, l]
        return tuple(states)

    init = ()
    for _ in range(qsplit):
        init += (
            jnp.zeros((SQ, D), jnp.float32),
            jnp.full((SQ, 1), NEG_INF, jnp.float32),
            jnp.zeros((SQ, 1), jnp.float32),
        )
    states = jax.lax.fori_loop(0, nkv, body, init)
    outs = [states[3 * t] / jnp.maximum(states[3 * t + 2], 1e-20) for t in range(qsplit)]
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bkv", "nbuf", "qsplit"))
def dense_attn(q, kv, *, bq, bkv, nbuf=2, qsplit=1):
    BH, S, D2 = q.shape[0], q.shape[1], kv.shape[2]
    D = D2 // 2
    kern = functools.partial(
        _kernel, bq=bq, bkv=bkv, D=D, nkv=kv.shape[1] // bkv, nbuf=nbuf,
        qsplit=qsplit, scale=D ** -0.5,
    )
    return pl.pallas_call(
        kern,
        grid=(BH, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, bkv, D2), kv.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
    )(q, kv)


def main():
    assert jax.devices()[0].platform == "tpu"
    from sparse_videogen_tpu.ops.attention import pack_kv

    BH, S, D = 12, 32768, 128
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (BH, S, D), jnp.bfloat16)
    kvp = pack_kv(
        jax.random.normal(kk, (BH, S, D), jnp.bfloat16),
        jax.random.normal(kv_, (BH, S, D), jnp.bfloat16),
    )
    flops = 4 * S * S * D * BH

    # sanity vs production kernel output
    import numpy as np

    from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv
    from sparse_videogen_tpu.ops.metadata import dense_meta

    meta = jnp.asarray(dense_meta(S, S, block_q=512, block_kv=1024))
    ref = block_sparse_attention_kv(q[:1, :4096], kvp[:1, :4096], jnp.asarray(dense_meta(4096, 4096, block_q=512, block_kv=1024)), block_q=512, block_kv=1024)
    got = dense_attn(q[:1, :4096], kvp[:1, :4096], bq=1024, bkv=1024, qsplit=2)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"[sanity] max abs diff vs production: {err:.4f}", flush=True)

    import itertools
    cfgs = [
        (512, 1024, 2, 1),
        (512, 1024, 2, 2),
        (512, 1024, 2, 4),
        (1024, 1024, 2, 4),
        (1024, 1024, 2, 8),
        (2048, 1024, 2, 4),
        (2048, 1024, 2, 8),
        (4096, 1024, 2, 8),
        (2048, 1024, 3, 4),
    ]
    for bq, bkv, nbuf, qsplit in cfgs:
        try:
            t = measure(lambda: dense_attn(q, kvp, bq=bq, bkv=bkv, nbuf=nbuf, qsplit=qsplit), iters=5, warmup=2)
            print(f"bq={bq} bkv={bkv} nbuf={nbuf} qsplit={qsplit}: {flops/t/1e12:7.1f} TFLOPs ({t*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"bq={bq} bkv={bkv} nbuf={nbuf} qsplit={qsplit}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
