"""Dense-metadata kernel throughput sweep on the real TPU.

Usage: python scripts/bench_kernel.py
Prints TFLOPs for (block_q, block_kv, nbuf, unroll) combos at the docstring
reference shape (S=32k, 12 heads, D=128, bf16).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.ops.metadata import dense_meta
from sparse_videogen_tpu.utils.benchmark import measure

assert jax.devices()[0].platform == "tpu"

BH, S, D = 12, 32768, 128
kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (BH, S, D), jnp.bfloat16)
kvp = pack_kv(
    jax.random.normal(kk, (BH, S, D), jnp.bfloat16),
    jax.random.normal(kv_, (BH, S, D), jnp.bfloat16),
)
flops = 4 * S * S * D * BH

for bq in (512, 1024, 2048):
    for bkv in (512, 1024):
        for nbuf, unroll, qsplit in (
            (2, 1, 1), (3, 1, 1), (2, 2, 1), (2, 1, 2), (2, 1, 4), (2, 1, 8),
        ):
            if bq // qsplit < 128:
                continue
            try:
                meta = jnp.asarray(dense_meta(S, S, block_q=bq, block_kv=bkv))
                t = measure(
                    lambda: block_sparse_attention_kv(
                        q, kvp, meta, block_q=bq, block_kv=bkv, nbuf=nbuf,
                        unroll=unroll, qsplit=qsplit,
                    ),
                    iters=5, warmup=2,
                )
                print(f"bq={bq} bkv={bkv} nbuf={nbuf} unroll={unroll} qsplit={qsplit}: "
                      f"{t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TFLOPs", flush=True)
            except Exception as e:
                print(f"bq={bq} bkv={bkv} nbuf={nbuf} unroll={unroll} qsplit={qsplit}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
