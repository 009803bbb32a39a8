"""Cross-attention cost probe (Wan text + I2V image branches), real TPU.

Wan cross-attends S=75,600 queries against a short context: text (512
padded tokens) every layer, plus the I2V image branch (257 CLIP tokens).
The model path (`models/wan/model.py _cross_attention_dense`) is a plain
einsum -> f32 softmax -> einsum, which XLA may materialize as a
(H, S, K) f32 logits tensor (~6 GB for text at H=40) — bandwidth, not
FLOPs. The reference runs SDPA flash kernels here and pays ~nothing.

Candidates:
  xla      — the current einsum/softmax path
  kernel   — the universal Pallas chunked kernel with dense metadata
             (Skv = padded context; one chunk per q block)

Usage: python scripts/probe_cross_attn.py [H] (default 40 = Wan 14B)
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.models.wan.model import _cross_attention_dense
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.utils.benchmark import measure_fenced

H = int(sys.argv[1]) if len(sys.argv) > 1 else 40
B, S, D = 1, 75600, 128
rng = np.random.default_rng(0)

for K, name in ((512, "text(512)"), (257, "image(257)")):
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.bfloat16)

    f_x = jax.jit(_cross_attention_dense)
    jax.block_until_ready(f_x(q, k, v))
    t_x = measure_fenced(lambda: f_x(q, k, v), iters=3, warmup=1) * 1e3

    # kernel path: pad K to a SUB multiple, one block_kv chunk per row
    Kp = max(-(-K // MD.SUB) * MD.SUB, 128)
    Sqp = -(-S // 512) * 512

    def kern(q, k, v):
        qf = q.reshape(B * H, S, D)
        qf = jnp.pad(qf, ((0, 0), (0, Sqp - S), (0, 0)))
        kv = pack_kv(k.reshape(B * H, K, D), v.reshape(B * H, K, D))
        kv = jnp.pad(kv, ((0, 0), (0, Kp - K), (0, 0)))
        counts = jnp.broadcast_to(
            jnp.asarray(MD.kv_counts_for_seq(K, Kp), jnp.int32), (1, Kp // MD.SUB))
        mask = jnp.ones((1, Sqp // 512, Kp // MD.SUB), bool)
        meta = MD.chunk_meta_jnp(mask, counts, block_kv=Kp, cap=1)
        o = block_sparse_attention_kv(qf, kv, meta, block_q=512, block_kv=Kp)
        return o[:, :S].reshape(B, H, S, D)

    f_k = jax.jit(kern)
    ok = jax.block_until_ready(f_k(q, k, v))
    ref = jax.block_until_ready(f_x(q, k, v))
    err = float(jnp.max(jnp.abs(ok.astype(jnp.float32) - ref.astype(jnp.float32))))
    t_k = measure_fenced(lambda: f_k(q, k, v), iters=3, warmup=1) * 1e3
    print(f"H={H} {name}: xla {t_x:7.1f} ms | kernel {t_k:7.1f} ms "
          f"(max|diff| {err:.2e})", flush=True)
