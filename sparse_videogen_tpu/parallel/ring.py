"""Ring (context-parallel) attention over the sequence axis.

The reference scales past one GPU with xFuser's ulysses x ring hybrid over
the ORIGINAL dense wan attention (wan_orig/distributed/
xdit_context_parallel.py:63-169: sequence chunked across ranks, KV blocks
rotated). TPU re-design: `shard_map` over a mesh axis; each device holds a
sequence shard of Q/K/V, the packed KV shard rotates around the ring with
`ppermute`, and every rotation runs the SAME universal Pallas kernel with
per-(q-shard, kv-shard) metadata and GLOBAL-coordinate mask predicates
(aux[2]/aux[3] position offsets), so static SVG1 band+sink masks compose
exactly with ring parallelism — per-rotation pairs with no visited blocks
cost one empty kernel pass. Partial softmax results are combined with the
kernel's (m, l) stats (flash-attention two-level reduction).

Communication rides the mesh axis (ICI when the axis maps to physical
links); each step moves only the packed KV shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.ops.mask_spec import MaskSpec


def ring_meta(block_mask: np.ndarray, counts: np.ndarray, n_shards: int, *, block_kv: int) -> np.ndarray:
    """Per-(q-shard, kv-shard) chunked metadata from a global block mask.

    block_mask: (nQ, nsub) bool at (block_q, 128) granularity; counts:
    (nsub,) valid tokens per sub-block. Column indices in each entry are
    LOCAL to the kv shard. Returns (n, n, nQ/n, L) int32 with a uniform cap.
    """
    nQ, nsub = block_mask.shape
    assert nQ % n_shards == 0 and nsub % n_shards == 0, (nQ, nsub, n_shards)
    qL, kL = nQ // n_shards, nsub // n_shards
    rows = [
        [
            MD.chunk_meta_np(
                block_mask[None, i * qL : (i + 1) * qL, j * kL : (j + 1) * kL],
                counts[None, j * kL : (j + 1) * kL],
                block_kv=block_kv,
            )[0]
            for j in range(n_shards)
        ]
        for i in range(n_shards)
    ]
    L = max(m.shape[-1] for r in rows for m in r)
    out = np.zeros((n_shards, n_shards, qL, L), np.int32)
    for i in range(n_shards):
        for j in range(n_shards):
            m = rows[i][j]
            out[i, j, :, : m.shape[-1]] = m
    return out


def ring_attention(
    q,  # (B, H, S, D) — S divisible by n * block_q
    k,
    v,
    mesh,
    meta_all,  # (n, n, nQ_loc, L) int32 from ring_meta (replicated)
    *,
    axis: str = "sp",
    head_axis: str | None = None,
    mask_spec: MaskSpec = MaskSpec(),
    aux01=(0, 0),  # aux[0], aux[1] (mask scalars, e.g. hyvideo real length)
    block_q: int = 512,
    block_kv: int = 512,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Exact (block-)sparse attention with sequence sharded over `axis`.

    head_axis: additionally shard the head dim over a second mesh axis —
    the USP hybrid (Ulysses heads x ring sequence), the TPU analog of
    xfuser's xFuserLongContextAttention (xdit_context_parallel.py:161,
    hyvideo_orig config ulysses-degree x ring-degree). Per-head masks are
    head-local, so the composition needs no extra communication: the ring
    rotates each head-group's KV shard independently.
    """
    n = mesh.shape[axis]
    B, H, S, D = q.shape
    Sl = S // n
    assert Sl % block_q == 0 and Sl % 128 == 0, (S, n, block_q)

    a0 = jnp.int32(aux01[0])
    a1 = jnp.int32(aux01[1])

    def local_fn(q, k, v, meta_all):
        my = jax.lax.axis_index(axis)
        Bl, Hl = q.shape[0], q.shape[1]
        BHl = Bl * Hl
        qf = q.reshape(BHl, Sl, D)
        cur = pack_kv(k.reshape(BHl, Sl, D), v.reshape(BHl, Sl, D))
        meta_my = jax.lax.dynamic_index_in_dim(meta_all, my, axis=0, keepdims=False)

        acc = jnp.zeros((BHl, Sl, D), jnp.float32)
        m = jnp.full((BHl, Sl), -jnp.inf, jnp.float32)
        l = jnp.zeros((BHl, Sl), jnp.float32)
        for r in range(n):
            src = (my - r) % n
            meta = jax.lax.dynamic_index_in_dim(meta_my, src, axis=0, keepdims=False)[None]
            aux = jnp.stack([a0, a1, my * Sl, src * Sl]).astype(jnp.int32)
            o_r, m_r, l_r = block_sparse_attention_kv(
                qf, cur, meta, aux,
                block_q=block_q, block_kv=block_kv, mask_spec=mask_spec,
                scale=scale, interpret=interpret, return_stats=True,
            )
            # acc holds sum_j o_j * l_j * exp(m_j - m): rescale to the new
            # running max, add this rotation's (normalized o_r, stats) partial
            m_new = jnp.maximum(m, m_r)
            w_old = l * jnp.exp(m - m_new)
            w_r = l_r * jnp.exp(m_r - m_new)
            acc = acc * jnp.exp(m - m_new)[..., None] + o_r.astype(jnp.float32) * w_r[..., None]
            l = w_old + w_r
            m = m_new
            if r < n - 1:
                cur = jax.lax.ppermute(
                    cur, axis, perm=[(j, (j + 1) % n) for j in range(n)]
                )
        out = acc / jnp.maximum(l, 1e-20)[..., None]
        return out.astype(q.dtype).reshape(Bl, Hl, Sl, D)

    from jax import shard_map

    qkv_spec = P(None, head_axis, axis, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(qkv_spec,) * 3 + (P(),),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(q, k, v, meta_all)
