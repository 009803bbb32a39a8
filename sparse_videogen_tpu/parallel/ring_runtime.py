"""Ring (context-parallel) attention *runtimes* — the user-surface wrapper
that makes `--ring_degree` work from the pipelines/CLIs.

The reference exposes ring/ulysses degrees as flags on its deprecated _orig
pipelines (hyvideo_orig/config.py:351-369, wan_orig/text2video.py:71-112)
and only ever runs DENSE attention under sequence parallelism; its sparse
paths are single-GPU. Here:

- dense pattern x ring: RingDenseRuntime (parallel/ring.py rotation with
  full-mask metadata, exact).
- SAP pattern x ring: RingSAPRuntime (parallel/ring_sap.py: psum-exact
  distributed Lloyd + shard-local permutation — beyond the reference).
- SVG pattern x ring: rejected with guidance — SVG1's per-head profiling and
  placement permute the GLOBAL token axis; head sharding (ulysses_degree)
  is the supported multi-chip axis for SVG (per-head decisions are local,
  SURVEY.md section 2.6).

Both runtimes implement the sparse/runtimes.py protocol, so they drop into
wan_forward/hyvideo_forward unchanged. Activations are resharded to
token-sharded at the shard_map boundary (the reference chunks the sequence
per rank the same way, xdit_context_parallel.py:120).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sparse_videogen_tpu.config import SAPConfig, WarmupSchedule
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.parallel.ring import ring_attention, ring_meta
from sparse_videogen_tpu.parallel.ring_sap import sap_ring_attention
from sparse_videogen_tpu.sparse.svg1 import SVG1Plan
from sparse_videogen_tpu.sparse.svg2 import init_sap_state


def _ring_geometry(plan: SVG1Plan, n: int):
    """Padded sequence for n token shards: S_pad % (n * block_q) == 0."""
    S = plan.layout.seq_len
    unit = n * plan.block_q
    S_pad = -(-S // unit) * unit
    return S, S_pad


def _dense_ring_meta(plan: SVG1Plan, n: int) -> np.ndarray:
    S, S_pad = _ring_geometry(plan, n)
    bm = np.ones((S_pad // plan.block_q, S_pad // MD.SUB), bool)
    counts = MD.kv_counts_for_seq(S, S_pad)[0]
    return ring_meta(bm, counts, n, block_kv=plan.block_kv)


def _aux01(plan: SVG1Plan, prompt_length):
    """Static mask scalars (pure Python — this runs inside jit traces).

    Mirrors sparse/runtimes._aux_for: aux[0] = real_len (hyvideo) /
    prompt_len (cog)."""
    lay = plan.layout
    pl_ = lay.context_length if prompt_length is None else prompt_length
    if plan.mask_kind == "hyvideo":
        return (lay.video_length + pl_, 0)
    if plan.mask_kind == "cog":
        return (pl_, 0)
    return (0, 0)


def _pad_tokens(x, S_pad):
    S = x.shape[2]
    return x if S == S_pad else jnp.pad(x, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))


@dataclasses.dataclass(frozen=True)
class RingDenseRuntime:
    """Dense attention, token axis sharded over mesh axis `axis` (+ heads
    over `head_axis` for the USP hybrid)."""

    plan: SVG1Plan
    mesh: Mesh
    axis: str = "rp"
    head_axis: str | None = None
    prompt_length: int | None = None

    def consts(self):
        n = self.mesh.shape[self.axis]
        return {"ring_meta": jnp.asarray(_dense_ring_meta(self.plan, n))}

    def init_state(self, batch_heads, head_dim, n_layers):
        return jnp.zeros((n_layers, 0), jnp.int32)

    def _dense(self, q, k, v, consts):
        S, S_pad = _ring_geometry(self.plan, self.mesh.shape[self.axis])
        out = ring_attention(
            _pad_tokens(q, S_pad), _pad_tokens(k, S_pad), _pad_tokens(v, S_pad),
            self.mesh, consts["ring_meta"],
            axis=self.axis, head_axis=self.head_axis,
            mask_spec=self.plan.dense_mask_spec,
            aux01=_aux01(self.plan, self.prompt_length),
            block_q=self.plan.block_q, block_kv=self.plan.block_kv,
        )
        return out[:, :, :S]

    def __call__(self, q, k, v, t, rng, layer_idx, state, consts):
        return self._dense(q, k, v, consts), state


@dataclasses.dataclass(frozen=True)
class RingSAPRuntime:
    """SAP (SVG2) with the token axis ring-sharded: distributed k-means is
    psum-exact global Lloyd; permutations are shard-local
    (parallel/ring_sap.py). Warm-up layers/steps run the dense ring."""

    plan: SVG1Plan
    cfg: SAPConfig
    warmup: WarmupSchedule
    mesh: Mesh
    axis: str = "rp"
    head_axis: str | None = None

    def consts(self):
        n = self.mesh.shape[self.axis]
        return {"ring_meta": jnp.asarray(_dense_ring_meta(self.plan, n))}

    def init_state(self, batch_heads, head_dim, n_layers):
        one = init_sap_state(batch_heads, head_dim, self.cfg)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_layers,) + x.shape), one)

    def __call__(self, q, k, v, t, rng, layer_idx, state, consts):
        dense_rt = RingDenseRuntime(
            self.plan, self.mesh, self.axis, self.head_axis, None
        )

        def dense_branch(args):
            q, k, v, state, rng = args
            return dense_rt._dense(q, k, v, consts), state

        def sparse_branch(args):
            q, k, v, state, rng = args
            return sap_ring_attention(
                q, k, v, state, rng, self.mesh,
                axis=self.axis, head_axis=self.head_axis,
                layout=self.plan.layout, cfg=self.cfg,
            )

        warm = (layer_idx < self.warmup.first_layers) | (t > self.warmup.first_times)
        return jax.lax.cond(warm, dense_branch, sparse_branch, (q, k, v, state, rng))
