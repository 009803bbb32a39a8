"""Attention runtimes: first-class dense / SVG1 / SAP self-attention.

The reference integrates sparsity by monkey-patching diffusers attention
processors (svg/models/wan/inference.py:124-175). Here a *runtime* object is
passed into the model forward; it is called once per transformer block inside
a lax.scan, so the per-layer warm-up check and the per-head decisions are all
traced control flow — one compiled block serves every layer.

Runtime protocol:
  consts() -> pytree of device arrays (static metadata). MUST be threaded
      into the enclosing jit as a real argument — never a closure constant —
      because the kernel's HBM DMA requires parameter layout (see
      sparse/svg1.py svg1_sparse_impl docstring).
  init_state(batch_heads, head_dim, n_layers) -> per-layer state pytree with
      leading dim n_layers (scanned as xs/ys through the block loop)
  __call__(q, k, v, t, rng, layer_idx, state, consts) -> (out, new_state)
      q,k,v: (B, H, S, D); t: scalar timestep (0..1000); layer_idx: traced.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import SAPConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.sparse.svg1 import SVG1Plan, dense_impl, svg1_sparse_impl
from sparse_videogen_tpu.sparse.svg2 import SAPState, init_sap_state, sap_cluster, sap_sparse_attention


def _empty_state(n_layers):
    return jnp.zeros((n_layers, 0), jnp.int32)


def _aux_for(plan, prompt_length):
    """Dynamic mask scalars: aux[0] = real_len (hyvideo) / prompt_len (cog)."""
    return plan.default_aux(prompt_length)


def _classified(meta, spec, plan, prompt_length, block_q):
    """Cheap-first metadata reordering (ops/metadata.classify_cheap_np): the
    kernel's bias-only loop handles interior chunks, only mask edges pay the
    token predicate. aux here must equal the runtime aux bit-for-bit."""
    import numpy as np

    from sparse_videogen_tpu.ops import metadata as MD

    aux_np = np.asarray(_aux_for(plan, prompt_length))
    return jnp.asarray(
        MD.classify_cheap_np(
            meta, spec, aux_np,
            block_q=block_q, block_kv=plan.block_kv, seq_q=plan.layout.seq_len,
        )
    )


@dataclasses.dataclass(frozen=True)
class DenseRuntime:
    plan: SVG1Plan  # only dense_meta/layout/block sizes are used
    prompt_length: int | None = None

    def consts(self):
        return {
            "dense_meta": _classified(
                self.plan.dense_meta(), self.plan.dense_mask_spec, self.plan,
                self.prompt_length, self.plan.dense_exec[0],
            ),
            "aux": _aux_for(self.plan, self.prompt_length),
        }

    def init_state(self, batch_heads, head_dim, n_layers):
        return _empty_state(n_layers)

    def __call__(self, q, k, v, t, rng, layer_idx, state, consts):
        return dense_impl(q, k, v, consts["dense_meta"], self.plan, consts["aux"]), state


@dataclasses.dataclass(frozen=True)
class SVG1Runtime:
    plan: SVG1Plan
    prompt_length: int | None = None

    def consts(self):
        sparse_meta = self.plan.sparse_meta()
        if not self.plan.inplace_temporal:
            sparse_meta = _classified(
                sparse_meta, self.plan.mask_spec, self.plan,
                self.prompt_length, self.plan.block_q,
            )
        return {
            "dense_meta": _classified(
                self.plan.dense_meta(), self.plan.dense_mask_spec, self.plan,
                self.prompt_length, self.plan.dense_exec[0],
            ),
            "sparse_meta": sparse_meta,
            "aux": _aux_for(self.plan, self.prompt_length),
        }

    def init_state(self, batch_heads, head_dim, n_layers):
        return _empty_state(n_layers)

    def __call__(self, q, k, v, t, rng, layer_idx, state, consts):
        warm = (layer_idx < self.plan.warmup.first_layers) | (
            t > self.plan.warmup.first_times
        )
        out = jax.lax.cond(
            warm,
            lambda a: dense_impl(a[0], a[1], a[2], a[4], self.plan, a[6]),
            lambda a: svg1_sparse_impl(
                a[0], a[1], a[2], a[3], a[5], self.plan, a[6]
            ),
            (q, k, v, rng, consts["dense_meta"], consts["sparse_meta"],
             consts["aux"]),
        )
        return out, state


@dataclasses.dataclass(frozen=True)
class SAPRuntime:
    plan: SVG1Plan  # dense fallback metadata + layout
    cfg: SAPConfig
    warmup: WarmupSchedule

    def consts(self):
        return {
            "dense_meta": _classified(
                self.plan.dense_meta(), self.plan.dense_mask_spec, self.plan,
                None, self.plan.dense_exec[0],
            ),
            "aux": _aux_for(self.plan, None),
        }

    def init_state(self, batch_heads, head_dim, n_layers):
        one = init_sap_state(batch_heads, head_dim, self.cfg)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_layers,) + x.shape), one)

    def __call__(self, q, k, v, t, rng, layer_idx, state: SAPState, consts):
        layout = self.plan.layout

        def dense_branch(args):
            q, k, v, state, rng, dense_meta, aux = args
            if self.cfg.zero_step_kmeans_init:
                vid = layout.video_length
                B, H, S, D = q.shape
                qv = q[:, :, :vid].reshape(B * H, vid, D)
                kv_ = k[:, :, :vid].reshape(B * H, vid, D)
                _, _, state = sap_cluster(qv, kv_, state, self.cfg, rng)
            return dense_impl(q, k, v, dense_meta, self.plan, aux), state

        def sparse_branch(args):
            q, k, v, state, rng, _, _aux = args
            return sap_sparse_attention(
                q, k, v, state, rng, layout=layout, cfg=self.cfg
            )

        warm = (layer_idx < self.warmup.first_layers) | (t > self.warmup.first_times)
        return jax.lax.cond(
            warm, dense_branch, sparse_branch,
            (q, k, v, state, rng, consts["dense_meta"], consts["aux"]),
        )
