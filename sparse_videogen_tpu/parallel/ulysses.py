"""Ulysses-style sequence parallelism: shard attention over heads.

The reference scales long sequences with xfuser's hybrid Ulysses/ring
attention (wan_orig/distributed/xdit_context_parallel.py:161,
hyvideo_orig/modules/attenion.py:563-607). On TPU the Ulysses leg maps
naturally onto a mesh axis: activations arrive token-sharded, XLA's GSPMD
inserts the all-to-all at the shard_map boundary where q/k/v become
head-sharded, and each device runs the full sparse-attention driver on its
local heads. SVG1's per-head profiling decisions and SAP's per-head
clustering/permutation are head-local (SURVEY.md section 2.6), so both
algorithms compose with this sharding without any semantic change.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@dataclasses.dataclass(frozen=True)
class UlyssesRuntime:
    """Wraps an attention runtime; each sp-shard runs it on local heads.

    State layout: the inner runtime's per-layer state has a leading B*H axis;
    it is stored host-side as (B, H, ...) so the head axis can be sharded.
    """

    inner: object
    mesh: Mesh
    axis: str = "sp"

    def consts(self):
        return self.inner.consts()

    def init_state(self, batch_heads, head_dim, n_layers):
        return self.inner.init_state(batch_heads, head_dim, n_layers)

    def __call__(self, q, k, v, t, rng, layer_idx, state, consts):
        B, H, S, D = q.shape
        sp = self.mesh.shape[self.axis]
        assert H % sp == 0, f"heads {H} not divisible by sp={sp}"

        qkv_spec = P(None, self.axis, None, None)

        # state leaves with a leading B*H axis are head-sharded; everything
        # else (scalars like SAPState.initialized, empty placeholders) is
        # replicated.
        def is_bh(x):
            return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B * H

        def to_bh(x):
            return x.reshape(B, H, *x.shape[1:]) if is_bh(x) else x

        def spec_of(x):
            return P(None, self.axis) if is_bh(x) else P()

        state_specs = jax.tree.map(spec_of, state)
        consts_specs = jax.tree.map(lambda _: P(), consts)

        def wrapped(q, k, v, state_bh, t, rng, layer_idx, consts):
            # NOTE: rng is deliberately replicated across shards — SVG1's
            # profiling rows must match the single-device draw (parity), and
            # SAP's cold k-means init sharing token *indices* across shards is
            # statistically harmless (the gathered tokens differ per head).
            state_local = jax.tree.map(
                lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])
                if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == B and x.shape[1] == H // sp)
                else x,
                state_bh,
            )
            out, new_state = self.inner(q, k, v, t, rng, layer_idx, state_local, consts)
            new_bh = jax.tree.map(
                lambda x: x.reshape(B, H // sp, *x.shape[1:])
                if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B * H // sp)
                else x,
                new_state,
            )
            return out, new_bh

        state_bh = jax.tree.map(to_bh, state)
        bh_specs = jax.tree.map(
            lambda x: P(None, self.axis) if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == H) else P(),
            state_bh,
        )
        out, new_state_bh = shard_map(
            wrapped,
            mesh=self.mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, bh_specs, P(), P(), P(), consts_specs),
            out_specs=(qkv_spec, bh_specs),
            check_vma=False,
        )(q, k, v, state_bh, t, rng, layer_idx, consts)
        new_state = jax.tree.map(
            lambda x: x.reshape(B * H, *x.shape[2:])
            if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == B and x.shape[1] == H)
            else x,
            new_state_bh,
        )
        return out, new_state
