"""SVG1 per-head layout transform ("sparse head placement").

Reference: Triton copy kernels (/root/reference/svg/models/wan/placement.py:
34-153 and the hyvideo/cog/cosmos variants). Heads classified *temporal* get
their video tokens re-laid-out frame-major -> token-major; *spatial* heads
copy through; text tokens (layout-dependent position) stay fixed. The inverse
transform restores the original order on the attention output.

TPU design: instead of a per-head branch (which would force recompilation or
divergent control flow), build per-head gather indices
    idx[b, h, :] = temporal_map      if best_mask_idx[b,h] == 1
                   identity          otherwise
and perform one `take_along_axis`. XLA lowers this to a single fused gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import VideoLayout
from sparse_videogen_tpu.core.masks import inverse_permutation, temporal_index_map


def placement_indices(layout: VideoLayout):
    """Return (gather_fwd, gather_inv) numpy int32 arrays of shape (S,)."""
    g = temporal_index_map(layout)
    return g, inverse_permutation(g)


def head_gather_indices(best_mask_idx, gather: np.ndarray):
    """(B, H) selection + (S,) permutation -> (B, H, S) per-head indices."""
    S = gather.shape[0]
    ident = jnp.arange(S, dtype=jnp.int32)
    g = jnp.asarray(gather, dtype=jnp.int32)
    is_temporal = (best_mask_idx == 1)[..., None]  # (B, H, 1)
    return jnp.where(is_temporal, g[None, None, :], ident[None, None, :])


def apply_placement(x, idx):
    """x: (B, H, S, D), idx: (B, H, S) -> gathered (B, H, S, D)."""
    return jnp.take_along_axis(x, idx[..., None], axis=2)


def sparse_head_placement(q, k, v, best_mask_idx, layout: VideoLayout):
    """Forward placement of q/k/v. Matches wan_sparse_head_placement.

    Same constant-gather + select formulation as hidden_states_placement
    (see its docstring for the TPU rationale)."""
    g, _ = placement_indices(layout)
    gi = jnp.asarray(g, jnp.int32)
    is_t = (best_mask_idx == 1)[..., None, None]

    def place(x):
        return jnp.where(is_t, jnp.take(x, gi, axis=2), x)

    return place(q), place(k), place(v)


def hidden_states_placement(o, best_mask_idx, layout: VideoLayout):
    """Inverse placement of the attention output.

    Matches wan_hidden_states_placement (placement.py:285-358): for temporal
    heads, output position p*nf+f is scattered back to token f*fs+p —
    equivalently a gather with the *inverse* permutation.

    Formulated as one constant-index gather + per-head select rather than a
    per-head dynamic gather: a take_along_axis whose indices vary per head
    consistently crashes the TPU runtime when its operand is a Pallas kernel
    output (XLA:TPU gather/custom-call interaction; constant-index gathers
    and pre-kernel dynamic gathers are fine). The select form is also faster:
    XLA fuses the select into the gather consumer.
    """
    _, ginv = placement_indices(layout)
    o_t = jnp.take(o, jnp.asarray(ginv, jnp.int32), axis=2)
    return jnp.where((best_mask_idx == 1)[..., None, None], o_t, o)
