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

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import TextPosition, VideoLayout
from sparse_videogen_tpu.core.masks import inverse_permutation, temporal_index_map


def placement_indices(layout: VideoLayout):
    """Return (gather_fwd, gather_inv) numpy int32 arrays of shape (S,)."""
    g = temporal_index_map(layout)
    return g, inverse_permutation(g)


def temporal_transpose(x, layout: VideoLayout, *, inverse: bool = False):
    """The temporal re-layout as reshape+transpose (no gather).

    `temporal_index_map` is not an arbitrary permutation: on the video
    segment it is exactly a (num_frames, frame_size) matrix transpose
    (dest p*nf+f <- src f*fs+p), with text tokens fixed. Expressing it as
    reshape+swapaxes instead of `jnp.take` lets XLA:TPU emit its native
    tiled-transpose copy instead of a row gather — measured 28 GB/s for the
    gather vs copy-class bandwidth for the transpose (NOTES_ROUND2.md;
    replaces the round-2 constant-gather formulation of svg1_sparse_impl).

    x: (..., S, D) with S on axis -2. Exactly equal to
    x[..., temporal_index_map(layout), :] (inverse: the inverse map).
    """
    nf, fs = layout.num_frames, layout.frame_size
    vid = layout.video_length
    vstart = layout.context_length if layout.text_position == TextPosition.FIRST else 0
    lead = x.shape[:-2]
    S, D = x.shape[-2:]
    xv = jax.lax.slice_in_dim(x, vstart, vstart + vid, axis=-2)
    a, b = (fs, nf) if inverse else (nf, fs)
    xv = xv.reshape(lead + (a, b, D)).swapaxes(-3, -2).reshape(lead + (vid, D))
    parts = []
    if vstart:
        parts.append(jax.lax.slice_in_dim(x, 0, vstart, axis=-2))
    parts.append(xv)
    if vstart + vid < S:
        parts.append(jax.lax.slice_in_dim(x, vstart + vid, S, axis=-2))
    return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else xv


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

    Same transpose + select formulation as hidden_states_placement
    (see its docstring for the TPU rationale)."""
    is_t = (best_mask_idx == 1)[..., None, None]

    def place(x):
        return jnp.where(is_t, temporal_transpose(x, layout), x)

    return place(q), place(k), place(v)


def hidden_states_placement(o, best_mask_idx, layout: VideoLayout):
    """Inverse placement of the attention output.

    Matches wan_hidden_states_placement (placement.py:285-358): for temporal
    heads, output position p*nf+f is scattered back to token f*fs+p —
    equivalently the inverse (frame_size, num_frames) transpose.

    Formulated as one constant re-layout + per-head select rather than a
    per-head dynamic gather: a take_along_axis whose indices vary per head
    consistently crashes the TPU runtime when its operand is a Pallas kernel
    output (XLA:TPU gather/custom-call interaction; constant re-layouts
    and pre-kernel dynamic gathers are fine). The select form is also faster:
    XLA fuses the select into the re-layout's consumer.
    """
    o_t = temporal_transpose(o, layout, inverse=True)
    return jnp.where((best_mask_idx == 1)[..., None, None], o_t, o)
