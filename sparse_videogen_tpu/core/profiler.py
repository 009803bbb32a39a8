"""SVG1 online profiler: per-head spatial/temporal mask selection.

Reference: sample_mse (/root/reference/svg/models/wan/attention.py:210-234).

For each (batch, head): sample `num_sampled_rows` query rows uniformly from
the first `sample_mse_max_row` rows, compute the exact attention output on
those rows, and the output under each candidate emulated mask; pick the mask
with the smallest MSE. The reference materializes O(L^2) CPU masks and
indexes rows; here mask rows are evaluated on the fly from elementwise
predicates (core.masks.profile_mask_predicate) — same values, no O(L^2)
memory.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def sample_mse(q, k, v, mask_preds: Sequence, rng, *, num_sampled_rows: int, sample_mse_max_row: int):
    """Per-head MSE of each candidate mask vs exact attention on sampled rows.

    Args:
      q,k,v: (B, H, S, D)
      mask_preds: list of fn(q_idx, k_idx)->bool elementwise predicates.
      rng: jax PRNG key (the reference uses torch.randint fresh each call).

    Returns:
      mses: (num_masks, B, H) float32.
    """
    B, H, S, D = q.shape
    n_rows = min(num_sampled_rows, S)
    max_row = min(sample_mse_max_row, S)
    rows = jax.random.randint(rng, (n_rows,), 0, max_row)

    q_s = jnp.take(q, rows, axis=2)  # (B, H, R, D)
    scores = jnp.einsum(
        "bhrd,bhkd->bhrk", q_s, k, preferred_element_type=jnp.float32
    ) * (D**-0.5)

    # One softmax; masked variants are renormalizations of the same weights:
    # softmax(where(m, s, -inf)) == p*m / sum(p*m). Saves two exp passes over
    # (B,H,R,S) vs the reference's three independent softmaxes.
    m_row = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m_row)
    golden_l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhrk,bhkd->bhrd", p.astype(v.dtype), v).astype(jnp.float32)
    golden = pv / golden_l

    k_idx = jnp.arange(S)[None, :]
    q_idx = rows[:, None]

    mses = []
    for pred in mask_preds:
        m = pred(q_idx, k_idx)[None, None]  # (1, 1, R, S)
        pm = jnp.where(m, p, 0.0)
        l = jnp.sum(pm, axis=-1, keepdims=True)
        out = jnp.einsum("bhrk,bhkd->bhrd", pm.astype(v.dtype), v).astype(jnp.float32)
        out = out / jnp.maximum(l, 1e-20)
        mses.append(jnp.mean((out - golden) ** 2, axis=(2, 3)))
    return jnp.stack(mses)  # (num_masks, B, H)


def best_mask_idx(mses):
    """argmin over masks -> (B, H) int32. 0 = spatial, 1 = temporal."""
    return jnp.argmin(mses, axis=0).astype(jnp.int32)
