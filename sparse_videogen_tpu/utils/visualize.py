"""ASCII visualization of block-sparse structure.

Port of visualize_sparse_bsr (/root/reference/svg/models/utils.py:67-133),
adapted to this package's chunked CSR metadata.
"""

from __future__ import annotations

import numpy as np

from sparse_videogen_tpu.ops.metadata import SUB, decode_meta


def visualize_meta(meta, *, block_kv: int, seq_kv: int, row: int = 0, max_cells: int = 64) -> str:
    """Render one metadata row-set (R index `row`) as an ASCII grid."""
    mask = decode_meta(np.asarray(meta), block_kv=block_kv, seq_kv=seq_kv)[row]
    nQ, S = mask.shape
    nsub = S // SUB
    grid = mask.reshape(nQ, nsub, SUB).any(-1)
    qs = max(1, nQ // max_cells)
    ks = max(1, nsub // max_cells)
    lines = []
    for i in range(0, nQ, qs):
        cells = grid[i : i + qs]
        line = "".join(
            "#" if cells[:, j : j + ks].all() else ("+" if cells[:, j : j + ks].any() else ".")
            for j in range(0, nsub, ks)
        )
        lines.append(line)
    density = grid.mean()
    lines.append(f"block density: {density:.3f} ({nQ} q-rows x {nsub} kv-subblocks)")
    return "\n".join(lines)
