"""FSDP-style parameter sharding.

The reference shards model weights with torch FSDP FULL_SHARD over blocks
(wan_orig/distributed/fsdp.py:12-35). The TPU-native analog: every large
parameter leaf is sharded on its largest divisible axis over the mesh's
combined devices ('dp','sp'); XLA inserts the all-gathers next to each use
(the FSDP unshard) and keeps small leaves replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(shape, mesh: Mesh, min_size: int = 1 << 18) -> P:
    # min_size 256k elements: sharding smaller leaves saves <1 MB but makes
    # GSPMD reshard their consumers (e.g. the head projection's output add
    # triggered an involuntary-full-remat warning); replicate them instead.
    # Exception: 2-D leaves whose LARGEST axis is the input/contracting axis
    # (row-parallel, e.g. the DiT head projection dim->patch_out). These
    # *consume* the trunk's feature-sharded activations in place (local dot
    # + psum), while leaving them replicated makes GSPMD pick a
    # batch-parallel dot and fully rematerialize the 1.5 MB head input every
    # step — the last spmd_partitioner.cc warning in the r2 dryrun tail.
    """Shard the largest axis divisible by the full device count."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if len(shape) == 2 and shape[0] >= shape[1]:
        min_size = min(min_size, 1 << 15)
    if np.prod(shape) < min_size:
        return P()
    # stacked per-layer params (ndim>=3) are sliced on axis 0 by the block
    # scan — sharding that axis forces a full remat each layer, so skip it.
    # Prefer the LAST (output-feature) axis: GSPMD's native matmul strategy
    # is column-parallel, so an output-sharded weight slice feeds the dot
    # directly; an input-dim-sharded one triggered "involuntary full
    # rematerialization" ([8,1] -> [1,4,2] reshard) inside jit(denoise_step)
    # every scanned layer (MULTICHIP_r02.json tail / VERDICT r2 item 6).
    cands = range(1, len(shape)) if len(shape) >= 3 else range(len(shape))
    order = sorted(cands, key=lambda i: (-shape[i], -i))
    for i in order:
        if shape[i] % n == 0:
            spec = [None] * len(shape)
            spec[i] = tuple(mesh.axis_names)
            return P(*spec)
    for i in order:  # fall back to sharding over just one axis
        for a in mesh.axis_names:
            if mesh.shape[a] > 1 and shape[i] % mesh.shape[a] == 0:
                spec = [None] * len(shape)
                spec[i] = a
                return P(*spec)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh with FSDP-style shardings."""
    def place(x):
        return jax.device_put(x, NamedSharding(mesh, param_spec(x.shape, mesh)))

    return jax.tree.map(place, params)
