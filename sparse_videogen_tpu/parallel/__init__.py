"""Multi-chip distribution: mesh construction, FSDP-style weight sharding,
Ulysses (head-sharded) sequence parallelism for the sparse attention paths.

Replaces the reference's torch.distributed/NCCL + xfuser stack
(SURVEY.md section 2.6) with one jax mesh and XLA collectives over ICI.
"""

from sparse_videogen_tpu.parallel.mesh import make_mesh  # noqa: F401
from sparse_videogen_tpu.parallel.sharding import shard_params  # noqa: F401
from sparse_videogen_tpu.parallel.ulysses import UlyssesRuntime  # noqa: F401


def parallelize_runtime(rt, mesh, plan, *, pattern, sap=None, warmup=None,
                        prompt_length=None):
    """Wrap a single-chip attention runtime for the mesh: Ulysses (sp axis,
    all patterns — per-head decisions are local) and/or ring (rp axis,
    dense + video-only SAP). Mirrors make_wan_runtime's wiring for the
    other model pipelines."""
    if mesh is None:
        return rt
    rp = mesh.shape.get("rp", 1)
    sp = mesh.shape.get("sp", 1)
    if rp > 1:
        from sparse_videogen_tpu.config import SparseMode, TextPosition
        from sparse_videogen_tpu.parallel.ring_runtime import (
            RingDenseRuntime,
            RingSAPRuntime,
        )

        head_axis = "sp" if sp > 1 else None
        mode = SparseMode(pattern)
        if mode == SparseMode.DENSE:
            return RingDenseRuntime(plan, mesh, head_axis=head_axis,
                                    prompt_length=prompt_length)
        if (mode == SparseMode.SAP and sap is not None and warmup is not None
                and plan.layout.text_position == TextPosition.NONE):
            return RingSAPRuntime(plan, sap, warmup, mesh, head_axis=head_axis)
        raise ValueError(
            f"pattern={pattern} does not compose with ring_degree>1 for this "
            "layout; use --ulysses_degree (head sharding)"
        )
    if sp > 1:
        from sparse_videogen_tpu.parallel.ulysses import UlyssesRuntime

        return UlyssesRuntime(rt, mesh)
    return rt
