"""Multi-chip distribution: mesh construction, FSDP-style weight sharding,
Ulysses (head-sharded) sequence parallelism for the sparse attention paths.

Replaces the reference's torch.distributed/NCCL + xfuser stack
(SURVEY.md section 2.6) with one jax mesh and XLA collectives over ICI.
"""

from sparse_videogen_tpu.parallel.mesh import make_mesh  # noqa: F401
from sparse_videogen_tpu.parallel.sharding import shard_params  # noqa: F401
from sparse_videogen_tpu.parallel.ulysses import UlyssesRuntime  # noqa: F401
