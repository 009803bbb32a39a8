"""End-to-end generation pipelines."""

from sparse_videogen_tpu.pipelines.wan import WanPipeline, make_wan_runtime  # noqa: F401
from sparse_videogen_tpu.pipelines.cog import CogPipeline  # noqa: F401
