"""sparse_videogen_tpu — TPU-native sparse video-diffusion inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
svg-project/Sparse-VideoGen: training-free acceleration of DiT video models
(Wan 2.1, HunyuanVideo, CogVideoX 1.5, Cosmos) via two sparse-attention
algorithms:

- SVG1: an online profiler classifies each attention head as *spatial* or
  *temporal* every denoising step, re-lays-out tokens per head, and runs a
  static block-sparse (sliding-window + first-frame-sink) flash attention.
- SVG2 (SAP): per-head batched k-means clusters Q and K tokens, selects
  cluster-pair blocks by top-p mass of a centroid-level attention estimate,
  permutes tokens cluster-contiguously (block-aligned on TPU), and runs a
  dynamic block-sparse flash attention.

Layering (bottom-up):
  core/       pure-jnp reference algorithms (CPU-runnable test oracles)
  ops/        Pallas TPU kernels + jnp fallbacks
  sparse/     SVG1 / SVG2 algorithm drivers (jit-able, functional state)
  models/     DiT model families (functional param-pytree implementations)
  schedulers/ flow-match solvers (UniPC, Euler, DPM++)
  parallel/   mesh / sharding / Ulysses sequence parallelism
  pipelines/  end-to-end generation pipelines
  utils/      timing, metrics, density telemetry, seeding
  io/         checkpoint conversion (HF safetensors -> jax pytrees)
"""

__version__ = "0.1.0"

from sparse_videogen_tpu.config import (  # noqa: F401
    SAPConfig,
    SparseMode,
    SVGConfig,
    VideoLayout,
    WarmupSchedule,
)
