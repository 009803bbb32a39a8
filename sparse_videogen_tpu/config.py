"""Static configuration objects.

All configs are frozen dataclasses so they can be closed over by jitted
functions (they are hashable trace-time constants). The reference wires the
same knobs through argparse flags + class attributes on monkey-patched
attention processors (svg/models/wan/inference.py:17-175); here they are
first-class config values.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class SparseMode(str, enum.Enum):
    DENSE = "dense"
    SVG = "SVG"  # SVG1: spatial/temporal online profiling + static block mask
    SAP = "SAP"  # SVG2: semantic-aware permutation (k-means) + dynamic map


class TextPosition(str, enum.Enum):
    """Where text/context tokens live inside the self-attention sequence.

    Reference per-model layouts (SURVEY.md section 2.4):
      Wan / Cosmos: text is cross-attended, none in self-attn  -> NONE
      HunyuanVideo: seq = video tokens + 256 text tokens       -> LAST
      CogVideoX:    seq = 226 text tokens + video tokens       -> FIRST
    """

    NONE = "none"
    FIRST = "first"
    LAST = "last"


@dataclasses.dataclass(frozen=True)
class VideoLayout:
    """Static token layout of a video DiT self-attention sequence."""

    num_frames: int  # latent frame patches (post patchify)
    frame_size: int  # tokens per latent frame (post patchify)
    context_length: int = 0  # text tokens inside the self-attn sequence
    text_position: TextPosition = TextPosition.NONE
    prompt_length: int = 0  # actual prompt tokens (<= context_length); hyvideo

    @property
    def video_length(self) -> int:
        return self.num_frames * self.frame_size

    @property
    def seq_len(self) -> int:
        return self.context_length + self.video_length

    def __post_init__(self):
        if self.context_length == 0:
            object.__setattr__(self, "text_position", TextPosition.NONE)


@dataclasses.dataclass(frozen=True)
class WarmupSchedule:
    """Dense-attention warm-up escape hatch.

    Mirrors the reference semantics (svg/models/wan/attention.py:299-309):
    layers with index < first_layers (an absolute layer count) and steps with
    timestep > first_times (an absolute timestep threshold on the 0..1000
    flow-match timestep) run dense attention.

    Use `from_fractions` to translate the reference's fractional CLI flags
    (--first_layers_fp / --first_times_fp) exactly the way the entry scripts
    do (wan_t2v_inference.py:84-97).
    """

    first_layers: int = 0
    first_times: float = 1001.0  # timestep > this => dense. 1001 disables.

    @staticmethod
    def from_fractions(
        first_layers_fp: float,
        first_times_fp: float,
        num_layers: int,
        timesteps,  # descending array of scheduler timesteps (e.g. 0..1000)
    ) -> "WarmupSchedule":
        num_steps = len(timesteps)
        num_fp_timesteps = math.floor(first_times_fp * num_steps)
        num_fp_layers = math.floor(first_layers_fp * num_layers)
        if num_fp_timesteps > 0:
            first_times = float(timesteps[num_fp_timesteps - 1]) - 1.0
        else:
            first_times = 1001.0
        return WarmupSchedule(first_layers=num_fp_layers, first_times=first_times)

    def is_dense_layer(self, layer_idx: int) -> bool:
        """Static (python-level) part of the warm-up decision."""
        return layer_idx < self.first_layers


@dataclasses.dataclass(frozen=True)
class SVGConfig:
    """SVG1 knobs (reference flags: wan_t2v_inference.py argparse)."""

    num_sampled_rows: int = 64
    sample_mse_max_row: int = 10000
    sparsity: float = 0.25
    # block granularity of the sliding-window mask; 128 matches both the
    # reference's flex-attention mask rounding (wan/utils.py:29-34) and the
    # TPU lane width.
    block_size: int = 128
    # block size of the emulated profiling masks (wan/utils.py:83)
    profile_block_size: int = 128
    # multiplier of the *profiling* masks is hard-coded to 2 frames in the
    # reference (wan/utils.py:83 "block_thres = frame_size * 2")
    profile_multiplier: float = 2.0


@dataclasses.dataclass(frozen=True)
class SAPConfig:
    """SVG2 / semantic-aware-permutation knobs.

    Reference flags: --num_q_centroids/--num_k_centroids/--top_p_kmeans/
    --min_kc_ratio/--kmeans_iter_init/--kmeans_iter_step/
    --zero_step_kmeans_init (wan_t2v_inference.py).
    """

    num_q_centroids: int = 50
    num_k_centroids: int = 200
    top_p_kmeans: float = 0.9
    min_kc_ratio: float = 0.0
    kmeans_iter_init: int = 50
    kmeans_iter_step: int = 2
    zero_step_kmeans_init: bool = False
    # distance variant (kmeans_utils.py batch_kmeans_{Euclid,Cosine,Dot});
    # the reference production path uses Euclid
    kmeans_metric: str = "euclid"
    # TPU-specific: queries are permuted cluster-contiguously with each
    # cluster padded to a multiple of block_q (every q block then maps to
    # exactly one q cluster); keys/values are permuted UNPADDED and the
    # kernel walks run-list metadata in block_kv-token chunks (replaces the
    # reference's variable-block FlashInfer kernel; SURVEY.md section 7).
    # Defaults from the H=40 S=75,600 force_density=0.25 sweep (890 ms at
    # the old 128/512 -> 727 at 256/1024): block_kv=1024 halves KV DMA
    # descriptors (the runs kernel is KV-bandwidth-bound); block_q=256 holds
    # a whole average cluster (S/qc ~ 252 rows at the reference 720p config)
    # so each KV run streams once per cluster, at +~2% q padding.
    block_q: int = 256
    block_kv: int = 1024
    # max maximal-runs per (head, q-cluster) metadata row. None = exact
    # (num_k_centroids). Production configs can lower it (popularity
    # relabeling keeps real run counts small); rows with more runs are
    # truncated (missing attention) — keep a safety margin.
    max_runs: int | None = None
    # ping-pong q sub-tiles inside the runs kernel. Negative result at every
    # measured config (bq=128: 236 -> 318 ms with qs=2; bq=256/SQ=128:
    # 727 -> 766 ms; bq=512/qs=4: 976) — the runs kernel is KV-DMA-bound,
    # not q-pipeline-bound. Knob kept for experiments; None = 1.
    qsplit: int | None = None
    # BENCHMARK-ONLY: pin the dynamic map to exactly this cluster fraction
    # instead of the top-p selection (svg2.sap_sparse_attention). Random
    # weights give degenerate (~90%) top-p density; real video sits at
    # 10-30%. None = real top-p selection (production).
    # KV-cluster relabeling before run-metadata build (layout-only — any
    # permutation is output-invariant): "popularity" (descending keep count;
    # optimal for contiguous/forced maps) or "pc1" (size-weighted centroid
    # PC1 seriation; organic top-p selections are similarity balls, so a
    # locality-preserving order coalesces each row's runs — see
    # sparse/svg2.py pc1_relabel)
    # "auto" resolves per block_mode: cluster -> popularity, tile -> pc1
    # (tile runs live in the PC1-seriated order, so a locality-preserving
    # post-map relabel coalesces adjacent selected tiles into long runs —
    # measured -10% vs popularity on wan-14B organic, NOTES_ROUND4.md)
    relabel: str = "auto"
    force_density: float | None = None
    # Block granularity mode (TPU-specific redesign knob):
    #   "cluster" — the reference semantics: selection and run metadata at
    #     k-means-cluster granularity (variable sizes). Matches the patched
    #     FlashInfer variable-block formulation exactly, but organic top-p
    #     maps select SCATTERED clusters and every selected run pays a full
    #     block_kv DMA chunk (measured 1.7-13x wasted KV traffic, round 4).
    #   "tile" — fixed-grain quantization: tokens are re-labeled into
    #     block_q/block_kv-token tiles of the k-means-sorted order, tile
    #     centroids (segment means) drive the SAME top-p selection natively
    #     at tile granularity, and every selected KV tile is exactly one
    #     kernel DMA chunk: zero padding waste, zero partial chunks
    #     (sparse/svg2.py tile_quantize).
    block_mode: str = "cluster"
    # KV tile grain for block_mode="tile" (multiple of 128). None = block_kv
    # (each selected tile is exactly one DMA chunk). Finer grains (128/256)
    # trade partial-chunk DMA waste for less selection dilation: with PC1
    # seriation adjacent selected tiles coalesce into long runs, so most
    # chunks stay full while the top-p map tracks the data more tightly.
    tile_grain: int | None = None
    # Token ordering that tiles slice (block_mode="tile" only):
    #   "kmeans" — k-means labels seriated along centroid PC1 (the tile-mode
    #     default; clusters group tokens in full D dimensions before tiling).
    #   "pc1" — each token sorted by its own PC1 projection; no k-means at
    #     all (in tile mode clustering exists ONLY to order tokens — the
    #     top-p selection runs on tile centroids either way). ~20x cheaper
    #     map build; tiles are blurrier (1-D ordering), so organic density
    #     at a given gain runs higher — see sparse/svg2.py token_pc1_keys.
    tile_order: str = "kmeans"

    @property
    def run_qsplit(self) -> int:
        return 1 if self.qsplit is None else self.qsplit


@dataclasses.dataclass(frozen=True)
class SparseAttentionConfig:
    """Top-level sparse-attention config: mode + per-mode knobs + warmup."""

    mode: SparseMode = SparseMode.DENSE
    layout: VideoLayout | None = None
    warmup: WarmupSchedule = WarmupSchedule()
    svg: SVGConfig = SVGConfig()
    sap: SAPConfig = SAPConfig()
