"""SVG1 driver: online profiling -> placement -> static block-sparse attention.

Reference flow: WanAttn_SVGAttn_Processor2_0.attention_core_logic
(/root/reference/svg/models/wan/attention.py:283-328):
  warmup? -> dense
  else: sample_mse -> argmin -> sparse_head_placement -> flex_attention with
  the shared band+sink block mask -> inverse placement.

TPU design: the per-head spatial/temporal decision never recompiles — it
becomes gather indices (core/placement.py); the flex block mask becomes
static chunked CSR metadata + an in-kernel band+sink predicate (exact,
including partial blocks). Everything here is jit-able; the profiling RNG is
an explicit key (the reference uses a fresh torch.randint per call).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.core import masks as core_masks
from sparse_videogen_tpu.core import placement as core_placement
from sparse_videogen_tpu.core.profiler import best_mask_idx, sample_mse
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import MaskSpec, block_sparse_attention_kv, pack_kv


@dataclasses.dataclass(frozen=True)
class SVG1Plan:
    """Static per-(layout, config) plan. Hashable; safe to close over in jit."""

    layout: VideoLayout
    cfg: SVGConfig
    warmup: WarmupSchedule
    multiplier: float
    block_q: int
    block_kv: int
    # mask family: "band_sink" (wan/cosmos), "hyvideo" (text last + real/fake
    # split, dynamic real_len via aux), "cog" (text first, prompt_len via aux)
    mask_kind: str = "band_sink"
    # placement-free temporal heads (band_sink only): instead of physically
    # re-laying-out q/k/v frame-major -> token-major for temporal heads
    # (reference placement kernels, ~65 ms/layer of row gathers at 720p),
    # temporal heads keep the original layout and run per-head metadata +
    # a band_sink_perm predicate that evaluates the band at permuted
    # positions — the same attended set, zero data movement.
    inplace_temporal: bool = False

    def __post_init__(self):
        object.__setattr__(self, "_cache", {})

    @property
    def seq_pad_q(self) -> int:
        return -(-self.layout.seq_len // self.block_q) * self.block_q

    @property
    def dense_exec(self):
        """(block_q, qsplit) for the DENSE path. Measured (v5e, Wan 720p):
        unmasked dense runs fastest at bq=2048 with 8 ping-pong q sub-tiles
        (563 -> 477 ms, -15%). Masked dense (hyvideo/cog predicates) with
        cheap-first two-phase metadata runs fastest at bq=1024 qsplit=4
        (scripts/bench_masked_kernel.py: hyv-dense 2754 -> 1259 ms at
        S=119k; qsplit=8 regresses to 1442)."""
        if self.dense_mask_spec.kind == "none" and self.seq_pad_kv >= 2048:
            bq = min(2048, -(-self.layout.seq_len // 128) * 128)
            qsplit = max(1, min(8, bq // 256))
        else:
            bq = self.block_q
            qsplit = max(1, min(4, bq // 256))
        while bq % qsplit or (bq // qsplit) % 8:
            qsplit -= 1
        return bq, qsplit

    @property
    def sparse_qsplit(self) -> int:
        """Measured with two-phase metadata: band masks fastest at bq=1024
        qsplit=4 (193 ms vs 202 at the old bq=512/qsplit=2, Wan 720p)."""
        q = max(1, min(4, self.block_q // 256))
        while self.block_q % q or (self.block_q // q) % 8:
            q -= 1
        return q

    @property
    def seq_pad_kv(self) -> int:
        s = -(-self.layout.seq_len // MD.SUB) * MD.SUB
        return max(s, self.block_kv)

    @property
    def mask_spec(self) -> MaskSpec:
        lay = self.layout
        if self.mask_kind == "band_sink":
            # reference band is |q-kv| <= w, ceil-rounded (wan/utils.py:29-34);
            # kernel predicate is strict <
            w = math.ceil(self.multiplier * lay.frame_size / 128) * 128
            return MaskSpec(kind="band_sink", band_width=w + 1, sink_size=lay.frame_size)
        if self.mask_kind == "hyvideo":
            # floor-rounded strict < (hyvideo/utils.py:23-33)
            w = math.floor(self.multiplier * lay.frame_size / 128) * 128
            return MaskSpec(kind="hyvideo", band_width=w, video_len=lay.video_length)
        if self.mask_kind == "cog":
            w = math.floor(self.multiplier * lay.frame_size / 128) * 128
            return MaskSpec(kind="cog", band_width=w)
        raise ValueError(self.mask_kind)

    @property
    def dense_mask_spec(self) -> MaskSpec:
        """Dense fallback predicate. For text-last layouts dense attention is
        still real/fake-split (hyvideo attention.py:35-44 replaces masked SDPA
        with varlen flash over real tokens); a huge band makes every real pair
        attend while the real/fake split stays exact."""
        if self.mask_kind == "hyvideo":
            return MaskSpec(
                kind="hyvideo", band_width=1 << 24, video_len=self.layout.video_length
            )
        return MaskSpec()

    def default_aux(self, prompt_length: int | None = None):
        """Dynamic mask scalars (aux[0]: hyvideo real_len / cog prompt_len).

        Text-kind predicates REQUIRE aux — with aux zeroed the real/prompt
        region is empty and every row masks to nothing (silent all-zero
        output). Top-level entries default aux from the layout's
        context_length via this method so `aux=None` is always safe; pass an
        explicit aux (runtimes do) when the live prompt is shorter than the
        padded context."""
        lay = self.layout
        pl = lay.context_length if prompt_length is None else prompt_length
        if self.mask_kind == "hyvideo":
            return jnp.asarray([lay.video_length + pl, 0, 0, 0], jnp.int32)
        if self.mask_kind == "cog":
            return jnp.asarray([pl, 0, 0, 0], jnp.int32)
        return jnp.zeros((4,), jnp.int32)

    def _build(self, key, fn):
        # Metadata is cached as a *device array* (jax.device_put), never a
        # numpy constant: baking the metadata into a jitted program as an XLA
        # literal gives it a layout the kernel's HBM DMA does not expect —
        # observed wrong reads and TPU worker crashes. As a device array it
        # becomes a constvar, i.e. a runtime parameter with the standard
        # layout.
        if key not in self._cache:
            # array-building caches must not run under an active trace (any
            # jnp op yields a Tracer there — omnistaging); host-object caches
            # like the profile predicates are trace-safe
            if key != "preds" and isinstance(jnp.zeros(()) + 0, jax.core.Tracer):
                # building under an active trace would cache a tracer
                # (poisoning every later call) AND embed the metadata as a
                # traced literal. Materialize at host level first.
                raise RuntimeError(
                    f"SVG1Plan.{key} must first be built outside jit: call "
                    "plan.sparse_meta()/dense_meta() (or "
                    "the top-level svg1_* entries) at host level, then pass "
                    "the arrays through your jit's arguments."
                )
            self._cache[key] = fn()
        return self._cache[key]

    @property
    def mask_spec_dual(self):
        """(spatial band_sink, temporal band_sink_perm) for inplace mode."""
        lay = self.layout
        w = math.ceil(self.multiplier * lay.frame_size / 128) * 128
        spatial = MaskSpec(kind="band_sink", band_width=w + 1, sink_size=lay.frame_size)
        temporal = MaskSpec(
            kind="band_sink_perm", band_width=w + 1, sink_size=lay.frame_size,
            frame_size=lay.frame_size, num_frames=lay.num_frames,
        )
        return spatial, temporal

    def sparse_meta_dual(self):
        """(meta_spatial, meta_temporal) with a common row length, for the
        per-head metadata select of inplace_temporal mode."""

        def build():
            assert self.mask_kind == "band_sink", self.mask_kind
            lay = self.layout
            nsub = self.seq_pad_kv // MD.SUB
            nq_pad = self.seq_pad_q // self.block_q
            counts = MD.kv_counts_for_seq(lay.seq_len, self.seq_pad_kv)
            bms = core_masks.execution_mask_block(
                lay, self.multiplier, block_q=self.block_q, block_kv=MD.SUB,
                first_frame_sink=True, round_mode="ceil",
            )
            bmt = core_masks.execution_mask_block_perm(
                lay, self.multiplier, block_q=self.block_q, block_kv=MD.SUB,
                round_mode="ceil",
            )
            metas = []
            for bm in (bms, bmt):
                bm = np.pad(bm, ((0, nq_pad - bm.shape[0]), (0, nsub - bm.shape[1])))
                metas.append(MD.chunk_meta_np(bm[None], counts, block_kv=self.block_kv))
            L = max(m.shape[-1] for m in metas)
            metas = [np.pad(m, ((0, 0), (0, 0), (0, L - m.shape[-1]))) for m in metas]
            return jax.device_put(np.concatenate(metas, axis=0))  # (2, nQ, L)

        return self._build("sparse_meta_dual", build)

    def sparse_meta(self):
        def build():
            lay = self.layout
            nsub = self.seq_pad_kv // MD.SUB
            bm = core_masks.execution_mask_block(
                lay,
                self.multiplier,
                block_q=self.block_q,
                block_kv=MD.SUB,
                first_frame_sink=self.mask_kind == "band_sink",
                round_mode="ceil" if self.mask_kind == "band_sink" else "floor",
            )
            bm = np.pad(
                bm,
                ((0, self.seq_pad_q // self.block_q - bm.shape[0]), (0, nsub - bm.shape[1])),
            )
            counts = MD.kv_counts_for_seq(lay.seq_len, self.seq_pad_kv)
            return jax.device_put(MD.chunk_meta_np(bm[None], counts, block_kv=self.block_kv))

        return self._build("sparse_meta", build)

    def dense_meta(self):
        def build():
            counts = MD.kv_counts_for_seq(self.layout.seq_len, self.seq_pad_kv)
            nsub = self.seq_pad_kv // MD.SUB
            bq_d, _ = self.dense_exec
            nq = -(-self.layout.seq_len // bq_d)
            bm = np.ones((1, nq, nsub), bool)
            return jax.device_put(MD.chunk_meta_np(bm, counts, block_kv=self.block_kv))

        return self._build("dense_meta", build)

    def profile_preds(self):
        def build():
            sink = self.layout.context_length == 0  # wan/cosmos profiling masks use the sink
            return tuple(
                core_masks.profile_mask_predicate(
                    self.layout, name, self.cfg.profile_multiplier, first_frame_sink=sink
                )
                for name in ("spatial", "temporal")
            )

        return self._build("preds", build)


def make_svg1_plan(
    layout: VideoLayout,
    cfg: SVGConfig = SVGConfig(),
    warmup: WarmupSchedule = WarmupSchedule(),
    *,
    block_q: int | None = None,
    block_kv: int = 1024,
    mask_kind: str | None = None,
    inplace_temporal: bool = False,
) -> SVG1Plan:
    """block_kv=1024 measured fastest on v5e (scripts/bench_kernel.py: dense
    127 vs 117 TFLOPs at Wan-720p scale); clamped for short sequences.

    block_q default: 1024 at production sequence lengths, 512 below — with
    cheap-first metadata (two-phase kernel loop) the masked paths measured
    fastest at bq=1024 qsplit=4 (scripts/bench_masked_kernel.py: SVG1 band
    247 -> 193 ms, hyvideo dense 2754 -> 1259 ms at 720p scales)."""
    from sparse_videogen_tpu.config import TextPosition

    s_pad = -(-layout.seq_len // 128) * 128
    if block_q is None:
        block_q = 1024 if layout.seq_len >= 8192 else 512
    block_kv = min(block_kv, s_pad)
    block_q = min(block_q, s_pad)
    mul = core_masks.sparsity_to_width(
        cfg.sparsity, layout.context_length, layout.num_frames, layout.frame_size
    )
    if mask_kind is None:
        mask_kind = {
            TextPosition.NONE: "band_sink",
            TextPosition.LAST: "hyvideo",
            TextPosition.FIRST: "cog",
        }[layout.text_position]
    if inplace_temporal:
        assert (mask_kind or "band_sink") == "band_sink", mask_kind
    return SVG1Plan(layout, cfg, warmup, mul, block_q, block_kv, mask_kind,
                    inplace_temporal)


def _pad_seq(x, s_pad):
    return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]), (0, 0)))


def _run_kernel(q, k, v, meta, plan, mask_spec, interpret, aux=None, *,
                block_q=None, qsplit=None):
    B, H, S, D = q.shape
    bq = block_q or plan.block_q
    sq_pad = -(-S // bq) * bq
    qf = _pad_seq(q, sq_pad).reshape(B * H, sq_pad, D)
    kv = pack_kv(
        _pad_seq(k, plan.seq_pad_kv).reshape(B * H, plan.seq_pad_kv, D),
        _pad_seq(v, plan.seq_pad_kv).reshape(B * H, plan.seq_pad_kv, D),
    )
    out = block_sparse_attention_kv(
        qf,
        kv,
        jnp.asarray(meta),
        aux,
        block_q=bq,
        block_kv=plan.block_kv,
        mask_spec=mask_spec,
        qsplit=qsplit if qsplit is not None else plan.sparse_qsplit,
        interpret=interpret,
    )
    return out[:, :S].reshape(B, H, S, D)


@partial(jax.jit, static_argnames=("plan", "interpret"))
def svg1_sparse_impl(q, k, v, rng, meta, plan: SVG1Plan, aux=None, *, interpret=None):
    """Sparse branch with metadata as an explicit operand.

    Metadata MUST flow in as a runtime argument: if it is captured as a
    trace-time constant, XLA inlines it as an HLO literal whose buffer layout
    differs from the (8,128)-tiled layout the kernel's DMA assumes — observed
    wrong reads and TPU worker crashes. Callers inside a larger jit must
    thread it through their own arguments (see sparse/runtimes.py consts()).

    Placement is a reshape+transpose (core/placement.temporal_transpose), not
    a gather — the round-2 (S,) index tables are gone from the arg list.
    """
    mses = sample_mse(
        q,
        k,
        v,
        plan.profile_preds(),
        rng,
        num_sampled_rows=plan.cfg.num_sampled_rows,
        sample_mse_max_row=plan.cfg.sample_mse_max_row,
    )
    best = best_mask_idx(mses)  # (B, H): 0 spatial, 1 temporal
    if plan.inplace_temporal:
        # placement-free: per-head metadata select + dual in-kernel predicate
        # (meta here is the (2, nQ, L) stack from sparse_meta_dual)
        flags = best.reshape(-1).astype(jnp.int32)  # (B*H,)
        meta_bh = jnp.where(flags[:, None, None] == 1, meta[1][None], meta[0][None])
        aux4 = jnp.zeros((4,), jnp.int32) if aux is None else aux.astype(jnp.int32)
        aux_full = jnp.concatenate([aux4, flags])
        return _run_kernel(q, k, v, meta_bh, plan, plan.mask_spec_dual, interpret, aux_full)
    is_t = (best == 1)[..., None, None]
    place = lambda x: jnp.where(is_t, core_placement.temporal_transpose(x, plan.layout), x)
    o = _run_kernel(place(q), place(k), place(v), meta, plan, plan.mask_spec, interpret, aux)
    o_t = core_placement.temporal_transpose(o, plan.layout, inverse=True)
    return jnp.where(is_t, o_t, o)


@partial(jax.jit, static_argnames=("plan", "interpret"))
def dense_impl(q, k, v, meta, plan: SVG1Plan, aux=None, *, interpret=None):
    """Dense attention through the same kernel (explicit full metadata)."""
    bq_d, qs_d = plan.dense_exec
    return _run_kernel(q, k, v, meta, plan, plan.dense_mask_spec, interpret, aux,
                       block_q=bq_d, qsplit=qs_d)


def svg1_sparse_attention(q, k, v, rng, plan: SVG1Plan, aux=None, *, interpret=None):
    """Top-level sparse entry (fetches plan metadata as a device arg)."""
    meta = plan.sparse_meta_dual() if plan.inplace_temporal else plan.sparse_meta()
    if aux is None:
        aux = plan.default_aux()
    return svg1_sparse_impl(q, k, v, rng, meta, plan, aux, interpret=interpret)


def dense_attention_kernel(q, k, v, plan: SVG1Plan, aux=None, *, interpret=None):
    """Top-level dense entry through the same kernel."""
    if aux is None:
        aux = plan.default_aux()
    return dense_impl(q, k, v, plan.dense_meta(), plan, aux, interpret=interpret)


def svg1_attention(q, k, v, timestep, rng, plan: SVG1Plan, layer_idx: int, *, interpret=None):
    """Full SVG1 semantics including the warm-up escape hatch.

    layer_idx is static; timestep is a traced scalar (0..1000 flow timestep).
    Matches attention_core_logic's flags (wan/attention.py:299-309).
    Top-level use only (metadata enters as device args here).
    """
    dense_meta = plan.dense_meta()
    sparse_meta = plan.sparse_meta_dual() if plan.inplace_temporal else plan.sparse_meta()
    aux = plan.default_aux()
    if layer_idx < plan.warmup.first_layers:
        return dense_impl(q, k, v, dense_meta, plan, aux, interpret=interpret)
    return jax.lax.cond(
        timestep > plan.warmup.first_times,
        lambda args: dense_impl(args[0], args[1], args[2], args[4], plan, args[6],
                                interpret=interpret),
        lambda args: svg1_sparse_impl(
            args[0], args[1], args[2], args[3], args[5], plan, args[6],
            interpret=interpret,
        ),
        (q, k, v, rng, dense_meta, sparse_meta, aux),
    )
