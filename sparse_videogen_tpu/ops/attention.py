"""Universal block-sparse flash attention (Pallas, TPU).

One kernel serves dense, SVG1 (static band+sink), and SVG2/SAP (per-head
dynamic cluster map): only the chunked CSR metadata (ops/metadata.py) and
the elementwise MaskSpec differ. It replaces four reference backends —
FlexAttention block masks, FlashInfer fixed-BSR, the patched FlashInfer
VariableBlockSparseAttentionWrapper, and dense flash attention (full
metadata) — see SURVEY.md section 2.1.

Per grid step (= one (batch*head, q-block row)):
  1. DMA the row's metadata [n, (idx, win), ...] HBM -> SMEM (8-row group,
     since int32 HBM tiling is (8,128)).
  2. fori_loop with *data-dependent* trip count n — work scales with the
     number of active chunks, not the worst case.
  3. Each chunk = block_kv tokens of packed [K|V] starting at any 128-aligned
     offset, fetched with ONE double-buffered DMA (K and V are stored
     interleaved as (BH, Skv, 2D) so a chunk is a single contiguous slab).
  4. Online softmax with f32 running (acc, m, l) kept as loop carries in
     vector registers — measured 1.45x over VMEM-scratch accumulators, which
     pay an (block_q, D) f32 read+write per chunk.
  5. Masking: per-entry [lo, hi) column window (sequence tails, SAP cluster
     padding, array-end shifts) + optional MaskSpec token-level predicate
     (reproduces the reference flex mask_mods exactly, incl. partial blocks).

Measured on v5e (S=32k, 12 heads, D=128, bf16, dense metadata;
scripts/bench_kernel.py + bench_qsplit.py): 134 TFLOPs dense at
block_q=2048 with qsplit=8 ping-pong q sub-tiles (121 at the bq=512
single-tile shape — the old "122-TFLOP no-softmax pipeline ceiling" was a
softmax-overlap limit, not a D=128 dot-shape limit; qsplit's independent
per-sub-tile softmax chains hide VPU work under the other tiles' MXU
matmuls with no state merge). Negative results, so the next reader doesn't
retry them: the kv-interleaved split unroll (`unroll=2`, which DOES merge
states at the end) loses ~4%; an in-loop lax.cond branching interior
chunks of band masks to bias-only masking (proven fully-allowed via scalar
interval math) loses 54% — scf.if defeats Mosaic's software pipelining of
the DMA/MXU schedule; masked paths gain from qsplit only up to 2 (the
full-tile predicate is per sub-tile).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_videogen_tpu.ops.mask_spec import MaskSpec, apply_mask_spec
from sparse_videogen_tpu.ops.metadata import ENTRY_SCALE, SUB

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634  # log2(e), for exp2-domain softmax


def pack_kv(k, v):
    """(BH, S, D) x2 -> (BH, S, 2D) interleaved [K|V] for single-DMA chunks."""
    return jnp.concatenate([k, v], axis=-1)


def _kernel(
    # inputs
    aux_ref,  # SMEM (4,) int32 dynamic mask scalars
    meta_hbm,  # HBM (R, nQ8, L) int32
    q_ref,  # VMEM (1, block_q, D)
    kv_ref,  # ANY/HBM (BH, Skv, 2D)
    # outputs (o; optionally m, l softmax stats for ring combination)
    *refs,
    block_q: int,
    block_kv: int,
    head_dim: int,
    mask_spec: MaskSpec,
    scale: float,
    meta_rows: int,
    nbuf: int,
    unroll: int = 1,
    qsplit: int = 1,
    return_stats: bool = False,
    fast_mask: bool = True,
    use_exp2: bool = False,
    mxu_lsum: bool = False,
):
    if return_stats:
        o_ref, m_ref, l_ref, meta_ref, kvbuf, meta_sem, kv_sems = refs
    else:
        o_ref, meta_ref, kvbuf, meta_sem, kv_sems = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    b_meta = 0 if meta_rows == 1 else b
    D = head_dim
    NS = unroll * nbuf  # chunk slots

    # int32 HBM buffers are tiled (8, 128): fetch the aligned 8-row group.
    grp = (i // 8) * 8
    sub = i % 8
    meta_dma = lambda: pltpu.make_async_copy(
        meta_hbm.at[b_meta, pl.ds(grp, 8), :], meta_ref, meta_sem
    )
    # Fetch once per 8-row group: SMEM scratch persists across sequential
    # grid steps, so rows 1..7 reuse it (the i axis is 'arbitrary' =
    # sequential; a fresh b always restarts at i == 0 with sub == 0).
    @pl.when(sub == 0)
    def _():
        meta_dma().start()
        meta_dma().wait()

    n_packed = meta_ref[sub, 0]
    # entry 0 packs n_cheap * N_CHEAP_SCALE + n_total (metadata.py
    # classify_cheap_np): the first n_cheap entries are proven fully-allowed
    # under mask_spec, so the kernel runs them in a bias-only loop and only
    # the remaining edge chunks pay the token-level predicate. Unclassified
    # builders emit n_cheap == 0 (identical behavior).
    from sparse_videogen_tpu.ops.metadata import N_CHEAP_SCALE

    n = n_packed % N_CHEAP_SCALE
    n_cheap = n_packed // N_CHEAP_SCALE
    # chunk count rounded up to the unroll width: tail chunks re-DMA the
    # last real chunk (clamped index) with an empty [lo, hi) window, so the
    # buffers always hold real data (0 * garbage-NaN would poison the PV
    # matmul) and start/wait pairs stay symmetric.
    n_up = ((n + unroll - 1) // unroll) * unroll if unroll > 1 else n

    def kv_copy(slot, c):
        ce = jnp.maximum(jnp.minimum(c, n - 1), 0)
        idx = meta_ref[sub, 1 + 2 * ce]
        return pltpu.make_async_copy(
            kv_ref.at[b, pl.ds(idx * SUB, block_kv), :],
            kvbuf.at[slot],
            kv_sems.at[slot],
        )

    for w in range(unroll * (nbuf - 1)):

        @pl.when(w < n_up)
        def _():
            kv_copy(w % NS, w).start()

    # scale folded into q once per grid step: saves a full (block_q,
    # block_kv) f32 multiply per chunk (f32 mul then cast keeps one rounding).
    # exp2 domain (use_exp2): fold log2(e) into the scale so the softmax
    # exponentials are raw exp2 — the VPU's native transcendental; jnp.exp
    # lowers to exp2(x * log2e) with an extra full-tile multiply per chunk.
    # p values are identical up to rounding (the scale*LOG2E fold and the
    # exp2-vs-exp lowering each round once); only the m stat changes units
    # (converted back at return_stats below). Same trick as
    # _runs_expand_kernel (369 vs 376 ms measured there).
    eff_scale = scale * LOG2E if use_exp2 else scale
    expf = jnp.exp2 if use_exp2 else jnp.exp
    q_s = (q_ref[0].astype(jnp.float32) * eff_scale).astype(q_ref.dtype)
    # ping-pong q sub-tiles: qsplit independent (acc, m, l) chains against
    # the SAME KV chunk let the scheduler hide one tile's VPU softmax under
    # another tile's MXU matmuls, with NO state merge (each sub-tile owns its
    # rows). Measured +11% dense at bq=2048/qsplit=4 (scripts/bench_qsplit.py)
    # — refuting the earlier "D=128 dot shape is the limiter" conclusion.
    SQ = block_q // qsplit
    q_tiles = [q_s[t * SQ : (t + 1) * SQ] for t in range(qsplit)]

    # ---- fast masked path (band_sink / hyvideo / cog): all predicates are
    # functions of (qpos, kpos) = (qbase + r, kbase + c), so hoist everything
    # row-only or (row - col)-only OUT of the chunk loop:
    #   * RC = r - c            one (SQ, block_kv) iota diff, shared by every
    #                           chunk AND every sub-tile (row index is
    #                           tile-local; the tile offset enters as a
    #                           scalar): band test |qpos-kpos| < w becomes
    #                           two compares on RC + per-(chunk, tile) scalar
    #   * row predicates        (SQ, 1) per sub-tile, hoisted (text_row etc.)
    #   * col predicates        (8, block_kv) per chunk, SHARED across the
    #                           qsplit sub-tiles and broadcast
    # This halves the per-chunk VPU predicate cost that capped masked paths
    # at qsplit == 2 (VERDICT r2 item 4).
    fast_kind = fast_mask and (not isinstance(mask_spec, tuple)) and mask_spec.kind in (
        "band_sink", "hyvideo", "cog"
    )
    if fast_kind:
        RC = jax.lax.broadcasted_iota(
            jnp.int32, (SQ, block_kv), 0
        ) - jax.lax.broadcasted_iota(jnp.int32, (SQ, block_kv), 1)
        colv8 = jax.lax.broadcasted_iota(jnp.int32, (8, block_kv), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (SQ, 1), 0)
        qpos_t = [i * block_q + t * SQ + row_iota + aux_ref[2] for t in range(qsplit)]
        if mask_spec.kind == "hyvideo":
            real = aux_ref[0]
            vid = mask_spec.video_len
            real_row = [qp < real for qp in qpos_t]
            fake_row = [qp >= real for qp in qpos_t]
            text_row = [(qp >= vid) & (qp < real) for qp in qpos_t]
        elif mask_spec.kind == "cog":
            plen_row = [qp < aux_ref[0] for qp in qpos_t]

    def fast_masked(t, idx, lo, hi):
        """allowed(s) for sub-tile t against chunk at sub-block idx."""
        spec = mask_spec
        w = spec.band_width
        window = ((colv8 >= lo) & (colv8 < hi))[:1]
        kcol = (colv8 + (idx * SUB + aux_ref[3]))[:1]
        # qpos - kpos = RC + sc (sc scalar per chunk, tile)
        sc = i * block_q + t * SQ + aux_ref[2] - idx * SUB - aux_ref[3]
        d = RC + sc
        band = (d < w) & (d > -w)
        if spec.kind == "band_sink":
            allowed = band | (kcol < spec.sink_size)
        elif spec.kind == "cog":
            allowed = (band | (kcol < aux_ref[0])) | plen_row[t]
        else:  # hyvideo
            real = aux_ref[0]
            vid = spec.video_len
            text_col = (kcol >= vid) & (kcol < real)
            real_col = kcol < real
            allowed = (band | text_col | text_row[t]) & real_row[t] & real_col
            allowed = allowed | (fake_row[t] & ~real_col)
        return allowed & window

    def process(c, states, use_mask=True):
        """Online-softmax update of all q sub-tiles with chunk c (< n_up;
        tail chunks beyond n get an empty window => exactly zero)."""
        ce = jnp.maximum(jnp.minimum(c, n - 1), 0)
        slot = c % NS
        idx = meta_ref[sub, 1 + 2 * ce]
        win = meta_ref[sub, 2 + 2 * ce]
        lo = win // ENTRY_SCALE
        hi = win % ENTRY_SCALE
        hi = jnp.where(c < n, hi, lo)  # tail chunk: empty window

        kv_copy(slot, c).wait()

        k_blk = kvbuf[slot][:, :D]
        v_blk = kvbuf[slot][:, D:]

        colv = jax.lax.broadcasted_iota(jnp.int32, (8, block_kv), 1)
        bias = jnp.where((colv >= lo) & (colv < hi), 0.0, NEG_INF)

        def bias_s(s, t):
            # window masking via a broadcast additive bias over columns only
            # (8, block_kv) instead of full-tile iota/compare/select — the
            # VPU work per chunk drops from ~5 full passes to 1. Masked
            # columns end at ~NEG_INF so p underflows to exactly 0 (the
            # m_safe exponent below covers rows with no live column yet).
            return s + bias[:1]

        def spec_path(spec, t):
            """Exact full-tile predicate for `spec`. NOTE (measured, v5e): a
            lax.cond fast path that proved interior chunks fully-allowed with
            scalar interval math (mask_spec.full_block_allowed) and branched
            to the bias-only masking LOST 54% here (224 -> 344 ms at Wan-720p
            SVG1) — the in-loop scf.if defeats Mosaic's software pipelining
            of the DMA/MXU schedule, which outweighs the VPU savings. Keep
            the masking unconditional."""

            def masked_s(s):
                col = jax.lax.broadcasted_iota(jnp.int32, (SQ, block_kv), 1)
                allowed = (col >= lo) & (col < hi)
                qpos = i * block_q + t * SQ + jax.lax.broadcasted_iota(
                    jnp.int32, (SQ, block_kv), 0
                )
                kpos = idx * SUB + col
                allowed = allowed & apply_mask_spec(spec, qpos, kpos, aux_ref)
                return jnp.where(allowed, s, NEG_INF)

            return masked_s

        new_states = list(states)
        for t in range(qsplit):
            acc, m, l = states[3 * t : 3 * t + 3]
            s = jax.lax.dot_general(
                q_tiles[t], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if use_mask and isinstance(mask_spec, tuple):
                # dual per-head specs (placement-free SVG1): aux[4 + b]
                # selects the head's mask family (0 = spatial, 1 = temporal)
                spec_s, spec_t = mask_spec
                s = jax.lax.cond(
                    aux_ref[4 + b] == 1, spec_path(spec_t, t), spec_path(spec_s, t), s
                )
            elif use_mask and fast_kind:
                s = jnp.where(fast_masked(t, idx, lo, hi), s, NEG_INF)
            elif use_mask and mask_spec.kind != "none":
                s = spec_path(mask_spec, t)(s)
            else:
                s = bias_s(s, t)

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            alpha = expf(m - m_new)
            # rows with every column masked so far have m_new ~ NEG_INF;
            # exponent against 0 instead so their p underflows to exactly 0
            # (no p-kill pass needed in either branch)
            m_safe = jnp.where(m_new > 0.5 * NEG_INF, m_new, 0.0)
            p = expf(s - m_safe)
            pb = p.astype(v_blk.dtype)
            if mxu_lsum:
                # row-sum of p on the MXU (p @ ones, f32 accumulate): removes
                # the f32 (SQ, block_kv) VPU reduce per chunk — the body's
                # MXU and VPU work run serially (measured: pair/unroll/qsplit
                # variants all regress), so VPU volume is wall time. Uses the
                # SAME bf16 p as the PV matmul, making numerator and
                # denominator consistent (the f32-sum path rounds p for PV
                # only).
                ones = jnp.ones((block_kv, 8), v_blk.dtype)
                lsum = jax.lax.dot_general(
                    pb, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, :1]
            else:
                lsum = jnp.sum(p, axis=1, keepdims=True)
            l = l * alpha + lsum
            pv = jax.lax.dot_general(
                pb,
                v_blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_states[3 * t : 3 * t + 3] = [acc * alpha + pv, m_new, l]
        return tuple(new_states)

    def init_states():
        out = ()
        for _ in range(qsplit):
            out += (
                jnp.zeros((SQ, D), jnp.float32),
                jnp.full((SQ, 1), NEG_INF, jnp.float32),
                jnp.zeros((SQ, 1), jnp.float32),
            )
        return out

    if unroll == 1:

        def body(j, carry):
            @pl.when(j + nbuf - 1 < n)
            def _():
                kv_copy((j + nbuf - 1) % NS, j + nbuf - 1).start()

            return process(j, carry)

        def body_cheap(j, carry):
            @pl.when(j + nbuf - 1 < n)
            def _():
                kv_copy((j + nbuf - 1) % NS, j + nbuf - 1).start()

            return process(j, carry, use_mask=False)

        maskable = isinstance(mask_spec, tuple) or mask_spec.kind != "none"
        if maskable:
            # two-phase chunk loop: proven fully-allowed chunks (cheap-first
            # metadata reordering, metadata.py classify_cheap_np) run the
            # bias-only body; edge chunks run the exact predicate body.
            # No per-chunk branch — both loops have static bodies, so
            # Mosaic's DMA/MXU software pipelining is preserved (the in-loop
            # lax.cond alternative measured -54%).
            states = jax.lax.fori_loop(0, n_cheap, body_cheap, init_states())
            states = jax.lax.fori_loop(n_cheap, n, body, states)
        else:
            states = jax.lax.fori_loop(0, n, body_cheap, init_states())
        o = jnp.concatenate(
            [states[3 * t] / jnp.maximum(states[3 * t + 2], 1e-20) for t in range(qsplit)],
            axis=0,
        )
        m = jnp.concatenate([states[3 * t + 1] for t in range(qsplit)], axis=0)
        l = jnp.concatenate([states[3 * t + 2] for t in range(qsplit)], axis=0)
    else:
        # Split-stream unroll: `unroll` independent (acc, m, l) accumulators
        # over interleaved chunk subsets give the scheduler independent
        # MXU/VPU chains to overlap (the online-softmax carry is a serial
        # dependency within a stream but streams only merge at the end —
        # the merge below is the standard flash-attention combine).
        assert qsplit == 1, "unroll > 1 composes with qsplit == 1 only"

        def body(j, carry):
            states = list(carry)
            base = j * unroll
            for u in range(unroll):
                c_pre = base + unroll * (nbuf - 1) + u

                @pl.when(c_pre < n_up)
                def _():
                    kv_copy(c_pre % NS, c_pre).start()

            for u in range(unroll):
                states[3 * u : 3 * u + 3] = list(
                    process(base + u, tuple(states[3 * u : 3 * u + 3]))
                )
            return tuple(states)

        npairs = (n + unroll - 1) // unroll
        init = ()
        for _ in range(unroll):
            init = init + init_states()
        states = jax.lax.fori_loop(0, npairs, body, init)
        acc, m, l = states[0], states[1], states[2]
        for u in range(1, unroll):
            a2, m2, l2 = states[3 * u: 3 * u + 3]
            m_new = jnp.maximum(m, m2)
            # ms guard: all-NEG_INF rows exponentiate against 0 -> weights 0
            ms = jnp.where(m_new > 0.5 * NEG_INF, m_new, 0.0)
            a0 = expf(m - ms)
            a1 = expf(m2 - ms)
            acc = acc * a0 + a2 * a1
            l = l * a0 + l2 * a1
            m = m_new
        o = acc / jnp.maximum(l, 1e-20)

    # rows that never saw a live column have acc == 0 and l == 0 -> output 0
    # (the m_safe exponent guarantees p == 0 for them in every chunk)
    o_ref[0] = o.astype(o_ref.dtype)
    if return_stats:
        if use_exp2:
            # convert the running max back to natural-log units so ring
            # combination across shards stays domain-consistent; keep the
            # NEG_INF no-live-column sentinel unscaled
            m = jnp.where(m > 0.5 * NEG_INF, m / LOG2E, m)
        m_ref[0] = m.reshape(block_q // 128, 128)
        l_ref[0] = l.reshape(block_q // 128, 128)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_kv", "mask_spec", "scale", "nbuf", "unroll", "qsplit", "interpret", "return_stats", "fast_mask", "use_exp2", "mxu_lsum"),
)
def block_sparse_attention_kv(
    q,  # (BH, Sq, D), Sq % block_q == 0
    kv,  # (BH, Skv, 2D) packed [K|V], Skv % 128 == 0, Skv >= block_kv
    meta,  # (R, nQ, 1 + 2*cap) int32, R in {1, BH}
    aux=None,  # (4,) int32 dynamic mask scalars (or None)
    *,
    block_q: int = 512,
    block_kv: int = 512,
    mask_spec: MaskSpec = MaskSpec(),
    scale: float | None = None,
    nbuf: int = 2,
    unroll: int = 1,
    qsplit: int = 1,
    interpret: bool | None = None,
    return_stats: bool = False,
    fast_mask: bool = True,
    use_exp2: bool = True,
    mxu_lsum: bool = False,
):
    BH, Sq, D2 = q.shape[0], q.shape[1], kv.shape[2]
    D = D2 // 2
    Skv = kv.shape[1]
    assert q.shape[2] == D, (q.shape, kv.shape)
    assert Sq % block_q == 0 and Skv % SUB == 0 and Skv >= block_kv
    # metadata chunk counts (_run_chunks / block_kv // SUB) walk SUB-aligned
    # chunk bases; a block_kv that is not a SUB multiple silently visits the
    # wrong windows (found by the full-density fuzz, tests/test_sap_fuzz.py)
    assert block_kv % SUB == 0, (block_kv, SUB)

    nQ = Sq // block_q
    R = meta.shape[0]
    assert meta.shape[1] == nQ and R in (1, BH), (meta.shape, BH, nQ)
    from sparse_videogen_tpu.ops.metadata import ENTRY_SCALE as _ES
    assert block_kv < _ES, (block_kv, _ES)  # window packing round-trip
    # pad metadata rows (HBM (8,128) int32 tiling needs row groups of 8 and
    # 128-multiple row length)
    row_len = meta.shape[-1]
    row_pad = -(-row_len // 128) * 128
    nq_pad = -(-nQ // 8) * 8
    if row_pad != row_len or nq_pad != nQ:
        meta = jnp.pad(meta, ((0, 0), (0, nq_pad - nQ), (0, row_pad - row_len)))
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if aux is None:
        aux = jnp.zeros((4,), jnp.int32)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    # Mosaic HBM DMA slices must be 128-aligned on the minor dim: packed
    # [K|V] needs 2*head_dim % 128 == 0 (i.e. head_dim >= 64) on real TPUs.
    if not interpret:
        assert D2 % 128 == 0, f"packed KV minor dim {D2} must be a multiple of 128"

    assert block_q % qsplit == 0 and (block_q // qsplit) % 8 == 0, (block_q, qsplit)
    assert unroll == 1 or qsplit == 1, (unroll, qsplit)
    kernel = functools.partial(
        _kernel,
        block_q=block_q,
        block_kv=block_kv,
        head_dim=D,
        mask_spec=mask_spec,
        scale=scale,
        meta_rows=R,
        nbuf=nbuf,
        unroll=unroll,
        qsplit=qsplit,
        return_stats=return_stats,
        fast_mask=fast_mask,
        use_exp2=use_exp2,
        mxu_lsum=mxu_lsum,
    )

    out_specs = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((BH, Sq, D), q.dtype)
    if return_stats:
        # softmax stats for cross-shard (ring) combination, packed (Sq/128, 128)
        stat_spec = pl.BlockSpec(
            (1, block_q // 128, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
        stat_shape = jax.ShapeDtypeStruct((BH, Sq // 128, 128), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)

    res = pl.pallas_call(
        kernel,
        grid=(BH, nQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux
            pl.BlockSpec(memory_space=pltpu.HBM),  # meta
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # kv
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((8, row_pad), jnp.int32),
            pltpu.VMEM((unroll * nbuf, block_kv, D2), kv.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((unroll * nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(aux, meta, q, kv)
    if return_stats:
        o, m, l = res
        return o, m.reshape(BH, Sq), l.reshape(BH, Sq)
    return res


# ---------------------------------------------------------------------------
# Runs mode: metadata is a per-row list of maximal token runs [a, b) in the
# (cluster-contiguously permuted, UNPADDED) KV array; the kernel splits runs
# into block_kv-token chunks with scalar math (see ops/metadata.py run_meta_*).
# This is the SAP/SVG2 path at production scale: no cluster padding, metadata
# O(runs-per-row) instead of O(chunks).
# ---------------------------------------------------------------------------


def _runs_kernel(
    aux_ref,
    meta_hbm,  # HBM (R, nQ8, L) int32: [n_chunks, a0, b0, a1, b1, ...]
    q_ref,
    kv_ref,
    # outputs (o; optionally m, l softmax stats for ring combination)
    *refs,
    block_q: int,
    block_kv: int,
    head_dim: int,
    mask_spec: MaskSpec,
    scale: float,
    meta_rows: int,
    nbuf: int,
    nsub: int,
    qsplit: int = 1,
    return_stats: bool = False,
):
    if return_stats:
        o_ref, m_ref, l_ref, meta_ref, kvbuf, meta_sem, kv_sems = refs
    else:
        o_ref, meta_ref, kvbuf, meta_sem, kv_sems = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    b_meta = 0 if meta_rows == 1 else b
    D = head_dim
    C = block_kv // SUB
    max_r = (meta_ref.shape[1] - 1) // 2 - 1

    grp = (i // 8) * 8
    sub = i % 8
    meta_dma = lambda: pltpu.make_async_copy(
        meta_hbm.at[b_meta, pl.ds(grp, 8), :], meta_ref, meta_sem
    )

    @pl.when(sub == 0)
    def _():
        meta_dma().start()
        meta_dma().wait()

    n = meta_ref[sub, 0]

    def run_ab(r):
        rr = jnp.minimum(r, max_r)
        return meta_ref[sub, 1 + 2 * rr], meta_ref[sub, 2 + 2 * rr]

    def chunk_of(r, k):
        """DMA start sub-block idx + valid window [lo, hi) for chunk k of run r."""
        a, bb = run_ab(r)
        base = (a // SUB) * SUB
        s0 = base + k * block_kv
        idxu = s0 // SUB
        idx = jnp.minimum(idxu, nsub - C)
        off = (idxu - idx) * SUB
        lo = jnp.maximum(a - s0, 0) + off
        hi = jnp.minimum(bb - s0, block_kv) + off
        return idx, lo, hi

    def advance(r, k):
        a, bb = run_ab(r)
        base = (a // SUB) * SUB
        m = (bb - base + block_kv - 1) // block_kv
        last = k + 1 >= m
        return jnp.where(last, r + 1, r), jnp.where(last, 0, k + 1)

    def kv_copy(slot, idx):
        return pltpu.make_async_copy(
            kv_ref.at[b, pl.ds(idx * SUB, block_kv), :],
            kvbuf.at[slot],
            kv_sems.at[slot],
        )

    rp = jnp.int32(0)
    kp = jnp.int32(0)
    for w in range(nbuf - 1):
        idx_w, _, _ = chunk_of(rp, kp)

        @pl.when(w < n)
        def _():
            kv_copy(w % nbuf, idx_w).start()

        rp, kp = advance(rp, kp)

    # scale folded into q once per grid step (saves a (block_q, block_kv)
    # f32 multiply per chunk)
    q_s = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    # ping-pong q sub-tiles (same trick as the chunked kernel): independent
    # per-sub-tile softmax chains against the shared KV chunk let Mosaic
    # hide one tile's VPU softmax under another's MXU matmuls. At bq=128
    # the sub-tiles are (64, D) — MXU-underfull, but the runs kernel is
    # VPU-dominated at D=128 so the overlap is what matters (measured via
    # scripts/bench_sap_breakdown.py).
    SQ = block_q // qsplit
    q_tiles = [q_s[t * SQ : (t + 1) * SQ] for t in range(qsplit)]

    def body(j, carry):
        rc, kc, rp, kp = carry[-4:]
        states = list(carry[:-4])
        slot = j % nbuf

        idx_p, _, _ = chunk_of(rp, kp)

        @pl.when(j + nbuf - 1 < n)
        def _():
            kv_copy((j + nbuf - 1) % nbuf, idx_p).start()

        rp, kp = advance(rp, kp)

        idx, lo, hi = chunk_of(rc, kc)
        kv_copy(slot, idx).wait()
        k_blk = kvbuf[slot][:, :D]
        v_blk = kvbuf[slot][:, D:]

        if mask_spec.kind == "none":
            # [lo, hi) is row-independent: mask via a broadcast column bias
            # (8, block_kv) instead of full-tile iota/compare/select (runs
            # are non-empty so every row sees >= 1 live column per chunk)
            colv = jax.lax.broadcasted_iota(jnp.int32, (8, block_kv), 1)
            bias = jnp.where((colv >= lo) & (colv < hi), 0.0, NEG_INF)

        for t in range(qsplit):
            acc, m, l = states[3 * t : 3 * t + 3]
            s = jax.lax.dot_general(
                q_tiles[t], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mask_spec.kind != "none":
                col = jax.lax.broadcasted_iota(jnp.int32, (SQ, block_kv), 1)
                allowed = (col >= lo) & (col < hi)
                qpos = i * block_q + t * SQ + jax.lax.broadcasted_iota(
                    jnp.int32, (SQ, block_kv), 0
                )
                kpos = idx * SUB + col
                allowed = allowed & apply_mask_spec(mask_spec, qpos, kpos, aux_ref)
                s = jnp.where(allowed, s, NEG_INF)
            else:
                s = s + bias[:1]

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            if mask_spec.kind != "none":
                p = jnp.where(allowed, p, 0.0)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype),
                v_blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            states[3 * t : 3 * t + 3] = [acc * alpha + pv, m_new, l]
        rc, kc = advance(rc, kc)
        return tuple(states) + (rc, kc, rp, kp)

    init = ()
    for _ in range(qsplit):
        init += (
            jnp.zeros((SQ, D), jnp.float32),
            jnp.full((SQ, 1), NEG_INF, jnp.float32),
            jnp.zeros((SQ, 1), jnp.float32),
        )
    z = jnp.int32(0)
    out_states = jax.lax.fori_loop(0, n, body, init + (z, z, rp, kp))
    o = jnp.concatenate(
        [out_states[3 * t] / jnp.maximum(out_states[3 * t + 2], 1e-20)
         for t in range(qsplit)],
        axis=0,
    )
    m = jnp.concatenate([out_states[3 * t + 1] for t in range(qsplit)], axis=0)
    l = jnp.concatenate([out_states[3 * t + 2] for t in range(qsplit)], axis=0)
    if mask_spec.kind == "none":
        # bias-path safety: rows that saw no chunk at all (n == 0) keep
        # m == NEG_INF -> zero them (matches the chunked kernel)
        o = jnp.where(m > 0.5 * NEG_INF, o, 0.0)
    o_ref[0] = o.astype(o_ref.dtype)
    if return_stats:
        m_ref[0] = m.reshape(block_q // 128, 128)
        l_ref[0] = l.reshape(block_q // 128, 128)


def _runs_expand_kernel(
    aux_ref,
    meta_hbm,  # HBM (R, nQ8, L) int32: [n_chunks, a0, b0, a1, b1, ...]
    q_ref,
    kv_ref,
    # outputs (o; optionally m, l softmax stats for ring combination)
    *refs,
    block_q: int,
    block_kv: int,
    head_dim: int,
    scale: float,
    meta_rows: int,
    nbuf: int,
    nsub: int,
    jcap: int,
    qsplit: int = 1,
    unroll: int = 1,
    pair: int = 1,
    return_stats: bool = False,
    use_exp2: bool = False,
    mxu_lsum: bool = False,
):
    """Runs-mode metadata, chunked-style execution.

    The original runs kernel (`_runs_kernel`) interleaves a scalar run-walk
    (`run_ab`/`advance`: SMEM reads + div/mod chains) with every chunk of the
    main loop — measured ~410 ms at the H=40 S=75,600 fd=0.25 SAP config vs
    a ~224 ms MXU floor: the serial scalar chain gates DMA issue and starves
    Mosaic's software pipeline. Here the walk runs ONCE as a scalar prologue
    that expands the run list into an SMEM chunk-descriptor table (idx, win),
    partitioned full-window-chunks-first; the main work is then two fori
    loops with static bodies exactly like the proven chunked kernel
    (`_kernel`, 148 TFLOPs dense-class efficiency):
      * full chunks (lo == 0, hi == block_kv — the majority after popularity
        relabeling coalesces KV runs) skip window masking entirely,
      * edge chunks apply the [lo, hi) window as a broadcast column bias.
    Prologue cost: n (~20-40) iterations x ~15 scalar ops per grid row.

    Measured (v5e, H=40 S=75,600 D=128 fd=0.25, bq=256/bkv=1024,
    scripts/bench_runs_expand.py): in-loop walk 380 ms; expand 376; expand +
    exp2 369 (the win is the removed log2e multiply pass, not the
    restructure — the old kernel was NOT scalar-gated after all). The
    per-unit floor is max(MXU ~207 ms at 148 TFLOPs incl. ~2% q padding,
    KV DMA ~150 ms, VPU softmax ~126 ms); the ~160 ms gap is the VPU chain
    serializing against MXU across fori iterations — consistent with a
    fully SERIAL MXU+VPU model (207 + 126 + overhead ~= 369 measured).
    NEGATIVE results, so the next reader doesn't retry them (all at the
    H=40 S=75,600 fd=0.25 config, round 3-4):
      * unroll=2 independent streams 403 ms, unroll=2/nbuf=2 405, unroll=3
        432 (extra VMEM slots + state merge cost more than the overlap pays)
      * qsplit=2 422 (sub-tiles too small at bq=256)
      * pair=2 (N chunks per iteration, ONE combined rescale — halves the
        loop-carried rescale chain) 405, pair=3 422, pair=4 421: widening
        the body does not unlock VPU/MXU overlap either; Mosaic schedules
        the body's ops serially regardless of independence
      * mxu_lsum=True (row-sum of p as a p @ ones MXU dot instead of the
        f32 VPU reduce) 467: the third matmul adds serial MXU latency per
        chunk that exceeds the VPU saving
      * nbuf=4 no change (the pipeline is not DMA-starved)
    All knobs kept for experiments. Conclusion: per-chunk VPU volume (exp2 +
    max + sum over (SQ, block_kv) f32) is wall time added to MXU time; the
    remaining levers are outside the kernel (fewer selected columns, i.e.
    density — see utils/organic.py — or a future Mosaic that co-schedules
    VPU with MXU across fori iterations).
    """
    if return_stats:
        o_ref, m_ref, l_ref, meta_ref, tbl, kvbuf, meta_sem, kv_sems = refs
    else:
        o_ref, meta_ref, tbl, kvbuf, meta_sem, kv_sems = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    b_meta = 0 if meta_rows == 1 else b
    D = head_dim
    C = block_kv // SUB
    max_r = (meta_ref.shape[1] - 1) // 2 - 1

    grp = (i // 8) * 8
    sub = i % 8
    meta_dma = lambda: pltpu.make_async_copy(
        meta_hbm.at[b_meta, pl.ds(grp, 8), :], meta_ref, meta_sem
    )

    @pl.when(sub == 0)
    def _():
        meta_dma().start()
        meta_dma().wait()

    n = meta_ref[sub, 0]

    # ---- scalar prologue: expand runs -> chunk table, full-first ----------
    def exp_body(j, carry):
        r, k, ci, ei = carry
        rr = jnp.minimum(r, max_r)
        a = meta_ref[sub, 1 + 2 * rr]
        bb = meta_ref[sub, 2 + 2 * rr]
        base = (a // SUB) * SUB
        s0 = base + k * block_kv
        idxu = s0 // SUB
        idx = jnp.minimum(idxu, nsub - C)
        off = (idxu - idx) * SUB
        lo = jnp.maximum(a - s0, 0) + off
        hi = jnp.minimum(bb - s0, block_kv) + off
        full = (lo == 0) & (hi == block_kv)
        pos = jnp.where(full, ci, ei)
        tbl[0, pos] = idx
        tbl[1, pos] = lo * ENTRY_SCALE + hi
        m = (bb - base + block_kv - 1) // block_kv
        last = k + 1 >= m
        fi = full.astype(jnp.int32)
        return (
            jnp.where(last, r + 1, r),
            jnp.where(last, 0, k + 1),
            ci + fi,
            ei - (1 - fi),
        )

    _, _, n_cheap, _ = jax.lax.fori_loop(
        0, n, exp_body, (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(jcap - 1))
    )

    def entry_pos(c):
        # cheap chunks live at [0, n_cheap); edge chunks at [jcap-1, ...) desc
        return jnp.where(c < n_cheap, c, jcap - 1 - (c - n_cheap))

    G = max(unroll, pair)  # chunks consumed per fori iteration
    NS = G * nbuf  # chunk DMA slots

    def kv_copy(slot, c):
        ce = jnp.maximum(jnp.minimum(c, n - 1), 0)
        idx = tbl[0, entry_pos(ce)]
        return pltpu.make_async_copy(
            kv_ref.at[b, pl.ds(idx * SUB, block_kv), :],
            kvbuf.at[slot],
            kv_sems.at[slot],
        )

    # tail chunks (c >= n, only with G > 1) re-DMA a clamped real chunk
    # with an empty window, so buffers hold real data and start/wait pairs
    # stay symmetric (mirrors the chunked kernel's n_up scheme)
    n_up = ((n + G - 1) // G) * G if G > 1 else n

    for w in range(G * (nbuf - 1)):

        @pl.when(w < n_up)
        def _():
            kv_copy(w % NS, w).start()

    # exp2 domain: fold log2(e) into the q scale so the softmax exponentials
    # are raw exp2 (the VPU's native transcendental; jnp.exp lowers to
    # exp2(x * log2e) with an extra full-tile multiply). p values are
    # identical up to rounding (the scale*LOG2E fold and the exp2-vs-exp
    # lowering each round once); only the m stat changes units.
    eff_scale = scale * LOG2E if use_exp2 else scale
    expf = jnp.exp2 if use_exp2 else jnp.exp
    q_s = (q_ref[0].astype(jnp.float32) * eff_scale).astype(q_ref.dtype)
    SQ = block_q // qsplit
    q_tiles = [q_s[t * SQ : (t + 1) * SQ] for t in range(qsplit)]

    def process(c, states, windowed: bool):
        slot = c % NS
        pos = entry_pos(jnp.minimum(c, n - 1))
        win = tbl[1, pos]
        win = jnp.where(c < n, win, 0)  # tail chunk (unroll): empty window
        lo = win // ENTRY_SCALE
        hi = win % ENTRY_SCALE

        kv_copy(slot, c).wait()
        k_blk = kvbuf[slot][:, :D]
        v_blk = kvbuf[slot][:, D:]

        if windowed:
            colv = jax.lax.broadcasted_iota(jnp.int32, (8, block_kv), 1)
            bias = jnp.where((colv >= lo) & (colv < hi), 0.0, NEG_INF)

        new_states = list(states)
        for t in range(qsplit):
            acc, m, l = states[3 * t : 3 * t + 3]
            s = jax.lax.dot_general(
                q_tiles[t], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if windowed:
                s = s + bias[:1]

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            alpha = expf(m - m_new)
            # rows with every column masked so far: exponent against 0 so p
            # underflows to exactly 0 (same m_safe trick as the chunked
            # kernel; on the full path every column is live but the carry m
            # can still be NEG_INF only before the first chunk, where
            # m_new == m_cur is finite)
            m_safe = jnp.where(m_new > 0.5 * NEG_INF, m_new, 0.0)
            p = expf(s - m_safe)
            pb = p.astype(v_blk.dtype)
            if mxu_lsum:
                # row-sum of p on the MXU (p @ ones, f32 accumulate): removes
                # the f32 (SQ, block_kv) VPU reduce per chunk — the body's
                # MXU and VPU work run serially (measured: pair/unroll/qsplit
                # variants all regress), so VPU volume is wall time. Uses the
                # SAME bf16 p as the PV matmul, making numerator and
                # denominator consistent (the f32-sum path rounds p for PV
                # only).
                ones = jnp.ones((block_kv, 8), v_blk.dtype)
                lsum = jax.lax.dot_general(
                    pb, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, :1]
            else:
                lsum = jnp.sum(p, axis=1, keepdims=True)
            l = l * alpha + lsum
            pv = jax.lax.dot_general(
                pb,
                v_blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_states[3 * t : 3 * t + 3] = [acc * alpha + pv, m_new, l]
        return tuple(new_states)

    def init_states():
        out = ()
        for _ in range(qsplit):
            out += (
                jnp.zeros((SQ, D), jnp.float32),
                jnp.full((SQ, 1), NEG_INF, jnp.float32),
                jnp.zeros((SQ, 1), jnp.float32),
            )
        return out

    if G == 1:

        def body_full(j, carry):
            @pl.when(j + nbuf - 1 < n)
            def _():
                kv_copy((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

            return process(j, carry, windowed=False)

        def body_edge(j, carry):
            @pl.when(j + nbuf - 1 < n)
            def _():
                kv_copy((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

            return process(j, carry, windowed=True)

        states = jax.lax.fori_loop(0, n_cheap, body_full, init_states())
        states = jax.lax.fori_loop(n_cheap, n, body_edge, states)
        o = jnp.concatenate(
            [states[3 * t] / jnp.maximum(states[3 * t + 2], 1e-20)
             for t in range(qsplit)],
            axis=0,
        )
        m = jnp.concatenate([states[3 * t + 1] for t in range(qsplit)], axis=0)
        l = jnp.concatenate([states[3 * t + 2] for t in range(qsplit)], axis=0)
    elif pair > 1:
        # `pair` chunks per fori iteration, ONE combined online-softmax
        # update: the serial loop-carried VPU chain (m_new -> alpha -> acc
        # rescale) runs once per `pair` chunks instead of once per chunk,
        # and the pair's matmuls/exp2s are mutually independent inside the
        # iteration, so the scheduler can interleave MXU and VPU work.
        # Unlike `unroll` (independent state streams + end merge, measured
        # regression), this is a single exact flash-attention state; the
        # per-chunk [lo, hi) windows keep run-edge waste at block_kv
        # granularity (vs doubling block_kv, which regressed on edge waste).
        assert qsplit == 1, "pair > 1 composes with qsplit == 1 only"

        def body_cpair(j, carry, windowed):
            base = j * pair
            for u in range(pair):
                c_pre = base + pair * (nbuf - 1) + u

                @pl.when(c_pre < n_up)
                def _():
                    kv_copy(c_pre % NS, c_pre).start()

            acc, m, l = carry
            ss, vbs = [], []
            for u in range(pair):
                c = base + u
                pos = entry_pos(jnp.minimum(c, n - 1))
                win = jnp.where(c < n, tbl[1, pos], 0)
                lo = win // ENTRY_SCALE
                hi = win % ENTRY_SCALE
                kv_copy(c % NS, c).wait()
                k_blk = kvbuf[c % NS][:, :D]
                vbs.append(kvbuf[c % NS][:, D:])
                s = jax.lax.dot_general(
                    q_s, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if windowed:
                    colv = jax.lax.broadcasted_iota(jnp.int32, (8, block_kv), 1)
                    bias = jnp.where((colv >= lo) & (colv < hi), 0.0, NEG_INF)
                    s = s + bias[:1]
                ss.append(s)
            m_cur = jnp.max(ss[0], axis=1, keepdims=True)
            for s in ss[1:]:
                m_cur = jnp.maximum(m_cur, jnp.max(s, axis=1, keepdims=True))
            m_new = jnp.maximum(m, m_cur)
            alpha = expf(m - m_new)
            m_safe = jnp.where(m_new > 0.5 * NEG_INF, m_new, 0.0)
            ps = [expf(s - m_safe) for s in ss]
            lsum = jnp.sum(ps[0], axis=1, keepdims=True)
            for p in ps[1:]:
                lsum = lsum + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                ps[0].astype(vbs[0].dtype), vbs[0],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            for p, vb in zip(ps[1:], vbs[1:]):
                pv = pv + jax.lax.dot_general(
                    p.astype(vb.dtype), vb,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            return (acc * alpha + pv, m_new, l * alpha + lsum)

        # full-window pairs bias-free; the remainder (incl. a possible odd
        # full chunk and the clamped empty-window tails) runs windowed —
        # full chunks decode to lo == 0, hi == block_kv -> zero bias, so the
        # windowed path is correct for them, just not predicate-free
        ncp = n_cheap // pair
        npairs = n_up // pair
        states = jax.lax.fori_loop(
            0, ncp, functools.partial(body_cpair, windowed=False), init_states())
        states = jax.lax.fori_loop(
            ncp, npairs, functools.partial(body_cpair, windowed=True), states)
        acc, m, l = states
        o = acc / jnp.maximum(l, 1e-20)
    else:
        # `unroll` independent (acc, m, l) streams over interleaved chunks:
        # stream B's matmul is independent of stream A's softmax carry, so
        # the scheduler can hide the VPU softmax chain (the measured
        # bottleneck: fori iterations do not overlap) under the other
        # stream's MXU work. Standard flash-attention state merge at the end.
        assert qsplit == 1, "unroll > 1 composes with qsplit == 1 only"

        def body_pair(j, carry, windowed):
            states = list(carry)
            base = j * unroll
            for u in range(unroll):
                c_pre = base + unroll * (nbuf - 1) + u

                @pl.when(c_pre < n_up)
                def _():
                    kv_copy(c_pre % NS, c_pre).start()

            for u in range(unroll):
                states[3 * u : 3 * u + 3] = list(
                    process(base + u, tuple(states[3 * u : 3 * u + 3]), windowed)
                )
            return tuple(states)

        ncp = n_cheap // unroll  # full-window pairs; remainder runs windowed
        npairs = n_up // unroll
        init = ()
        for _ in range(unroll):
            init += init_states()
        states = jax.lax.fori_loop(0, ncp, functools.partial(body_pair, windowed=False), init)
        states = jax.lax.fori_loop(ncp, npairs, functools.partial(body_pair, windowed=True), states)
        acc, m, l = states[0], states[1], states[2]
        for u in range(1, unroll):
            a2, m2, l2 = states[3 * u : 3 * u + 3]
            m_new = jnp.maximum(m, m2)
            # ms guard: all-NEG_INF rows exponentiate against 0 -> weights 0
            ms = jnp.where(m_new > 0.5 * NEG_INF, m_new, 0.0)
            a0 = expf(m - ms)
            a1 = expf(m2 - ms)
            acc = acc * a0 + a2 * a1
            l = l * a0 + l2 * a1
            m = m_new
        o = acc / jnp.maximum(l, 1e-20)
    o_ref[0] = o.astype(o_ref.dtype)
    if return_stats:
        if use_exp2:
            # convert the running max back to natural-log units so ring
            # combination with chunked-kernel (jnp.exp) stats stays exact;
            # keep the NEG_INF no-live-column sentinel unscaled
            m = jnp.where(m > 0.5 * NEG_INF, m / LOG2E, m)
        m_ref[0] = m.reshape(block_q // 128, 128)
        l_ref[0] = l.reshape(block_q // 128, 128)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_kv", "mask_spec", "scale", "nbuf", "qsplit", "unroll", "pair", "interpret", "return_stats", "expand", "use_exp2", "mxu_lsum"),
)
def block_sparse_attention_runs(
    q,  # (BH, Sq, D), Sq % block_q == 0
    kv,  # (BH, Skv, 2D) packed [K|V], Skv % 128 == 0, Skv >= block_kv
    meta,  # (R, nQ, 1 + 2*cap) int32 run lists, R in {1, BH}
    aux=None,
    *,
    block_q: int = 128,
    block_kv: int = 512,
    mask_spec: MaskSpec = MaskSpec(),
    scale: float | None = None,
    nbuf: int = 3,
    qsplit: int = 1,
    unroll: int = 1,
    pair: int = 1,
    interpret: bool | None = None,
    return_stats: bool = False,
    expand: bool = True,
    use_exp2: bool = True,
    mxu_lsum: bool = False,
):
    """Block-sparse flash attention over run-list metadata (see run_meta_jnp)."""
    BH, Sq, D2 = q.shape[0], q.shape[1], kv.shape[2]
    D = D2 // 2
    Skv = kv.shape[1]
    assert q.shape[2] == D, (q.shape, kv.shape)
    assert Sq % block_q == 0 and Skv % SUB == 0 and Skv >= block_kv
    # metadata chunk counts (_run_chunks / block_kv // SUB) walk SUB-aligned
    # chunk bases; a block_kv that is not a SUB multiple silently visits the
    # wrong windows (found by the full-density fuzz, tests/test_sap_fuzz.py)
    assert block_kv % SUB == 0, (block_kv, SUB)

    nQ = Sq // block_q
    R = meta.shape[0]
    assert meta.shape[1] == nQ and R in (1, BH), (meta.shape, BH, nQ)
    row_len = meta.shape[-1]
    row_pad = -(-row_len // 128) * 128
    nq_pad = -(-nQ // 8) * 8
    if row_pad != row_len or nq_pad != nQ:
        meta = jnp.pad(meta, ((0, 0), (0, nq_pad - nQ), (0, row_pad - row_len)))
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if aux is None:
        aux = jnp.zeros((4,), jnp.int32)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if not interpret:
        assert D2 % 128 == 0, f"packed KV minor dim {D2} must be a multiple of 128"

    assert block_q % qsplit == 0 and (block_q // qsplit) % 8 == 0, (block_q, qsplit)
    # expand mode: scalar-prologue expansion into an SMEM chunk table +
    # chunked-style main loops (_runs_expand_kernel). Supports the "none"
    # mask only (SAP text-last layouts already fold text into extra
    # clusters); other specs fall back to the in-loop run walk.
    expand = expand and (isinstance(mask_spec, MaskSpec) and mask_spec.kind == "none")
    assert unroll == 1 or (expand and qsplit == 1), (unroll, qsplit, expand)
    assert pair == 1 or (expand and qsplit == 1 and unroll == 1), (pair, qsplit, unroll, expand)
    cap_runs = (meta.shape[-1] - 1) // 2
    jcap = cap_runs + Skv // block_kv + 2
    slots = (max(unroll, pair) if expand else 1) * nbuf
    if expand:
        kernel = functools.partial(
            _runs_expand_kernel,
            block_q=block_q,
            block_kv=block_kv,
            head_dim=D,
            scale=scale,
            meta_rows=R,
            nbuf=nbuf,
            nsub=Skv // SUB,
            jcap=jcap,
            qsplit=qsplit,
            unroll=unroll,
            pair=pair,
            return_stats=return_stats,
            use_exp2=use_exp2,
            mxu_lsum=mxu_lsum,
        )
    else:
        kernel = functools.partial(
            _runs_kernel,
            block_q=block_q,
            block_kv=block_kv,
            head_dim=D,
            mask_spec=mask_spec,
            scale=scale,
            meta_rows=R,
            nbuf=nbuf,
            nsub=Skv // SUB,
            qsplit=qsplit,
            return_stats=return_stats,
        )

    out_specs = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((BH, Sq, D), q.dtype)
    if return_stats:
        stat_spec = pl.BlockSpec(
            (1, block_q // 128, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
        stat_shape = jax.ShapeDtypeStruct((BH, Sq // 128, 128), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)

    res = pl.pallas_call(
        kernel,
        grid=(BH, nQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((8, row_pad), jnp.int32),
            *([pltpu.SMEM((2, jcap), jnp.int32)] if expand else []),
            pltpu.VMEM((slots, block_kv, D2), kv.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(aux, meta, q, kv)
    if return_stats:
        o, m, l = res
        return o, m.reshape(BH, Sq), l.reshape(BH, Sq)
    return res


def block_sparse_attention(q, k, v, meta, aux=None, **kw):
    """Convenience wrapper taking separate K/V (packs into one [K|V] array)."""
    return block_sparse_attention_kv(q, pack_kv(k, v), meta, aux, **kw)


def block_sparse_attention_reference(
    q, k, v, meta, aux=None, *, block_q=512, block_kv=512, mask_spec=MaskSpec(), scale=None, **_,
):
    """Pure-jnp oracle: decode metadata -> dense mask -> masked attention.

    Small shapes only (materializes Sq x Skv); used by tests.
    """
    import numpy as np

    from sparse_videogen_tpu.core.attention_ref import masked_attention
    from sparse_videogen_tpu.ops.metadata import decode_meta

    BH, Sq, D = q.shape
    Skv = k.shape[1]
    nQ = Sq // block_q
    mask = decode_meta(meta, block_kv=block_kv, seq_kv=Skv)  # (R, nQ, Skv)
    R = mask.shape[0]
    mask = np.repeat(mask, block_q, axis=1)  # (R, Sq, Skv)
    qpos = np.arange(Sq)[:, None]
    kpos = np.arange(Skv)[None, :]
    pred = apply_mask_spec(mask_spec, jnp.asarray(qpos), jnp.asarray(kpos), aux)
    if pred is not None:
        mask = mask & np.asarray(pred)[None]
    if R == 1 and BH > 1:
        mask = np.broadcast_to(mask, (BH, Sq, Skv))
    return masked_attention(q, k, v, jnp.asarray(mask), scale=scale)
