"""Chunked CSR metadata for the universal block-sparse attention kernel.

The kernel consumes, per (row r, q-block i), an int32 vector
    meta[r, i, :] = [n, idx_0, win_0, idx_1, win_1, ...]
where each entry describes one KV *chunk*:
  - idx: start of the chunk in 128-token sub-blocks (chunks may start at any
    128-aligned offset; the DMA size is the static block_kv).
  - win = lo * ENTRY_SCALE + hi: allowed columns are [lo, hi) within the
    chunk (ENTRY_SCALE must exceed the largest block_kv so a full chunk's
    hi == block_kv survives the pack/unpack round trip)
    (everything outside is masked to -inf). This encodes sequence-tail
    padding, SAP cluster padding, and array-end DMA shifts exactly.

Rows R: 1 (mask shared across heads — dense, SVG1; the reference's flex
block mask is also head-shared, wan/attention.py:321) or B*H (SVG2's
per-head dynamic map).

This layer replaces the reference's FlashInfer BSR plan() and its patched
Triton index expansion (assets/patches/modifications.patch): the "plan" is
pure integer math, on-device and jit-able (jnp builder) or at trace time
(numpy builder for static masks).

Chunking model: the 128-sub-block level mask is decomposed into *runs* of
consecutive visited sub-blocks; a run breaks after any partially-valid
sub-block (so each chunk's valid tokens are a contiguous [lo, hi) window).
Runs are cut into chunks of block_kv tokens — long runs (dense, SVG1 bands)
execute at full-tile efficiency, fragmented runs (SAP small clusters)
degrade gracefully to single-sub-block chunks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SUB = 128  # sub-block granularity (alignment of chunk starts)
# must be > max block_kv: hi can equal block_kv (full chunk) and must
# round-trip through lo * ENTRY_SCALE + hi. 1024 silently corrupted full
# chunks at block_kv=1024 (win=1024 decoded as lo=1, hi=0 -> empty window).
ENTRY_SCALE = 2048
ENTRY_STRIDE = 2


# meta[..., 0] packs n_cheap * N_CHEAP_SCALE + n_total (see classify_cheap_np;
# builders emit plain n_total = n_cheap 0, which is identical under unpacking)
N_CHEAP_SCALE = 4096


def pack_window(lo, hi):
    return lo * ENTRY_SCALE + hi


def classify_cheap_np(meta, spec, aux, *, block_q: int, block_kv: int, seq_q: int | None = None):
    """Reorder each row's entries cheap-first; pack counts into entry 0.

    A chunk is *cheap* when every (q, k) pair in [q-block rows] x [its
    [lo, hi) window] is allowed by `spec` (mask_spec.full_block_allowed —
    conservative scalar interval math), so the kernel's bias-only loop can
    process it with no token-level predicate. Edge chunks keep the exact
    predicate path. This removes the ~2x VPU masking tax from the interior
    of band/text masks without any in-loop branch (the round-2 lax.cond
    fast path lost 54% to broken software pipelining; two fori_loops with
    static bodies pipeline fine).

    q rows at/after seq_q are kernel padding whose outputs are discarded —
    blocks fully inside padding are classified cheap unconditionally.

    meta: (R, nQ, 1 + 2*cap) from chunk_meta_np/jnp (NOT runs-mode).
    spec/aux: the exact values the kernel will run with (aux prompt scalars
    as numpy). Returns a new meta array.
    """
    import numpy as _np

    meta = _np.asarray(meta).copy()
    if spec is None or getattr(spec, "kind", "none") == "none":
        return meta
    from sparse_videogen_tpu.ops.mask_spec import full_block_allowed

    R, nQ, row_len = meta.shape
    cap = (row_len - 1) // ENTRY_STRIDE
    n = meta[..., 0] % N_CHEAP_SCALE  # (R, nQ)
    idx = meta[..., 1::2][..., :cap]
    win = meta[..., 2::2][..., :cap]
    lo = win // ENTRY_SCALE
    hi = win % ENTRY_SCALE
    k0 = idx * SUB + lo
    k1 = idx * SUB + hi - 1
    q0 = (_np.arange(nQ, dtype=_np.int64) * block_q)[None, :, None]
    q1 = q0 + block_q - 1
    if seq_q is not None:
        pad_block = q0 >= seq_q
        q1 = _np.minimum(q1, seq_q - 1)
    else:
        pad_block = _np.zeros_like(q0, bool)
    aux = None if aux is None else _np.asarray(aux)
    cheap = _np.asarray(full_block_allowed(spec, q0, _np.maximum(q1, q0), k0, k1, aux))
    cheap = (cheap | pad_block) & (hi > lo)
    e = _np.arange(cap)[None, None, :]
    valid = e < n[..., None]
    key = _np.where(~valid, 2, _np.where(cheap, 0, 1)).astype(_np.int8)
    order = _np.argsort(key, axis=-1, kind="stable")
    out = meta.copy()
    out[..., 1::2][..., :cap] = _np.take_along_axis(idx, order, axis=-1)
    out[..., 2::2][..., :cap] = _np.take_along_axis(win, order, axis=-1)
    n_cheap = _np.sum(cheap & valid, axis=-1)
    out[..., 0] = n_cheap * N_CHEAP_SCALE + n
    return out


def meta_row_len(cap: int) -> int:
    return 1 + ENTRY_STRIDE * cap


def chunk_meta_np(mask: np.ndarray, counts: np.ndarray, *, block_kv: int, cap: int | None = None) -> np.ndarray:
    """Numpy (trace-time) builder.

    Args:
      mask: (R, nQ, nsub) bool over 128-token sub-blocks.
      counts: (R, nsub) int32 valid tokens per sub-block (0..128).
      block_kv: chunk size in tokens (multiple of 128, < ENTRY_SCALE).
      cap: max entries per row (default: exact worst case of this mask).

    Returns meta (R, nQ, 1 + 2*cap) int32.
    """
    R, nQ, nsub = mask.shape
    assert block_kv < ENTRY_SCALE, (block_kv, ENTRY_SCALE)
    C = block_kv // SUB
    rows = []
    max_n = 0
    for r in range(R):
        for i in range(nQ):
            entries = []
            j = 0
            while j < nsub:
                if not (mask[r, i, j] and counts[r, j] > 0):
                    j += 1
                    continue
                # walk a run: consecutive visited sub-blocks, break after partial
                start = j
                span = 0
                valid = 0
                while (
                    j < nsub
                    and span < C
                    and mask[r, i, j]
                    and counts[r, j] > 0
                ):
                    valid += int(counts[r, j])
                    partial = counts[r, j] < SUB
                    span += 1
                    j += 1
                    if partial:
                        break
                idx = min(start, nsub - C)  # keep the DMA inside the array
                lo = (start - idx) * SUB
                entries.append((idx, pack_window(lo, lo + valid)))
            rows.append(entries)
            max_n = max(max_n, len(entries))
    if cap is None:
        cap = max_n
    meta = np.zeros((R, nQ, meta_row_len(cap)), np.int32)
    it = iter(rows)
    for r in range(R):
        for i in range(nQ):
            entries = next(it)[:cap]
            meta[r, i, 0] = len(entries)
            for e, (idx, win) in enumerate(entries):
                meta[r, i, 1 + 2 * e] = idx
                meta[r, i, 2 + 2 * e] = win
    return meta


def chunk_meta_jnp(mask, counts, *, block_kv: int, cap: int):
    """Traced builder — same semantics as chunk_meta_np.

    mask: (R, nQ, nsub) bool; counts: (R, nsub) int32.
    Runs are detected with a cumulative-max trick; chunk starts are run
    origins plus multiples of C; per-chunk valid counts are unrolled sums of
    up to C sub-block counts within the same run.
    """
    R, nQ, nsub = mask.shape
    C = block_kv // SUB
    counts = counts.astype(jnp.int32)
    full = counts >= SUB  # (R, nsub)
    v = mask & (counts > 0)[:, None, :]  # (R, nQ, nsub)

    prev_v = jnp.concatenate([jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)
    prev_full = jnp.concatenate(
        [jnp.zeros_like(full[..., :1]), full[..., :-1]], axis=-1
    )[:, None, :]
    run_start = v & (~prev_v | ~prev_full)

    j = jnp.arange(nsub, dtype=jnp.int32)
    rs_pos = jnp.where(run_start, j, -1)
    run_origin = jax.lax.associative_scan(jnp.maximum, rs_pos, axis=-1)
    chunk_start = v & ((j - run_origin) % C == 0)

    # valid tokens of the chunk starting at j: sum counts[j+k] while the k-th
    # sub-block is still in the same run. Runs break after partial sub-blocks,
    # so "same run" already implies all earlier sub-blocks of the chunk are
    # full — the valid window stays a contiguous prefix.
    valid = jnp.zeros(v.shape, jnp.int32)
    for k in range(C):
        if k == 0:
            c_k = counts[:, None, :]
            same = v
        else:
            c_k = jnp.concatenate(
                [counts[:, k:], jnp.zeros((R, k), jnp.int32)], axis=-1
            )[:, None, :]
            v_k = jnp.concatenate([v[..., k:], jnp.zeros_like(v[..., :k])], axis=-1)
            o_k = jnp.concatenate(
                [run_origin[..., k:], jnp.full_like(run_origin[..., :k], -2)], axis=-1
            )
            same = v_k & (o_k == run_origin)
        valid = valid + jnp.where(same, c_k, 0)

    idx_eff = jnp.minimum(j, nsub - C)
    lo = (j - idx_eff) * SUB
    win = pack_window(lo, lo + valid)

    # CSR compaction via a stable sort (scatters serialize on TPU; sorting
    # the boolean start flags moves chunk starts to the front in j order)
    n = jnp.minimum(jnp.sum(chunk_start, axis=-1, dtype=jnp.int32), cap)
    order = jnp.argsort(~chunk_start, axis=-1, stable=True).astype(jnp.int32)
    sel = order[..., :cap]  # (R, nQ, cap): j of the first `cap` chunk starts
    valid_sel = jnp.take_along_axis(chunk_start, sel, axis=-1)
    idxs = jnp.where(valid_sel, jnp.minimum(sel, nsub - C), 0)
    wins = jnp.where(valid_sel, jnp.take_along_axis(win, sel, axis=-1), 0)
    entries = jnp.stack([idxs, wins], axis=-1).reshape(R, nQ, 2 * cap)
    return jnp.concatenate([n[..., None], entries], axis=-1)


def tile_meta_jnp(sel, *, block_kv: int, n_tokens: int, nsub: int, cap: int):
    """Direct chunk metadata for uniform tiles (SAP tile mode, grain ==
    block_kv): tile t occupies tokens [t*block_kv, min((t+1)*block_kv,
    n_tokens)) of the permuted KV array, so each selected tile is exactly
    one chunk and the metadata is pure arithmetic — no run-origin scan, no
    per-sub-block valid accumulation, and the compaction sort runs at tile
    granularity (block_kv/SUB x smaller than chunk_meta_jnp's sub-block
    mask). Bit-identical to chunk_meta_jnp on the expanded mask for this
    layout (runs can only break at tile boundaries; the one partial tile is
    the last).

    sel: (R, NR, T) bool tile selection. Returns (R, NR, 1 + 2*cap) int32.
    """
    R, NR, T = sel.shape
    C = block_kv // SUB
    n = jnp.minimum(jnp.sum(sel, axis=-1, dtype=jnp.int32), cap)
    order = jnp.argsort(~sel, axis=-1, stable=True).astype(jnp.int32)
    tids = order[..., :cap]  # first `cap` selected tile ids, ascending
    valid = jnp.take_along_axis(sel, tids, axis=-1)
    start_sub = tids * C
    idx = jnp.minimum(start_sub, nsub - C)  # keep the DMA inside the array
    lo = (start_sub - idx) * SUB
    vt = jnp.clip(n_tokens - tids * block_kv, 0, block_kv)  # tile token count
    win = pack_window(lo, lo + vt)
    idxs = jnp.where(valid, idx, 0)
    wins = jnp.where(valid, win, 0)
    entries = jnp.stack([idxs, wins], axis=-1).reshape(R, NR, 2 * cap)
    return jnp.concatenate([n[..., None], entries], axis=-1)


import jax  # noqa: E402  (used by chunk_meta_jnp)


# ---------------------------------------------------------------------------
# Run-list metadata ("runs" mode)
#
# Motivation (round 2): SAP at the reference 720p config (kc=1000) cannot
# afford 128-aligned cluster padding — padding inflates KV 2.7x. In runs mode
# the KV tokens are permuted cluster-contiguously *unpadded*, and a row's
# visited set is a short list of maximal token runs [a, b): adjacent selected
# clusters merge into one run. The kernel splits runs into block_kv-token
# chunks with scalar math (ops/attention.py block_sparse_attention_runs), so
# the metadata is O(runs) = tens of words per row instead of O(chunks).
#
# Row format: meta[r, i, :] = [n_chunks, a_0, b_0, a_1, b_1, ...]
#   n_chunks = sum over listed runs of ceil((b - floor128(a)) / block_kv),
#   runs ascending, non-overlapping. The chunk walk is:
#     chunk k of run (a,b): DMA start idx = clamp(floor128(a)/128 + k*C,
#     nsub-C); valid window [max(a, base+k*bkv), min(b, base+(k+1)*bkv))
#     relative to idx*128, where base = floor128(a).
# ---------------------------------------------------------------------------


def run_meta_row_len(cap: int) -> int:
    return 1 + 2 * cap


def _run_chunks(a, b, block_kv):
    base = (a // SUB) * SUB
    return -(-(b - base) // block_kv)


def run_meta_jnp(sel, starts, sizes, *, block_kv: int, cap: int):
    """Traced run-list builder.

    Args:
      sel:    (R, NR, C) bool — per metadata row, which clusters are visited.
      starts: (R, C) int32 — exclusive cumsum of cluster sizes (token offset
              of each cluster in the cluster-contiguous permuted KV array).
      sizes:  (R, C) int32 — cluster sizes (empty clusters allowed).
      block_kv: kernel chunk size in tokens (for the n_chunks count).
      cap: max runs kept per row. Rows with more runs are silently truncated
           (callers must size cap; cap=C is always exact).

    Returns meta (R, NR, 1 + 2*cap) int32.
    """
    R, NR, C = sel.shape
    assert block_kv % SUB == 0, (block_kv, SUB)  # _run_chunks walks SUB-aligned bases
    starts = starts.astype(jnp.int32)
    ends = (starts + sizes).astype(jnp.int32)
    sel = sel & (sizes > 0)[:, None, :]

    prev = jnp.concatenate([jnp.zeros_like(sel[..., :1]), sel[..., :-1]], axis=-1)
    nxt = jnp.concatenate([sel[..., 1:], jnp.zeros_like(sel[..., :1])], axis=-1)
    run_start = sel & ~prev
    run_end = sel & ~nxt

    org = jnp.where(run_start, starts[:, None, :], -1)
    run_origin = jax.lax.associative_scan(jnp.maximum, org, axis=-1)

    # compact the run-end clusters to the front with ONE multi-payload sort
    # carrying (a, b) through it — no take_along_axis gathers, no bool-key
    # stable argsort (element gathers and bool sorts are slow on TPU; this
    # was measured 173 ms -> the sort form runs in ~ms at (40, 300, 1000)).
    cap_eff = min(cap, C)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, sel.shape, sel.ndim - 1)
    key = jnp.where(run_end, iota_c, C + iota_c)  # run-ends first, in order
    ends_b = jnp.broadcast_to(ends[:, None, :], sel.shape)
    key_s, a, b = jax.lax.sort((key, run_origin, ends_b), dimension=-1, num_keys=1)
    key_s = key_s[..., :cap_eff]
    is_run = key_s < C
    a = jnp.where(is_run, a[..., :cap_eff], 0)
    b = jnp.where(is_run, b[..., :cap_eff], 0)
    m = jnp.where(is_run, _run_chunks(a, b, block_kv), 0)
    n = jnp.sum(m, axis=-1, dtype=jnp.int32)

    entries = jnp.stack([a, b], axis=-1).reshape(R, NR, 2 * cap_eff)
    if cap_eff < cap:
        entries = jnp.pad(entries, ((0, 0), (0, 0), (0, 2 * (cap - cap_eff))))
    return jnp.concatenate([n[..., None], entries], axis=-1).astype(jnp.int32)


def run_meta_np(sel, starts, sizes, *, block_kv: int, cap: int | None = None):
    """Numpy oracle with identical semantics (tests / trace-time)."""
    sel = np.asarray(sel)
    starts = np.asarray(starts)
    sizes = np.asarray(sizes)
    R, NR, C = sel.shape
    rows = []
    max_runs = 0
    for r in range(R):
        for i in range(NR):
            runs = []
            c = 0
            while c < C:
                # zero-size clusters break runs (matching the jnp builder)
                if sel[r, i, c] and sizes[r, c] > 0:
                    a = int(starts[r, c])
                    b = int(starts[r, c] + sizes[r, c])
                    c += 1
                    while c < C and sel[r, i, c] and sizes[r, c] > 0:
                        b = int(starts[r, c] + sizes[r, c])
                        c += 1
                    runs.append((a, b))
                else:
                    c += 1
            rows.append(runs)
            max_runs = max(max_runs, len(runs))
    if cap is None:
        cap = max(max_runs, 1)
    meta = np.zeros((R, NR, run_meta_row_len(cap)), np.int32)
    it = iter(rows)
    for r in range(R):
        for i in range(NR):
            runs = next(it)[:cap]
            meta[r, i, 0] = sum(_run_chunks(a, b, block_kv) for a, b in runs)
            for e, (a, b) in enumerate(runs):
                meta[r, i, 1 + 2 * e] = a
                meta[r, i, 2 + 2 * e] = b
    return meta


def decode_run_meta(meta, *, seq_kv: int):
    """Decode run-list metadata -> per-row boolean token mask (tests only)."""
    meta = np.asarray(meta)
    R, NR, L = meta.shape
    cap = (L - 1) // 2
    out = np.zeros((R, NR, seq_kv), bool)
    for r in range(R):
        for i in range(NR):
            for e in range(cap):
                a = meta[r, i, 1 + 2 * e]
                b = meta[r, i, 2 + 2 * e]
                out[r, i, a:b] = True
    return out


def dense_meta(seq_q: int, seq_kv: int, *, block_q: int, block_kv: int) -> np.ndarray:
    """Metadata visiting every kv token (dense attention), R=1."""
    nQ = -(-seq_q // block_q)
    nsub = -(-seq_kv // SUB)
    counts = np.minimum(SUB, seq_kv - np.arange(nsub) * SUB).astype(np.int32)[None]
    return chunk_meta_np(np.ones((1, nQ, nsub), bool), counts, block_kv=block_kv)


def kv_counts_for_seq(seq_real: int, seq_pad: int | None = None) -> np.ndarray:
    """Per-sub-block valid counts for a real length inside a padded buffer."""
    nsub = -(-(seq_pad or seq_real) // SUB)
    return np.clip(seq_real - np.arange(nsub) * SUB, 0, SUB).astype(np.int32)[None]


def decode_meta(meta, *, block_kv: int, seq_kv: int):
    """Decode metadata -> per-row boolean token mask (tests only).

    Returns (R, nQ, seq_kv) bool.
    """
    meta = np.asarray(meta)
    R, nQ, _ = meta.shape
    out = np.zeros((R, nQ, seq_kv), bool)
    for r in range(R):
        for i in range(nQ):
            n = meta[r, i, 0] % N_CHEAP_SCALE
            for e in range(n):
                idx = meta[r, i, 1 + 2 * e]
                win = meta[r, i, 2 + 2 * e]
                lo, hi = win // ENTRY_SCALE, win % ENTRY_SCALE
                base = idx * SUB
                out[r, i, base + lo : base + hi] = True
    return out
