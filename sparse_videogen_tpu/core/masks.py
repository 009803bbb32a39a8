"""SVG1 mask math: sparsity calibration, profiling masks, execution masks.

Reference semantics reimplemented from:
  - sparsity_to_width:            /root/reference/svg/models/wan/utils.py:51-60
  - profiling masks (emulated):   /root/reference/svg/models/wan/utils.py:63-110,
                                  /root/reference/svg/models/hyvideo/utils.py:47-94,
                                  /root/reference/svg/models/cog/utils.py:61-89
  - execution mask (flex mask):   /root/reference/svg/models/wan/utils.py:25-41,
                                  /root/reference/svg/models/hyvideo/utils.py:20-44

Design difference vs the reference: the reference materializes O(L^2) boolean
masks on the CPU (capped at sample_mse_max_row rows). Here every mask is an
elementwise predicate over (row index, col index) so profiling can evaluate
just the sampled rows on-device, and block-level masks are computed at block
granularity directly (numpy, trace time — they depend only on static shapes).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import TextPosition, VideoLayout


def sparsity_to_width(sparsity: float, context_length: int, num_frame: int, frame_size: int) -> float:
    """Convert a target sparsity into a sliding-window width in frames."""
    seq_len = context_length + num_frame * frame_size
    total = seq_len**2
    adj = (sparsity * total - 2 * seq_len * context_length) / total
    width = seq_len * (1 - math.sqrt(1 - adj))
    return width / frame_size


def temporal_index_map(layout: VideoLayout):
    """Token-major gather indices for the per-head "temporal" layout.

    Returns int32 array `g` of shape (seq_len,) such that
    `x_temporal = x[..., g, :]` re-lays-out video tokens from frame-major
    (token i = f*frame_size + p) to token-major (position p*num_frame + f),
    leaving text tokens fixed. Matches the Triton placement kernels
    (/root/reference/svg/models/wan/placement.py:34-122: store offset
    patch_id*num_frame + frame_id; text tokens at the layout's text position
    copy through).

    The map is built as a numpy constant (static shapes only).
    """
    nf, fs = layout.num_frames, layout.frame_size
    ctx, vid = layout.context_length, layout.video_length
    g = np.arange(layout.seq_len, dtype=np.int32)
    if layout.text_position == TextPosition.FIRST:
        vstart = ctx
    else:  # NONE or LAST: video tokens first
        vstart = 0
    # destination position (vstart + p*nf + f) holds source token (vstart + f*fs + p)
    o = np.arange(vid, dtype=np.int32)
    f = o % nf
    p = o // nf
    g[vstart : vstart + vid] = vstart + f * fs + p
    return g


def inverse_permutation(g: np.ndarray) -> np.ndarray:
    inv = np.empty_like(g)
    inv[g] = np.arange(len(g), dtype=g.dtype)
    return inv


# ---------------------------------------------------------------------------
# Profiling (emulated) masks — elementwise predicates
# ---------------------------------------------------------------------------


def _banded_block_predicate(qi, ki, frame_size: int, multiplier: float, block: int = 128):
    """Block tri-diagonal band: |q_block - k_block| < (multiplier*frame_size)//block.

    qi/ki are *video-relative* token indices (arrays). Matches the profiling
    mask loops (wan/utils.py:84-88)."""
    thres = int(multiplier * frame_size) // block
    return jnp.abs(qi // block - ki // block) < thres


def profile_mask_predicate(layout: VideoLayout, mask_name: str, multiplier: float, *, first_frame_sink: bool, block: int = 128):
    """Return fn(q_idx, k_idx) -> bool for the emulated profiling masks.

    q_idx, k_idx are broadcastable int arrays of absolute sequence positions.

    - "spatial": banded mask in frame-major coordinates (+ optional
      first-frame sink over video columns).
    - "temporal": the same banded(+sink) mask viewed through the token-major
      permutation, i.e. mask[t(i), t(j)] where t maps frame-major position to
      token-major position. (The reference builds the banded mask then
      reshape/permutes it; wan/utils.py:102-106. Both are equivalent; see
      tests/test_masks.py.)
    - Text rows/columns (hyvideo LAST, cog FIRST) are fully attended.
    """
    nf, fs, ctx = layout.num_frames, layout.frame_size, layout.context_length
    vid = layout.video_length
    tpos = layout.text_position

    if tpos == TextPosition.FIRST:
        vstart = ctx
    else:
        vstart = 0
    vend = vstart + vid

    def pred(q_idx, k_idx):
        q_idx = jnp.asarray(q_idx)
        k_idx = jnp.asarray(k_idx)
        qv = q_idx - vstart  # video-relative
        kv = k_idx - vstart
        if mask_name == "temporal":
            # token-major view: video-relative index f*fs+p -> p*nf+f
            qf, qp = qv // fs, qv % fs
            kf, kp = kv // fs, kv % fs
            qv = qp * nf + qf
            kv = kp * nf + kf
        m = _banded_block_predicate(qv, kv, fs, multiplier, block)
        if first_frame_sink:
            m = m | (kv < fs)
        if ctx > 0:
            q_is_text = (q_idx < vstart) | (q_idx >= vend)
            k_is_text = (k_idx < vstart) | (k_idx >= vend)
            m = m | q_is_text | k_is_text
        return m

    return pred


# ---------------------------------------------------------------------------
# Execution mask — block-level, static, built with numpy at trace time
# ---------------------------------------------------------------------------


def execution_mask_block(
    layout: VideoLayout,
    multiplier: float,
    *,
    block_q: int = 128,
    block_kv: int = 128,
    first_frame_sink: bool = True,
    round_mode: str = "ceil",  # wan rounds up (wan/utils.py:29), hyvideo down (hyvideo/utils.py:24)
) -> np.ndarray:
    """Block-level boolean mask for the shared SVG1 execution mask.

    The reference evaluates the token-level mask_mod
        |q - kv| <= round128(mul * frame_size)  OR  kv < frame_size
    through flex-attention's create_block_mask, which keeps any 128x128 block
    containing at least one true element. We compute the same block mask
    directly: a block (i, j) is active iff the predicate holds for the
    *closest* token pair in the block (band) or the first column (sink).

    Text handling: the skeleton is the *static superset* of blocks any
    prompt length can touch — the in-kernel predicate (with the dynamic
    real_len in aux) masks exactly within them:
      LAST (hyvideo): text columns [video_len, seq) are visited by every row
        and text/fake q-rows visit every column (text rows attend all video,
        fake rows self-attend within the text block region).
      FIRST (cog): symmetric with columns/rows [0, context_length).
    """
    seq = layout.seq_len
    fs = layout.frame_size
    vid = layout.video_length
    ctx = layout.context_length
    n_q = -(-seq // block_q)
    n_k = -(-seq // block_kv)
    if round_mode == "ceil":
        two_frame = math.ceil(multiplier * fs / 128) * 128
        # wan mask_mod uses <= (wan/utils.py:34)
        le = True
    else:
        two_frame = math.floor(multiplier * fs / 128) * 128
        le = False

    qi = np.arange(n_q) * block_q
    ki = np.arange(n_k) * block_kv
    # min |q - kv| over the block: distance between intervals
    q_lo, q_hi = qi[:, None], (qi + block_q - 1)[:, None]
    k_lo, k_hi = ki[None, :], (ki + block_kv - 1)[None, :]
    gap = np.maximum(np.maximum(k_lo - q_hi, q_lo - k_hi), 0)
    band = gap <= two_frame if le else gap < two_frame
    mask = band
    if first_frame_sink:
        mask = mask | (k_lo < fs)
    if ctx > 0:
        if layout.text_position == TextPosition.LAST:
            mask = mask | (k_hi >= vid) | (q_hi >= vid)
        elif layout.text_position == TextPosition.FIRST:
            mask = mask | (k_lo < ctx) | (q_lo < ctx)
    return mask


def dense_mask_block(seq_q: int, seq_kv: int, *, block_q: int = 128, block_kv: int = 128) -> np.ndarray:
    return np.ones((-(-seq_q // block_q), -(-seq_kv // block_kv)), dtype=bool)


def execution_mask_block_perm(
    layout: VideoLayout,
    multiplier: float,
    *,
    block_q: int = 128,
    block_kv: int = 128,
    round_mode: str = "ceil",
) -> np.ndarray:
    """Block skeleton of the TEMPORAL band+sink mask in ORIGINAL token order
    (placement-free SVG1): the band |p(q) - p(k)| <= W with permuted
    positions p(x) = (x % fs) * F + x // fs, sink p(k) < fs.

    Exact block-level any() computed per q block (the p-sets are not
    intervals, so no closed form; one-time numpy cost, cached by the plan).
    Video-only layouts (wan/cosmos)."""
    seq = layout.video_length
    fs = layout.frame_size
    F = layout.num_frames
    if round_mode == "ceil":
        w = math.ceil(multiplier * fs / 128) * 128
        le = True
    else:
        w = math.floor(multiplier * fs / 128) * 128
        le = False
    x = np.arange(seq)
    p = (x % fs) * F + x // fs
    sink = p < fs  # (seq,) kv tokens always attended
    n_q = -(-seq // block_q)
    n_k = -(-seq // block_kv)
    out = np.zeros((n_q, n_k), bool)
    for b in range(n_q):
        pq = p[b * block_q : (b + 1) * block_q][:, None]
        d = np.abs(pq - p[None, :])
        allowed = ((d <= w) if le else (d < w)).any(axis=0) | sink
        pad = n_k * block_kv - seq
        if pad:
            allowed = np.concatenate([allowed, np.zeros(pad, bool)])
        out[b] = allowed.reshape(n_k, block_kv).any(axis=1)
    return out
