"""Universal Pallas block-sparse attention vs jnp oracles (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.core.attention_ref import dense_attention, masked_attention
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import (
    MaskSpec,
    block_sparse_attention,
    block_sparse_attention_reference,
)


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def rand_qkv(rng, BH, Sq, Skv, D, dtype=np.float32):
    q = rng.standard_normal((BH, Sq, D)).astype(dtype)
    k = rng.standard_normal((BH, Skv, D)).astype(dtype)
    v = rng.standard_normal((BH, Skv, D)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def rand_mask_counts(rng, R, nQ, nsub, density=0.6, partial_frac=0.3):
    mask = rng.random((R, nQ, nsub)) < density
    mask[..., 0] = True
    counts = np.where(
        rng.random((R, nsub)) < partial_frac,
        rng.integers(1, MD.SUB, (R, nsub)),
        MD.SUB,
    ).astype(np.int32)
    return mask, counts


@pytest.mark.parametrize("bq,bkv", [(128, 128), (128, 512), (256, 256)])
def test_dense_meta_matches_dense_attention(bq, bkv):
    rng = np.random.default_rng(0)
    BH, S, D = 2, 512, 64
    q, k, v = rand_qkv(rng, BH, S, S, D)
    meta = jnp.asarray(MD.dense_meta(S, S, block_q=bq, block_kv=bkv))
    out = block_sparse_attention(q, k, v, meta, block_q=bq, block_kv=bkv)
    ref = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("seed,R_shared,bkv", [(0, True, 256), (1, False, 512), (2, False, 256)])
def test_random_subblock_mask(seed, R_shared, bkv):
    rng = np.random.default_rng(seed)
    BH, Sq, Skv, D, bq = 3, 256, 1024, 32, 128
    q, k, v = rand_qkv(rng, BH, Sq, Skv, D)
    nQ, nsub = Sq // bq, Skv // MD.SUB
    R = 1 if R_shared else BH
    mask, counts = rand_mask_counts(rng, R, nQ, nsub)
    meta = jnp.asarray(MD.chunk_meta_np(mask, counts, block_kv=bkv))
    out = block_sparse_attention(q, k, v, meta, block_q=bq, block_kv=bkv)
    ref = block_sparse_attention_reference(q, k, v, meta, block_q=bq, block_kv=bkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    # decoded token mask must equal (mask expanded & counts prefix): no
    # overlaps, no drops
    dec = MD.decode_meta(meta, block_kv=bkv, seq_kv=Skv)
    tok = np.repeat(mask, MD.SUB, axis=2) & (
        (np.arange(Skv) % MD.SUB)[None, None, :] < np.repeat(counts, MD.SUB, axis=1)[:, None, :]
    )
    np.testing.assert_array_equal(dec, tok)


@pytest.mark.parametrize("bkv", [256, 512])
def test_chunk_meta_jnp_equals_np(bkv):
    rng = np.random.default_rng(3)
    R, nQ, nsub = 2, 5, 16
    mask, counts = rand_mask_counts(rng, R, nQ, nsub, density=0.5)
    cap = nsub
    a = MD.chunk_meta_np(mask, counts, block_kv=bkv, cap=cap)
    b = np.asarray(
        MD.chunk_meta_jnp(jnp.asarray(mask), jnp.asarray(counts), block_kv=bkv, cap=cap)
    )
    np.testing.assert_array_equal(a, b)


def test_band_sink_mask_spec():
    rng = np.random.default_rng(4)
    BH, S, D, bq, bkv = 2, 1024, 32, 128, 256
    q, k, v = rand_qkv(rng, BH, S, S, D)
    spec = MaskSpec(kind="band_sink", band_width=129, sink_size=100)
    nsub = S // MD.SUB
    qi = np.arange(S // bq)[:, None] * bq
    ki = np.arange(nsub)[None, :] * MD.SUB
    gap = np.maximum(np.maximum(ki - (qi + bq - 1), qi - (ki + MD.SUB - 1)), 0)
    bmask = (gap < 129) | (ki < 100)
    counts = np.full((1, nsub), MD.SUB, np.int32)
    meta = jnp.asarray(MD.chunk_meta_np(bmask[None], counts, block_kv=bkv))
    out = block_sparse_attention(q, k, v, meta, block_q=bq, block_kv=bkv, mask_spec=spec)

    tq = np.arange(S)[:, None]
    tk = np.arange(S)[None, :]
    tmask = (np.abs(tq - tk) < 129) | (tk < 100)
    ref = masked_attention(q, k, v, jnp.asarray(tmask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_empty_rows_produce_zeros():
    rng = np.random.default_rng(5)
    BH, S, D, bq, bkv = 1, 256, 32, 128, 128
    q, k, v = rand_qkv(rng, BH, S, S, D)
    bmask = np.zeros((1, 2, 2), bool)
    bmask[0, 0, 0] = True  # row 1 has no active blocks
    meta = jnp.asarray(
        MD.chunk_meta_np(bmask, np.full((1, 2), 128, np.int32), block_kv=bkv, cap=2)
    )
    out = np.asarray(block_sparse_attention(q, k, v, meta, block_q=bq, block_kv=bkv))
    assert np.all(out[:, bq:] == 0)
    assert np.all(np.isfinite(out))


def test_bfloat16():
    rng = np.random.default_rng(6)
    BH, S, D = 2, 1024, 64
    q, k, v = rand_qkv(rng, BH, S, S, D)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    meta = jnp.asarray(MD.dense_meta(S, S, block_q=256, block_kv=512))
    out = block_sparse_attention(qb, kb, vb, meta, block_q=256, block_kv=512)
    ref = dense_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.08, atol=0.03
    )


def test_partial_tail_and_array_end_shift():
    """Real kv length not a chunk multiple: tail window + shifted DMA start."""
    rng = np.random.default_rng(7)
    BH, S_real, D, bq, bkv = 1, 300, 32, 128, 512
    S_pad = 512
    q, k, v = rand_qkv(rng, BH, S_pad, S_pad, D)
    counts = MD.kv_counts_for_seq(S_real, S_pad)  # [128, 128, 44, 0]
    nsub = S_pad // MD.SUB
    bmask = np.ones((1, S_pad // bq, nsub), bool)
    meta = jnp.asarray(MD.chunk_meta_np(bmask, counts, block_kv=bkv))
    out = np.asarray(block_sparse_attention(q, k, v, meta, block_q=bq, block_kv=bkv))
    ref = np.asarray(dense_attention(q, k[:, :S_real], v[:, :S_real]))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_scattered_singleton_runs():
    """SAP-like fragmentation: isolated partial sub-blocks far apart."""
    rng = np.random.default_rng(8)
    BH, Skv, D, bq, bkv = 1, 2048, 32, 128, 512
    Sq = 128
    q, k, v = rand_qkv(rng, BH, Sq, Skv, D)
    nsub = Skv // MD.SUB
    mask = np.zeros((1, 1, nsub), bool)
    mask[0, 0, [0, 5, 9, 15]] = True  # includes the last sub-block (end shift)
    counts = np.full((1, nsub), MD.SUB, np.int32)
    counts[0, [5, 15]] = 37
    meta = jnp.asarray(MD.chunk_meta_np(mask, counts, block_kv=bkv))
    out = np.asarray(block_sparse_attention(q, k, v, meta, block_q=bq, block_kv=bkv))
    tok = np.zeros(Skv, bool)
    for sb in [0, 5, 9, 15]:
        tok[sb * 128 : sb * 128 + counts[0, sb]] = True
    ref = np.asarray(masked_attention(q, k, v, jnp.asarray(tok[None, None, :])))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_full_window_roundtrip_block_kv_1024():
    """Regression: ENTRY_SCALE must round-trip hi == block_kv == 1024.

    With ENTRY_SCALE=1024, pack_window(lo, 1024) aliased to (lo+1, 0) — an
    empty window — silently zeroing every FULL chunk's contribution at the
    production block_kv=1024 default (boundary/partial chunks survived, so
    small-block tests never caught it). Checked here against an oracle that
    does NOT share the packing (a dense predicate mask built from positions).
    """
    from sparse_videogen_tpu.config import SVGConfig, VideoLayout
    from sparse_videogen_tpu.ops.mask_spec import apply_mask_spec
    from sparse_videogen_tpu.ops.metadata import ENTRY_SCALE, pack_window
    from sparse_videogen_tpu.sparse import svg1 as S1

    assert ENTRY_SCALE > 1024
    win = pack_window(3, 1024)
    assert (win // ENTRY_SCALE, win % ENTRY_SCALE) == (3, 1024)

    B, H, S, D = 1, 1, 2048, 64
    layout = VideoLayout(num_frames=8, frame_size=256)
    plan = S1.make_svg1_plan(layout, SVGConfig(sparsity=0.3))
    assert plan.block_kv == 1024  # the config this regression is about
    spec = plan.mask_spec
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    out = np.asarray(S1._run_kernel(q, k, v, plan.sparse_meta(), plan, spec, True), np.float64)

    qpos = np.arange(S)[:, None]
    kpos = np.arange(S)[None, :]
    mask = np.asarray(apply_mask_spec(spec, jnp.asarray(qpos), jnp.asarray(kpos), jnp.zeros(4, jnp.int32)))
    qf, kf, vf = (np.asarray(a, np.float64).reshape(S, D) for a in (q, k, v))
    s = np.where(mask, qf @ kf.T / np.sqrt(D), -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = p @ vf
    np.testing.assert_allclose(out[0, 0], want, atol=2e-5, rtol=2e-4)

    # dense through the same kernel at block_kv=1024 vs plain softmax
    outd = np.asarray(S1.dense_attention_kernel(q, k, v, plan, interpret=True), np.float64)
    sd = qf @ kf.T / np.sqrt(D)
    pd = np.exp(sd - sd.max(-1, keepdims=True))
    pd /= pd.sum(-1, keepdims=True)
    np.testing.assert_allclose(outd[0, 0], pd @ vf, atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("qsplit", [2, 4])
def test_qsplit_matches_qsplit1(qsplit):
    """Ping-pong q sub-tiles: bit-comparable output to the single-tile path
    (independent per-row softmax chains; no merge)."""
    from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
    from sparse_videogen_tpu.ops.metadata import chunk_meta_np, kv_counts_for_seq

    BH, S, D, bq, bkv = 2, 1024, 64, 256, 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32)
    kv = pack_kv(
        jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32),
        jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32),
    )
    bm = rng.random((BH, S // bq, S // 128)) < 0.6
    bm[:, :, 0] = True
    meta = jnp.asarray(chunk_meta_np(bm, np.broadcast_to(kv_counts_for_seq(S), (BH, S // 128)), block_kv=bkv))
    base = block_sparse_attention_kv(q, kv, meta, block_q=bq, block_kv=bkv)
    got = block_sparse_attention_kv(q, kv, meta, block_q=bq, block_kv=bkv, qsplit=qsplit)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5, rtol=1e-4)
    # with a mask predicate too (band + sink across sub-tile boundaries)
    from sparse_videogen_tpu.ops.mask_spec import MaskSpec

    spec = MaskSpec(kind="band_sink", band_width=300, sink_size=128)
    base = block_sparse_attention_kv(q, kv, meta, block_q=bq, block_kv=bkv, mask_spec=spec)
    got = block_sparse_attention_kv(q, kv, meta, block_q=bq, block_kv=bkv, mask_spec=spec, qsplit=qsplit)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5, rtol=1e-4)


def test_exp2_domain_matches_exp():
    """exp2-domain softmax (log2e folded into the q scale, VPU-native exp2)
    vs natural-exp: outputs match to rounding, and return_stats m comes back
    in NATURAL-log units either way (the ring-combine domain contract)."""
    from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
    from sparse_videogen_tpu.ops.mask_spec import MaskSpec
    from sparse_videogen_tpu.ops.metadata import chunk_meta_np, kv_counts_for_seq

    BH, S, D, bq, bkv = 2, 1024, 64, 256, 256
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32)
    kv = pack_kv(
        jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32),
        jnp.asarray(rng.standard_normal((BH, S, D)), jnp.float32),
    )
    bm = rng.random((BH, S // bq, S // 128)) < 0.6
    bm[:, :, 0] = True
    meta = jnp.asarray(
        chunk_meta_np(bm, np.broadcast_to(kv_counts_for_seq(S), (BH, S // 128)), block_kv=bkv)
    )
    spec = MaskSpec(kind="band_sink", band_width=300, sink_size=128)
    for kw in (dict(), dict(mask_spec=spec), dict(unroll=2)):
        o_exp, m_exp, l_exp = block_sparse_attention_kv(
            q, kv, meta, block_q=bq, block_kv=bkv, return_stats=True,
            use_exp2=False, **kw)
        o_e2, m_e2, l_e2 = block_sparse_attention_kv(
            q, kv, meta, block_q=bq, block_kv=bkv, return_stats=True,
            use_exp2=True, **kw)
        np.testing.assert_allclose(np.asarray(o_e2), np.asarray(o_exp), atol=1e-5, rtol=1e-4)
        # m must be natural-log domain in BOTH cases (ring combine mixes them)
        np.testing.assert_allclose(np.asarray(m_e2), np.asarray(m_exp), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(l_e2), np.asarray(l_exp), atol=1e-4, rtol=1e-4)
