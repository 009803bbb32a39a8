"""Run-list metadata + runs-mode kernel: oracle exactness.

Covers the SVG2/SAP production path introduced in round 2 (unpadded KV):
  - run_meta_jnp == run_meta_np on random cluster layouts (incl. empty
    clusters and clusters crossing 128-token sub-block boundaries)
  - block_sparse_attention_runs == dense masked attention on the decoded mask
  - array-end DMA clamping (runs ending at unaligned sequence tails)
  - cap truncation drops whole runs (documented semantics)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sparse_videogen_tpu.core.attention_ref import masked_attention
from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_runs, pack_kv


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def _random_clusters(rng, BH, C, S):
    w = rng.random(C)
    w[rng.integers(0, C)] = 0.0  # force an empty cluster
    sizes = np.floor(w / max(w.sum(), 1e-9) * S).astype(np.int32)
    sizes[np.argmax(sizes)] += S - sizes.sum()
    sizes = np.tile(sizes, (BH, 1))
    starts = np.concatenate(
        [np.zeros((BH, 1), np.int32), np.cumsum(sizes, axis=1)[:, :-1]], axis=1
    )
    return sizes, starts


@pytest.mark.parametrize("seed,bkv", [(0, 256), (1, 512), (2, 512), (3, 256)])
def test_runs_kernel_oracle(seed, bkv):
    rng = np.random.default_rng(seed)
    BH = int(rng.integers(1, 4))
    C = int(rng.integers(3, 20))
    S = int(rng.integers(200, 1500))
    bq, Sq, D = 128, 256, 64

    sizes, starts = _random_clusters(rng, BH, C, S)
    NR = Sq // bq
    sel = rng.random((BH, NR, C)) < 0.45
    Skv = -(-max(S, bkv) // 128) * 128

    meta_np = MD.run_meta_np(sel, starts, sizes, block_kv=bkv, cap=C)
    meta_j = np.asarray(
        MD.run_meta_jnp(jnp.asarray(sel), jnp.asarray(starts), jnp.asarray(sizes), block_kv=bkv, cap=C)
    )
    assert np.array_equal(meta_np, meta_j)

    mask = np.repeat(MD.decode_run_meta(meta_np, seq_kv=Skv), bq, axis=1)
    q = rng.standard_normal((BH, Sq, D)).astype(np.float32)
    k = rng.standard_normal((BH, Skv, D)).astype(np.float32)
    v = rng.standard_normal((BH, Skv, D)).astype(np.float32)

    out = np.asarray(
        block_sparse_attention_runs(
            jnp.asarray(q), pack_kv(jnp.asarray(k), jnp.asarray(v)), jnp.asarray(meta_j),
            block_q=bq, block_kv=bkv,
        )
    )
    ref = np.asarray(masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
    any_row = mask.any(-1)[..., None]
    np.testing.assert_allclose(
        np.where(any_row, out, 0), np.where(any_row, ref, 0), atol=2e-5
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(expand=False),
        dict(expand=True, use_exp2=False),
        dict(expand=True, use_exp2=True),
        dict(expand=True, unroll=2),
        dict(expand=True, unroll=2, nbuf=2),
        dict(expand=True, qsplit=2),
        dict(expand=True, pair=2),
        dict(expand=True, pair=2, nbuf=2),
        dict(expand=True, pair=3),
        dict(expand=True, pair=2, use_exp2=False),
    ],
)
def test_runs_kernel_variants_agree(kw):
    """expand (scalar-prologue chunk table), exp2 softmax domain, unroll and
    qsplit streams all compute the same attention (vs the in-loop walk)."""
    rng = np.random.default_rng(7)
    BH, C, S = 2, 9, 1100
    bq, Sq, D, bkv = 128, 384, 64, 256
    sizes, starts = _random_clusters(rng, BH, C, S)
    sel = rng.random((BH, Sq // bq, C)) < 0.45
    sel[:, 1, :] = False  # an empty row
    Skv = -(-max(S, bkv) // 128) * 128
    meta = MD.run_meta_jnp(
        jnp.asarray(sel), jnp.asarray(starts), jnp.asarray(sizes), block_kv=bkv, cap=C
    )
    q = jnp.asarray(rng.standard_normal((BH, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, Skv, D)), jnp.float32)
    kv = pack_kv(k, v)
    base = block_sparse_attention_runs(
        q, kv, meta, block_q=bq, block_kv=bkv, expand=False, use_exp2=False
    )
    out = block_sparse_attention_runs(q, kv, meta, block_q=bq, block_kv=bkv, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=3e-6)
    # softmax stats stay in natural-log units in every variant (ring combine)
    _, m0, l0 = block_sparse_attention_runs(
        q, kv, meta, block_q=bq, block_kv=bkv, expand=False, use_exp2=False,
        return_stats=True,
    )
    if kw.get("unroll", 1) == 1:  # stats supported on all, but merge reorders
        _, m1, l1 = block_sparse_attention_runs(
            q, kv, meta, block_q=bq, block_kv=bkv, return_stats=True, **kw
        )
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-4)


def test_adjacent_selected_clusters_merge():
    sizes = np.array([[100, 50, 70, 30]], np.int32)
    starts = np.array([[0, 100, 150, 220]], np.int32)
    sel = np.array([[[True, True, False, True]]])
    meta = MD.run_meta_np(sel, starts, sizes, block_kv=512, cap=4)
    # runs: [0,150) merged, [220,250)
    assert meta[0, 0, 1:5].tolist() == [0, 150, 220, 250]
    assert meta[0, 0, 0] == 1 + 1  # one chunk each ((150-0)/512 -> 1; 30 tok -> 1)


def test_empty_cluster_breaks_run():
    sizes = np.array([[100, 0, 70]], np.int32)
    starts = np.array([[0, 100, 100]], np.int32)
    sel = np.array([[[True, True, True]]])
    meta = MD.run_meta_np(sel, starts, sizes, block_kv=512, cap=4)
    assert meta[0, 0, 1:5].tolist() == [0, 100, 100, 170]
    meta_j = np.asarray(
        MD.run_meta_jnp(jnp.asarray(sel), jnp.asarray(starts), jnp.asarray(sizes), block_kv=512, cap=4)
    )
    assert np.array_equal(meta, meta_j)


def test_cap_truncation_drops_whole_runs():
    sizes = np.full((1, 6), 10, np.int32)
    starts = (np.arange(6, dtype=np.int32) * 10)[None]
    sel = np.array([[[True, False, True, False, True, False]]])  # 3 runs
    meta = MD.run_meta_np(sel, starts, sizes, block_kv=512, cap=2)
    assert meta[0, 0, 0] == 2  # only the first two runs' chunks counted
    assert meta[0, 0, 1:5].tolist() == [0, 10, 20, 30]


def test_tile_meta_matches_chunk_meta_expansion():
    """tile_meta_jnp (uniform tiles, grain == block_kv) must decode to the
    same token mask as chunk_meta_np on the sub-block-expanded mask, for
    random selections incl. the partial last tile and a tail that forces
    the DMA clamp."""
    rng = np.random.default_rng(9)
    for S, bkv in [(1000, 256), (640, 128), (900, 512)]:
        T = -(-S // bkv)
        nsub = -(-S // MD.SUB)
        sk_pad = nsub * MD.SUB
        R, NR = 2, 3
        sel = rng.random((R, NR, T)) < 0.5
        meta_t = np.asarray(MD.tile_meta_jnp(
            jnp.asarray(sel), block_kv=bkv, n_tokens=S, nsub=nsub,
            cap=min(T, nsub)))
        # oracle: expand tiles to sub-blocks, run the numpy chunk builder
        spt = bkv // MD.SUB
        mask = np.repeat(sel, spt, axis=-1)[..., :nsub]
        counts = np.broadcast_to(MD.kv_counts_for_seq(S, sk_pad), (R, nsub))
        meta_c = MD.chunk_meta_np(mask, counts, block_kv=bkv)
        got = MD.decode_meta(meta_t, block_kv=bkv, seq_kv=sk_pad)
        want = MD.decode_meta(meta_c, block_kv=bkv, seq_kv=sk_pad)
        np.testing.assert_array_equal(got, want)
        # chunk counts agree too
        np.testing.assert_array_equal(meta_t[..., 0], meta_c[..., 0] % MD.N_CHEAP_SCALE)
