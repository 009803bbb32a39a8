"""Cheap-first metadata classification (ops/metadata.classify_cheap_np).

Invariants:
  1. decode_meta(classified) == decode_meta(original) — reordering never
     changes the visited-chunk set or windows.
  2. Every entry in the cheap prefix is genuinely fully-allowed under the
     spec (token-level recheck against apply_mask_spec), so the kernel's
     bias-only loop is exact on it.
  3. Kernel output with classified metadata == kernel output with original
     metadata (bit-equal in interpret mode) for every mask kind.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.ops import metadata as MD
from sparse_videogen_tpu.ops.attention import block_sparse_attention_kv, pack_kv
from sparse_videogen_tpu.ops.mask_spec import MaskSpec, apply_mask_spec

BQ, BKV = 128, 256


def _specs():
    return [
        ("band_sink", MaskSpec(kind="band_sink", band_width=257, sink_size=128),
         np.zeros(4, np.int32)),
        ("hyvideo", MaskSpec(kind="hyvideo", band_width=256, video_len=1024),
         np.asarray([1024 + 70, 0, 0, 0], np.int32)),
        ("cog", MaskSpec(kind="cog", band_width=256),
         np.asarray([226, 0, 0, 0], np.int32)),
    ]


def _random_meta(rng, S, density=0.6):
    nsub = S // MD.SUB
    nQ = S // BQ
    mask = rng.random((1, nQ, nsub)) < density
    counts = MD.kv_counts_for_seq(S - 37, S)
    return MD.chunk_meta_np(mask, counts, block_kv=BKV)


@pytest.mark.parametrize("name,spec,aux", _specs())
def test_classified_equivalence(name, spec, aux):
    rng = np.random.default_rng(0)
    S = 1280
    meta = _random_meta(rng, S)
    cl = MD.classify_cheap_np(meta, spec, aux, block_q=BQ, block_kv=BKV, seq_q=S - 37)

    # 1. same visited set
    np.testing.assert_array_equal(
        MD.decode_meta(meta, block_kv=BKV, seq_kv=S),
        MD.decode_meta(cl, block_kv=BKV, seq_kv=S),
    )

    # 2. cheap prefix entries are truly fully allowed (rows < seq_q)
    n_cheap = cl[..., 0] // MD.N_CHEAP_SCALE
    n_tot = cl[..., 0] % MD.N_CHEAP_SCALE
    assert np.all(n_cheap <= n_tot)
    assert n_cheap.sum() > 0, "classification found no cheap chunks"
    R, nQ = n_cheap.shape
    for r in range(R):
        for i in range(nQ):
            for e in range(int(n_cheap[r, i])):
                idx = cl[r, i, 1 + 2 * e]
                win = cl[r, i, 2 + 2 * e]
                lo, hi = win // MD.ENTRY_SCALE, win % MD.ENTRY_SCALE
                qr = np.arange(i * BQ, min((i + 1) * BQ, S - 37))
                if len(qr) == 0:
                    continue
                kr = np.arange(idx * MD.SUB + lo, idx * MD.SUB + hi)
                ok = apply_mask_spec(spec, jnp.asarray(qr)[:, None],
                                     jnp.asarray(kr)[None, :], jnp.asarray(aux))
                assert bool(jnp.all(ok)), (name, r, i, e)

    # 3. kernel equivalence
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (2, S, 64), jnp.float32)
    kv = pack_kv(jax.random.normal(kk, (2, S, 64), jnp.float32),
                 jax.random.normal(kv_, (2, S, 64), jnp.float32))
    args = dict(block_q=BQ, block_kv=BKV, mask_spec=spec, interpret=True)
    auxj = jnp.asarray(aux)
    o0 = block_sparse_attention_kv(q, kv, jnp.asarray(meta), auxj, **args)
    o1 = block_sparse_attention_kv(q, kv, jnp.asarray(cl), auxj, **args)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=0, atol=2e-6)


def test_runtime_consts_classify():
    """SVG1Runtime consts carry classified metadata and match the oracle."""
    from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.sparse.runtimes import SVG1Runtime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan

    layout = VideoLayout(num_frames=4, frame_size=256)
    plan = make_svg1_plan(layout, SVGConfig(sparsity=0.3, num_sampled_rows=8),
                          WarmupSchedule(), block_q=128, block_kv=256)
    consts = SVG1Runtime(plan).consts()
    n_cheap = np.asarray(consts["sparse_meta"])[..., 0] // MD.N_CHEAP_SCALE
    assert n_cheap.sum() > 0  # band interior exists at this size
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, layout.seq_len, 64), jnp.float32)
    out, _ = SVG1Runtime(plan)(q, q, q, jnp.float32(500.0), jax.random.PRNGKey(1),
                               jnp.int32(1), jnp.zeros((1, 0), jnp.int32),
                               jax.tree.map(lambda s: s, consts))
    assert bool(jnp.all(jnp.isfinite(out)))
