"""Randomized SAP full-density exactness fuzz.

Property: with top_p_kmeans=1.0 and min_kc_ratio=1.0 every cluster pair is
selected, so the whole SAP machinery (k-means, dynamic map, popularity
relabel, padded q permutation, unpadded KV sort, run metadata, runs kernel,
inverse permutation) must reproduce exact dense attention — for ANY
clustering, any shape, any block size. Text-last layouts follow the
reference's prompt post-processing semantics (hyvideo/attention.py:657-702 +
flash-varlen real_len truncation): real tokens (video + prompt) attend among
themselves, padding attends only to itself — so the oracle there is dense
over the real prefix + dense over the padding tail.

This fuzz found a real gap: block_kv < 128 (the metadata SUB) silently
produced wrong windows (the run->chunk walk is SUB-aligned); it is now an
assert in run_meta_jnp / block_sparse_attention_runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.config import SAPConfig, VideoLayout
from sparse_videogen_tpu.core.attention_ref import dense_attention
from sparse_videogen_tpu.sparse.svg2 import init_sap_state, sap_sparse_attention


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
CASES = [
    # (nf, fs, ctx, prompt_len, qc, kc, block_q, block_mode)
    (3, 48, 0, 0, 23, 38, 32, "cluster"),     # many clusters, most empty
    (5, 37, 0, 0, 2, 33, 32, "cluster"),      # qc=2 degenerate
    (4, 90, 0, 0, 14, 9, 128, "cluster"),     # kc < qc
    (3, 48, 17, 8, 5, 21, 32, "cluster"),     # tiny text tail
    (5, 90, 256, 111, 10, 27, 128, "cluster"),  # hyvideo-like text-last
    (3, 90, 29, 2, 24, 2, 64, "cluster"),     # kc=2 + nearly-empty prompt
    # tile mode: fixed-grain quantization of the k-means order; qc/kc only
    # steer the clustering, the map granularity is block_q/block_kv tiles
    (4, 90, 0, 0, 14, 9, 128, "tile"),
    (5, 90, 256, 111, 10, 27, 128, "tile"),   # text-last + partial tail tiles
    (3, 48, 17, 8, 5, 21, 32, "tile"),        # S far from tile multiples
]


@pytest.mark.parametrize("nf,fs,ctx,pl,qc,kc,bq,bmode", CASES)
def test_sap_full_density_equals_dense(nf, fs, ctx, pl, qc, kc, bq, bmode):
    H, D = 2, 64
    S = nf * fs + ctx
    if ctx:
        layout = VideoLayout(num_frames=nf, frame_size=fs, context_length=ctx,
                             text_position="last", prompt_length=pl)
    else:
        layout = VideoLayout(num_frames=nf, frame_size=fs)
    cfg = SAPConfig(num_q_centroids=qc, num_k_centroids=kc, top_p_kmeans=1.0,
                    min_kc_ratio=1.0, kmeans_iter_init=3, kmeans_iter_step=2,
                    block_q=bq, block_kv=128, block_mode=bmode)
    key = jax.random.PRNGKey(hash((nf, fs, ctx, qc, kc)) % (2**31))
    kq, kk, kv_, ks = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (1, H, S, D), jnp.float32)
    v = jax.random.normal(kv_, (1, H, S, D), jnp.float32)

    state = init_sap_state(H, D, cfg)
    out, state1 = sap_sparse_attention(q, k, v, state, ks, layout=layout, cfg=cfg)
    out_warm, _ = sap_sparse_attention(q, k, v, state1, ks, layout=layout, cfg=cfg)

    real = nf * fs + pl
    ref_real = dense_attention(q[:, :, :real], k[:, :, :real], v[:, :, :real])
    scale_ref = float(jnp.max(jnp.abs(ref_real)))
    for o in (out, out_warm):
        err = float(jnp.max(jnp.abs(o[:, :, :real] - ref_real))) / scale_ref
        assert err < 3e-5, err
        if real < S:  # padding tail attends only to itself
            ref_pad = dense_attention(q[:, :, real:], k[:, :, real:], v[:, :, real:])
            errp = float(jnp.max(jnp.abs(o[:, :, real:] - ref_pad)))
            errp /= float(jnp.max(jnp.abs(ref_pad))) + 1e-9
            assert errp < 3e-5, errp


def test_sub_aligned_block_kv_guard():
    """block_kv must be a multiple of the metadata SUB (128): smaller values
    silently mis-walk chunk windows (this fuzz's original failure mode)."""
    from sparse_videogen_tpu.ops import metadata as MD

    sel = jnp.ones((1, 1, 2), bool)
    starts = jnp.asarray([[0, 5]], jnp.int32)
    sizes = jnp.asarray([[5, 5]], jnp.int32)
    with pytest.raises(AssertionError):
        MD.run_meta_jnp(sel, starts, sizes, block_kv=64, cap=2)


def test_pc1_relabel_output_invariant():
    """pc1 (centroid-PC1 seriation) relabeling is a pure layout permutation:
    the SAP output must match popularity relabeling exactly on a REAL top-p
    map (clustered data, top_p < 1 so a strict subset is selected)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.config import SAPConfig, VideoLayout, WarmupSchedule
    from sparse_videogen_tpu.core.attention_ref import dense_attention
    from sparse_videogen_tpu.sparse import svg2

    rng = np.random.default_rng(11)
    B, H, D = 1, 2, 64
    layout = VideoLayout(num_frames=4, frame_size=128)
    S = layout.seq_len
    centers = rng.standard_normal((6, D)) * 2
    qk = centers[rng.integers(0, 6, S)] + 0.3 * rng.standard_normal((S, D))
    q = jnp.asarray(np.broadcast_to(qk, (B, H, S, D)).copy(), jnp.float32)
    k = jnp.asarray(q)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    warm = WarmupSchedule(first_layers=0, first_times=1001.0)

    outs, densities = {}, {}
    for rel in ("popularity", "pc1"):
        cfg = SAPConfig(num_q_centroids=5, num_k_centroids=8, top_p_kmeans=0.8,
                        min_kc_ratio=0.1, kmeans_iter_init=5, kmeans_iter_step=1,
                        relabel=rel)
        st = svg2.init_sap_state(B * H, D, cfg, dtype=jnp.float32)
        out, st2 = svg2.sap_attention(
            q, k, v, jnp.asarray(500.0), st, jax.random.PRNGKey(0),
            layout=layout, cfg=cfg, warmup=warm, layer_idx=0,
            dense_fn=lambda a, b, c: dense_attention(a, b, c))
        outs[rel] = np.asarray(out)
        densities[rel] = float(np.mean(np.asarray(st2.last_density)))
    assert 0.05 < densities["pc1"] < 0.95  # a real subset was selected
    assert densities["popularity"] == densities["pc1"]
    np.testing.assert_allclose(outs["popularity"], outs["pc1"], atol=1e-5)
