"""Mask semantics vs direct numpy re-derivations of the reference logic."""

import math

import numpy as np
import pytest

from sparse_videogen_tpu.config import TextPosition, VideoLayout
from sparse_videogen_tpu.core import masks as M


def ref_banded_sink_mask(seq, frame_size, num_frame, multiplier, sink, block=128):
    """Direct port of the profiling-mask loops (wan/utils.py:78-89), video only."""
    m = np.zeros((seq, seq), dtype=bool)
    if sink:
        m[:, :frame_size] = True
    thres = int(multiplier * frame_size)
    nb = math.ceil(num_frame * frame_size / block)
    for i in range(nb):
        for j in range(nb):
            if abs(i - j) < thres // block:
                m[i * block : (i + 1) * block, j * block : (j + 1) * block] = True
    return m


def ref_temporal_view(mask, frame_size, num_frame):
    """wan/utils.py:102-106 reshape/permute."""
    L = frame_size * num_frame
    return (
        mask[:L, :L]
        .reshape(frame_size, num_frame, frame_size, num_frame)
        .transpose(1, 0, 3, 2)
        .reshape(L, L)
    )


@pytest.mark.parametrize("num_frame,frame_size", [(4, 64), (3, 128), (5, 48)])
def test_profile_masks_match_reference(num_frame, frame_size):
    layout = VideoLayout(num_frames=num_frame, frame_size=frame_size)
    seq = layout.seq_len
    qi = np.arange(seq)[:, None]
    ki = np.arange(seq)[None, :]

    spatial_ref = ref_banded_sink_mask(seq, frame_size, num_frame, 2.0, sink=True)
    spatial = np.asarray(
        M.profile_mask_predicate(layout, "spatial", 2.0, first_frame_sink=True)(qi, ki)
    )
    np.testing.assert_array_equal(spatial, spatial_ref)

    temporal_ref = ref_temporal_view(spatial_ref, frame_size, num_frame)
    temporal = np.asarray(
        M.profile_mask_predicate(layout, "temporal", 2.0, first_frame_sink=True)(qi, ki)
    )
    np.testing.assert_array_equal(temporal, temporal_ref)


def test_profile_mask_text_last():
    layout = VideoLayout(
        num_frames=2, frame_size=64, context_length=32, text_position=TextPosition.LAST
    )
    seq = layout.seq_len
    qi = np.arange(seq)[:, None]
    ki = np.arange(seq)[None, :]
    m = np.asarray(
        M.profile_mask_predicate(layout, "spatial", 1.5, first_frame_sink=False)(qi, ki)
    )
    assert m[-32:, :].all() and m[:, -32:].all()  # text rows/cols fully attended
    vid = layout.video_length
    ref = ref_banded_sink_mask(vid, 64, 2, 1.5, sink=False)
    np.testing.assert_array_equal(m[:vid, :vid], ref[:vid, :vid])


def test_temporal_index_map_roundtrip():
    layout = VideoLayout(num_frames=3, frame_size=5)
    g = M.temporal_index_map(layout)
    inv = M.inverse_permutation(g)
    np.testing.assert_array_equal(g[inv], np.arange(layout.seq_len))
    # matches the reference reorder: reshape(nf, fs).T.reshape  (placement.py:12-17)
    x = np.arange(layout.video_length)
    ref = x.reshape(3, 5).T.reshape(-1)
    np.testing.assert_array_equal(x[g], ref)


def test_temporal_index_map_text_first():
    layout = VideoLayout(
        num_frames=2, frame_size=4, context_length=3, text_position=TextPosition.FIRST
    )
    g = M.temporal_index_map(layout)
    np.testing.assert_array_equal(g[:3], [0, 1, 2])  # text fixed
    x = np.arange(8)
    np.testing.assert_array_equal((x + 3)[g[3:] - 3], x.reshape(2, 4).T.reshape(-1) + 3)


def test_temporal_transpose_matches_gather():
    """temporal_transpose (reshape+swapaxes) is bit-equal to the index-map
    gather, forward and inverse, for every text position."""
    from sparse_videogen_tpu.core import placement as P

    layouts = [
        VideoLayout(num_frames=3, frame_size=5),
        VideoLayout(num_frames=3, frame_size=5, context_length=4,
                    text_position=TextPosition.LAST),
        VideoLayout(num_frames=2, frame_size=4, context_length=3,
                    text_position=TextPosition.FIRST),
    ]
    rng = np.random.default_rng(0)
    for lay in layouts:
        g, ginv = P.placement_indices(lay)
        x = rng.standard_normal((2, 3, lay.seq_len, 8), dtype=np.float32)
        fwd = np.asarray(P.temporal_transpose(x, lay))
        np.testing.assert_array_equal(fwd, x[:, :, g, :])
        inv = np.asarray(P.temporal_transpose(x, lay, inverse=True))
        np.testing.assert_array_equal(inv, x[:, :, ginv, :])
        # round trip
        np.testing.assert_array_equal(
            np.asarray(P.temporal_transpose(P.temporal_transpose(x, lay), lay,
                                            inverse=True)), x)


def test_sparsity_to_width():
    # wan/utils.py:51-60 formula, ctx=0 -> width = seq*(1-sqrt(1-s))/fs
    w = M.sparsity_to_width(0.25, 0, 10, 100)
    seq = 1000
    assert abs(w - seq * (1 - math.sqrt(0.75)) / 100) < 1e-9


def test_execution_mask_block_contains_band_and_sink():
    layout = VideoLayout(num_frames=6, frame_size=256)
    mul = 2.0
    blk = M.execution_mask_block(layout, mul, block_q=128, block_kv=128)
    seq = layout.seq_len
    two_frame = math.ceil(mul * 256 / 128) * 128
    # block mask must be exactly "any token pair in block satisfies predicate"
    for i in range(0, seq, 128):
        for j in range(0, seq, 128):
            qs = np.arange(i, min(i + 128, seq))
            ks = np.arange(j, min(j + 128, seq))
            any_true = (
                np.abs(qs[:, None] - ks[None, :]) <= two_frame
            ).any() or (ks < 256).any()
            assert blk[i // 128, j // 128] == any_true


def test_full_block_allowed_is_conservative():
    """full_block_allowed claims 'every pair attends' — verify the claim
    implies truth (never the reverse) for all mask kinds over random
    rectangles. (Unused by the kernel after the lax.cond fast path was
    measured a loss; kept for block-level schedulers.)"""
    import jax.numpy as jnp
    import numpy as np

    from sparse_videogen_tpu.ops.mask_spec import (
        MaskSpec,
        apply_mask_spec,
        full_block_allowed,
    )

    rng = np.random.default_rng(0)
    aux = jnp.asarray([700, 0, 64, 128], jnp.int32)  # offsets exercised
    specs = [
        MaskSpec(kind="band_sink", band_width=300, sink_size=128),
        MaskSpec(kind="band_sink_perm", band_width=200, sink_size=96,
                 frame_size=96, num_frames=8),
        MaskSpec(kind="cog", band_width=250),
        MaskSpec(kind="hyvideo", band_width=220, video_len=512),
    ]
    checked = 0
    for spec in specs:
        sizes = [0, 31, 127]  # few distinct shapes (eager ops compile per shape)
        for _ in range(120):
            q0 = int(rng.integers(0, 700))
            k0 = int(rng.integers(0, 700))
            q1 = q0 + int(rng.choice(sizes))
            k1 = k0 + int(rng.choice(sizes))
            full = bool(full_block_allowed(spec, q0, q1, k0, k1, aux))
            if not full:
                continue
            qpos = jnp.arange(q0, q1 + 1)[:, None]
            kpos = jnp.arange(k0, k1 + 1)[None, :]
            assert bool(apply_mask_spec(spec, qpos, kpos, aux).all()), (spec, q0, q1, k0, k1)
            checked += 1
    assert checked > 50  # the claim fired often enough to mean something
