"""Block-aligned cluster permutation invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.core import permute as P


def make_labels(rng, B, N, C):
    labels = rng.integers(0, C, (B, N)).astype(np.int32)
    sizes = np.stack([np.bincount(labels[b], minlength=C) for b in range(B)]).astype(np.int32)
    return labels, sizes


@pytest.mark.parametrize("seed,block", [(0, 4), (1, 8), (2, 16)])
def test_padded_permutation_roundtrip(seed, block):
    rng = np.random.default_rng(seed)
    B, N, C = 2, 100, 7
    labels, sizes = make_labels(rng, B, N, C)
    s_pad = P.padded_seq_len(N, C, block)
    maps = P.padded_permutation(
        jnp.asarray(labels), jnp.asarray(sizes), n_clusters=C, block=block, s_pad=s_pad
    )
    src = np.asarray(maps["src"])
    valid = np.asarray(maps["valid"])
    pos = np.asarray(maps["pos"])
    kv_counts = np.asarray(maps["kv_counts"])
    blk_c = np.asarray(maps["block_to_cluster"])

    for b in range(B):
        # each token appears exactly once among valid slots
        tokens = src[b][valid[b]]
        assert sorted(tokens) == list(range(N))
        # pos is the inverse of src on valid slots
        np.testing.assert_array_equal(src[b][pos[b]], np.arange(N))
        assert valid[b][pos[b]].all()
        # valid slot count per block matches kv_counts
        vc = valid[b].reshape(-1, block).sum(-1)
        np.testing.assert_array_equal(vc, kv_counts[b])
        assert kv_counts[b].sum() == N
        # slots are cluster-contiguous and sorted by cluster
        slot_labels = labels[b][src[b]]
        slot_labels = np.where(valid[b], slot_labels, -1)
        seen = slot_labels[slot_labels >= 0]
        assert (np.diff(seen) >= 0).all()
        # every valid slot's label matches its block's cluster
        blk_of_slot = np.repeat(blk_c[b], block)
        np.testing.assert_array_equal(
            slot_labels[valid[b]], blk_of_slot[valid[b]]
        )


def test_gather_ungather_roundtrip():
    rng = np.random.default_rng(3)
    B, N, C, D, block = 1, 37, 4, 5, 8
    labels, sizes = make_labels(rng, B, N, C)
    s_pad = P.padded_seq_len(N, C, block)
    maps = P.padded_permutation(
        jnp.asarray(labels), jnp.asarray(sizes), n_clusters=C, block=block, s_pad=s_pad
    )
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    xp = P.gather_padded(x, maps["src"])
    back = P.ungather_padded(xp, maps["pos"])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
