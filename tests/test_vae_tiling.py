"""Tiled VAE decode (reference: diffusers enable_tiling —
hyvideo_t2v_inference.py:81). Tiles see zero padding instead of their true
neighborhood at borders, per-tile group-norm statistics, and per-tile mid
attention — all exactly as diffusers' tiled_decode — so tiled != whole
bitwise. With RANDOM weights the mid attention mixes the whole frame and the
divergence is maximal (real decoders are local/smooth); these tests assert
the mechanism (grid, blending, exact single-tile early return) plus a sanity
band on the random-weight divergence."""

import jax
import jax.numpy as jnp
import numpy as np


def _snr_db(ref, x):
    ref, x = np.asarray(ref), np.asarray(x)
    mse = float(np.mean((ref - x) ** 2))
    return 10 * np.log10(ref.var() / mse) if mse else np.inf


def test_wan_tiled_decode_matches_whole():
    from sparse_videogen_tpu.models.wan import vae as WV

    cfg = WV.WanVAEConfig(dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)
    params = WV.init_wan_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim, 3, 20, 28)) * 0.5
    whole = WV.vae_decode(params, cfg, z)
    tiled = WV.vae_decode_tiled(params, cfg, z, tile=12, overlap=4)
    assert tiled.shape == whole.shape
    assert _snr_db(whole, tiled) > 12.0  # random-weight worst case

    # single tile covering everything == whole decode (jit-vs-eager noise only)
    one = WV.vae_decode_tiled(params, cfg, z, tile=64, overlap=8)
    np.testing.assert_allclose(np.asarray(one), np.asarray(whole),
                               atol=3e-5, rtol=1e-4)


def test_hyvideo_tiled_decode_matches_whole():
    from sparse_videogen_tpu.models.hyvideo import vae as HVV

    cfg = HVV.HyVideoVAEConfig(block_out_channels=(16, 16, 16, 16),
                               layers_per_block=1, norm_num_groups=4,
                               latent_channels=4)
    params = HVV.init_hyvideo_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 16, 24)) * 0.5
    whole = HVV.vae_decode(params, cfg, z)
    tiled = HVV.vae_decode_tiled(params, cfg, z, tile=10, overlap=4)
    assert tiled.shape == whole.shape
    # random weights make the per-frame mid attention global: worst case
    assert _snr_db(whole, tiled) > 6.0


def test_tiling_grid_and_weights():
    from sparse_videogen_tpu.models.common.vae_tiling import (_ramp_weight,
                                                              _starts,
                                                              spatial_tiled_decode)

    assert _starts(10, 12, 8) == [0]
    assert _starts(20, 12, 8) == [0, 8]
    assert _starts(21, 12, 8) == [0, 8, 9]
    w = _ramp_weight(16, 4, True, False)
    assert w[0] < w[3] < 1.0 and w[-1] == 1.0

    # identity "decoder" at scale 1: tiled blend must reconstruct the input
    # exactly for ANY grid (ramps normalize out)
    z = jnp.arange(1 * 1 * 1 * 9 * 13, dtype=jnp.float32).reshape(1, 1, 1, 9, 13)
    out = spatial_tiled_decode(lambda t: t, z, tile=5, overlap=2, scale=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z), rtol=1e-6)


def test_temporal_context_decode_bookkeeping_exact():
    """Frame bookkeeping oracle: with a zero-receptive-field causal-head toy
    decoder, temporal_context_decode must be EXACT for any (tile, context).
    (On real decoders accuracy depends on context vs receptive field — for
    the Wan VAE use vae_decode_streamed, which is exact by construction.)"""
    from sparse_videogen_tpu.models.common.vae_tiling import temporal_context_decode

    def toy(z):
        head, rest = z[:, :, :1], z[:, :, 1:]
        return jnp.concatenate([head, jnp.repeat(rest, 4, axis=2)], axis=2)

    z = jnp.arange(2 * 3 * 9 * 2 * 2, dtype=jnp.float32).reshape(2, 3, 9, 2, 2)
    whole = toy(z)
    for tile_t, ctx in [(3, 1), (3, 4), (2, 2), (4, 3), (9, 1)]:
        t = temporal_context_decode(toy, z, tile_t=tile_t, context_t=ctx, rate=4)
        np.testing.assert_array_equal(np.asarray(t), np.asarray(whole))
