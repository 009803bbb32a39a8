"""Cosmos continuous video tokenizer (models/cosmos/vae.py).

Structure-level validation (no diffusers / no checkpoints in this
environment — the same boundary as the CogVideoX VAE): exact wavelet
round-trip, 8x8x8 shape contracts, strict temporal causality in both
directions (the tokenizer's defining property: frame t depends only on
frames <= t), tiled decode, and a converter round-trip from a synthetic
Cosmos-Tokenizer-named torch state dict."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.models.cosmos import vae as CV

import pytest

# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
TINY = CV.CosmosVAEConfig(base_channels=16, channels_mult=(1, 2, 2),
                          num_res_blocks=1, latent_channels=4)


def test_haar_roundtrip_exact():
    for t, h, w in [(9, 16, 24), (17, 8, 8), (1, 4, 4)]:
        x = jax.random.normal(jax.random.PRNGKey(t), (1, 3, t, h, w), jnp.float32)
        p = CV.haar_patch3d(x, 2)
        assert p.shape == (1, 3 * 64, (t - 1) // 4 + 1, h // 4, w // 4)
        r = CV.haar_unpatch3d(p, 2, t)
        np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=1e-5)


def test_shapes_8x8x8():
    params = CV.init_cosmos_vae_params(jax.random.PRNGKey(0), TINY)
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 17, 32, 32), jnp.float32)
    z = CV.vae_encode(params, TINY, v)
    assert z.shape == (1, 4, 3, 4, 4)  # (T-1)/8+1, H/8, W/8
    y = CV.vae_decode(params, TINY, z)
    assert y.shape == v.shape
    yt = CV.vae_decode_tiled(params, TINY, z, tile=3, overlap=1)
    assert yt.shape == v.shape


def test_temporal_causality():
    params = CV.init_cosmos_vae_params(jax.random.PRNGKey(0), TINY)
    # decoder: latent frame 2 covers pixel frames 9..16 only
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 4, 4), jnp.float32)
    y0 = CV.vae_decode(params, TINY, z)
    y1 = CV.vae_decode(params, TINY, z.at[:, :, -1].add(10.0))
    d = np.abs(np.asarray(y1 - y0)).max(axis=(0, 1, 3, 4))
    assert d[:9].max() == 0.0 and d[9:].max() > 0
    # encoder: last video frame only reaches the last latent frame
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 17, 32, 32), jnp.float32)
    e0 = CV.vae_encode(params, TINY, v)
    e1 = CV.vae_encode(params, TINY, v.at[:, :, -1].add(10.0))
    dz = np.abs(np.asarray(e1 - e0)).max(axis=(0, 1, 3, 4))
    assert dz[:2].max() == 0.0 and dz[2] > 0


def _fake_sd(cfg):
    """Synthetic state dict in Cosmos-Tokenizer naming (CausalConv3d wraps
    its conv as `.conv3d`; attention projections are 1x1x1 convs)."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(key, ci, co, k=3):
        sd[f"{key}.conv3d.weight"] = rng.randn(co, ci, k, k, k).astype(np.float32) / math.sqrt(k**3 * ci)
        sd[f"{key}.conv3d.bias"] = np.zeros(co, np.float32)

    def norm(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def res(key, ci, co):
        norm(f"{key}.norm1", ci); conv(f"{key}.conv1", ci, co)
        norm(f"{key}.norm2", co); conv(f"{key}.conv2", co, co)
        if ci != co:
            sd[f"{key}.nin_shortcut.conv3d.weight"] = \
                rng.randn(co, ci, 1, 1, 1).astype(np.float32) / math.sqrt(ci)
            sd[f"{key}.nin_shortcut.conv3d.bias"] = np.zeros(co, np.float32)

    def attn(key, c):
        norm(f"{key}.norm", c)
        for q in ("q", "k", "v", "proj_out"):
            sd[f"{key}.{q}.weight"] = rng.randn(c, c, 1, 1, 1).astype(np.float32) / math.sqrt(c)
            sd[f"{key}.{q}.bias"] = np.zeros(c, np.float32)

    chans = [cfg.base_channels] + [cfg.base_channels * m for m in cfg.channels_mult]
    cz = chans[-1]
    conv("encoder.conv_in", cfg.patch_channels, cfg.base_channels)
    ci = cfg.base_channels
    for i, co in enumerate(chans[1:]):
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", ci, co)
            ci = co
        if cfg.downsample(i):
            conv(f"encoder.down.{i}.downsample", co, co)
    res("encoder.mid.block_1", cz, cz); attn("encoder.mid.attn_1", cz)
    attn("encoder.mid.attn_2", cz); res("encoder.mid.block_2", cz, cz)
    norm("encoder.norm_out", cz); conv("encoder.conv_out", cz, cfg.latent_channels)

    conv("decoder.conv_in", cfg.latent_channels, cz)
    res("decoder.mid.block_1", cz, cz); attn("decoder.mid.attn_1", cz)
    attn("decoder.mid.attn_2", cz); res("decoder.mid.block_2", cz, cz)
    ci = cz
    for i in reversed(range(len(cfg.channels_mult))):
        co = chans[i + 1]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", ci, co)
            ci = co
        if cfg.downsample(i):
            conv(f"decoder.up.{i}.upsample", co, co)
    norm("decoder.norm_out", chans[1]); conv("decoder.conv_out", chans[1], cfg.patch_channels)
    return sd


def test_converter_roundtrip():
    from sparse_videogen_tpu.io.checkpoint import convert_cosmos_vae

    sd = _fake_sd(TINY)
    params = convert_cosmos_vae(sd, TINY)
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 16, 16), jnp.float32)
    z = CV.vae_encode(params, TINY, v)
    assert z.shape == (1, 4, 2, 2, 2)
    y = CV.vae_decode(params, TINY, z)
    assert y.shape == v.shape and bool(jnp.all(jnp.isfinite(y)))


def test_converter_rejects_missing_temporal_attention():
    """fail-loudly contract: a checkpoint without attn_2/temporal_attn_1 must
    raise, never silently reuse attn_1's weights for the temporal branch."""
    import pytest

    from sparse_videogen_tpu.io.checkpoint import convert_cosmos_vae

    sd = _fake_sd(TINY)
    for k in [k for k in sd if ".attn_2." in k]:
        del sd[k]
    with pytest.raises(KeyError, match="temporal attention"):
        convert_cosmos_vae(sd, TINY)
