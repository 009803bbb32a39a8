"""CogVideoX causal-3D VAE vs a torch re-implementation of the published
architecture (diffusers AutoencoderKLCogVideoX semantics) sharing weights.

Validates: replicate-first-frame temporal padding with zero spatial padding,
temporal pairwise avg-pool downsampling (frame 0 unpaired), stride-2 conv2d
with right/bottom padding, nearest upsampling with the odd-T first-frame
special case, and the decoder's latent-conditioned spatial norms."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sparse_videogen_tpu.models.cog import vae as CV

import pytest

# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
CFG = CV.CogVAEConfig(
    block_out_channels=(8, 16, 16, 16), layers_per_block=1, latent_channels=4,
    norm_num_groups=4,
)


def t(a):
    return torch.tensor(np.asarray(a, np.float32))


def t_w3(p):
    return t(p["w"]).permute(4, 3, 0, 1, 2)  # (co, ci, kt, kh, kw)


def causal_conv(p, x):
    w, b = t_w3(p), t(p["b"])
    kt, kh, kw = w.shape[2:]
    if kt > 1:
        x = torch.cat([x[:, :, :1].expand(-1, -1, kt - 1, -1, -1), x], dim=2)
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2))
    return F.conv3d(x, w, b)


def conv1x1(p, x):
    w = t(p["w"])
    w = w[0, 0, 0] if w.ndim == 5 else w
    return torch.einsum("bcthw,cd->bdthw", x, w) + t(p["b"])[None, :, None, None, None]


def conv2d_frames(p, x, stride=1, pad=(1, 1, 1, 1)):
    w = t(p["w"]).permute(3, 2, 0, 1)
    B, C, T, H, W = x.shape
    y = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    y = F.conv2d(F.pad(y, pad), w, t(p["b"]), stride=stride)
    return y.reshape(B, T, *y.shape[1:]).permute(0, 2, 1, 3, 4)


def gnorm(p, x, groups):
    return F.group_norm(x, groups, t(p["g"]), t(p["b"]), eps=1e-6)


def snorm(p, f, zq, groups):
    T = f.shape[2]
    if T > 1 and T % 2 == 1:
        z_first = F.interpolate(zq[:, :, :1], size=(1, *f.shape[-2:]))
        z_rest = F.interpolate(zq[:, :, 1:], size=(T - 1, *f.shape[-2:]))
        zq = torch.cat([z_first, z_rest], dim=2)
    else:
        zq = F.interpolate(zq, size=f.shape[-3:])
    return gnorm(p["norm"], f, groups) * conv1x1(p["conv_y"], zq) + conv1x1(p["conv_b"], zq)


def resnet(p, x, zq, groups):
    def norm(q, y):
        return gnorm(q, y, groups) if zq is None else snorm(q, y, zq, groups)

    h = causal_conv(p["conv1"], F.silu(norm(p["norm1"], x)))
    h = causal_conv(p["conv2"], F.silu(norm(p["norm2"], h)))
    if "shortcut" in p:
        x = conv1x1(p["shortcut"], x)
    return x + h


def torch_encode(params, cfg, x):
    p, g = params["encoder"], cfg.norm_num_groups
    x = causal_conv(p["conv_in"], x)
    for i in range(cfg.num_blocks):
        blk = p["down"][i]
        for r in blk["res"]:
            x = resnet(r, x, None, g)
        if "ds" in blk:
            if cfg.compress_time(i):
                T = x.shape[2]
                if T % 2 == 1:
                    first, rest = x[:, :, :1], x[:, :, 1:]
                    B, C = rest.shape[:2]
                    rest = F.avg_pool1d(rest.permute(0, 3, 4, 1, 2).reshape(-1, C, T - 1), 2, 2)
                    rest = rest.reshape(B, x.shape[3], x.shape[4], C, -1).permute(0, 3, 4, 1, 2)
                    x = torch.cat([first, rest], dim=2)
                else:
                    B, C, T, H, W = x.shape
                    x = F.avg_pool1d(x.permute(0, 3, 4, 1, 2).reshape(-1, C, T), 2, 2)
                    x = x.reshape(B, H, W, C, -1).permute(0, 3, 4, 1, 2)
            x = conv2d_frames(blk["ds"]["conv"], x, stride=2, pad=(0, 1, 0, 1))
    for r in p["mid"]["res"]:
        x = resnet(r, x, None, g)
    x = gnorm(p["norm_out"], x, g)
    return causal_conv(p["conv_out"], F.silu(x))


def torch_decode(params, cfg, z):
    p, g = params["decoder"], cfg.norm_num_groups
    x = causal_conv(p["conv_in"], z)
    for r in p["mid"]["res"]:
        x = resnet(r, x, z, g)
    for i in range(cfg.num_blocks):
        blk = p["up"][i]
        for r in blk["res"]:
            x = resnet(r, x, z, g)
        if "us" in blk:
            if cfg.compress_time(i):
                T = x.shape[2]
                if T > 1 and T % 2 == 1:
                    first, rest = x[:, :, 0], x[:, :, 1:]
                    first = F.interpolate(first, scale_factor=2.0)[:, :, None]
                    rest = F.interpolate(rest, scale_factor=2.0)
                    x = torch.cat([first, rest], dim=2)
                elif T > 1:
                    x = F.interpolate(x, scale_factor=2.0)
                else:
                    x = F.interpolate(x[:, :, 0], scale_factor=2.0)[:, :, None]
            else:
                B, C, T, H, W = x.shape
                x = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
                x = F.interpolate(x, scale_factor=2.0)
                x = x.reshape(B, T, C, 2 * H, 2 * W).permute(0, 2, 1, 3, 4)
            x = conv2d_frames(blk["us"]["conv"], x, stride=1, pad=(1, 1, 1, 1))
    x = snorm(p["norm_out"], x, z, g)
    return causal_conv(p["conv_out"], F.silu(x))


def _params():
    return jax.tree.map(
        lambda a: np.asarray(a), CV.init_cog_vae_params(jax.random.PRNGKey(0), CFG)
    )


def test_encode_parity():
    params = _params()
    x = np.random.RandomState(1).randn(1, 3, 5, 16, 16).astype(np.float32)
    got = np.asarray(CV.encoder_forward(jax.tree.map(jnp.asarray, params)["encoder"], CFG, jnp.asarray(x)))
    want = torch_encode(params, CFG, t(x)).numpy()
    assert got.shape == (1, 8, 2, 2, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_decode_parity():
    params = _params()
    z = np.random.RandomState(2).randn(1, 4, 3, 2, 2).astype(np.float32)
    got = np.asarray(CV.decoder_forward(jax.tree.map(jnp.asarray, params)["decoder"], CFG, jnp.asarray(z)))
    want = torch_decode(params, CFG, t(z)).numpy()
    assert got.shape == (1, 3, 9, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_roundtrip_shapes_and_scaling():
    params = jax.tree.map(jnp.asarray, _params())
    x = jnp.asarray(np.random.RandomState(3).randn(1, 3, 9, 16, 16), jnp.float32)
    raw = CV.vae_encode(params, CFG, x)
    assert raw.shape == (1, 4, 3, 2, 2)
    lat = CV.scale_latents(CFG, raw)  # invert mode: divide
    np.testing.assert_allclose(np.asarray(lat), np.asarray(raw) / 0.7, rtol=1e-6)
    out = CV.vae_decode(params, CFG, lat)
    assert out.shape == (1, 3, 9, 16, 16)


def test_single_image_roundtrip():
    """T=1 exercises every first-frame special case (I2V image latents)."""
    params = jax.tree.map(jnp.asarray, _params())
    x = jnp.asarray(np.random.RandomState(4).randn(1, 3, 1, 16, 16), jnp.float32)
    raw = CV.vae_encode(params, CFG, x)
    assert raw.shape == (1, 4, 1, 2, 2)
    out = CV.vae_decode(params, CFG, CV.scale_latents(CFG, raw))
    assert out.shape == (1, 3, 1, 16, 16)
    want = torch_decode(_params(), CFG, t(np.asarray(raw))).numpy()
    np.testing.assert_allclose(
        np.asarray(CV.decoder_forward(params["decoder"], CFG, raw)), want,
        atol=2e-4, rtol=2e-3,
    )
