"""HunyuanVideo causal-3D VAE vs a torch re-implementation of the reference
(hyvideo_orig/vae/unet_causal_3d_blocks.py + vae.py) sharing the same weights.

Validates: replicate causal padding, GroupNorm/silu resnets, strided causal
downsample, first-frame-spatial-only nearest upsample, and the mid-block
single-head attention with the frame-causal mask."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sparse_videogen_tpu.models.hyvideo import vae as HV

import pytest

# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
CFG = HV.HyVideoVAEConfig(
    block_out_channels=(8, 16, 16, 16), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, scaling_factor=0.476986,
)


def t_w(p):
    return torch.tensor(np.asarray(p["w"], np.float32)).permute(4, 3, 0, 1, 2)


def t_b(p):
    return torch.tensor(np.asarray(p["b"], np.float32))


def causal_conv(p, x, stride=(1, 1, 1)):
    w, b = t_w(p), t_b(p)
    kt, kh, kw = w.shape[2:]
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, kt - 1, 0), mode="replicate")
    return F.conv3d(x, w, b, stride=stride)


def gnorm(p, x, groups):
    g = torch.tensor(np.asarray(p["g"], np.float32))
    b = torch.tensor(np.asarray(p["b"], np.float32))
    return F.group_norm(x, groups, g, b, eps=1e-6)


def resnet(p, x, groups):
    h = causal_conv(p["conv1"], F.silu(gnorm(p["norm1"], x, groups)))
    h = causal_conv(p["conv2"], F.silu(gnorm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = causal_conv(p["shortcut"], x)
    return x + h


def mid(p, x, groups):
    x = resnet(p["res0"], x, groups)
    B, C, T, H, W = x.shape
    resid = x
    h = gnorm(p["attn"]["norm"], x, groups)
    hs = h.reshape(B, C, T * H * W).permute(0, 2, 1)
    lin = lambda q, y: y @ torch.tensor(np.asarray(q["w"], np.float32)) + torch.tensor(np.asarray(q["b"], np.float32))
    q, k, v = lin(p["attn"]["q"], hs), lin(p["attn"]["k"], hs), lin(p["attn"]["v"], hs)
    s = q @ k.transpose(1, 2) * C ** -0.5
    fq = torch.arange(T * H * W) // (H * W)
    s = s.masked_fill(~(fq[:, None] >= fq[None, :]), float("-inf"))
    o = torch.softmax(s, dim=-1) @ v
    o = lin(p["attn"]["o"], o).permute(0, 2, 1).reshape(B, C, T, H, W)
    x = resid + o
    return resnet(p["res1"], x, groups)


def upsample(x, factor):
    ft, fh, fw = factor
    B, C, T, H, W = x.shape
    if ft == 1 or T == 1:
        return F.interpolate(x.reshape(B, C * T, H, W), scale_factor=(fh, fw), mode="nearest").reshape(B, C, T, H * fh, W * fw)
    first, rest = x[:, :, :1], x[:, :, 1:]
    rest = F.interpolate(rest, scale_factor=(ft, fh, fw), mode="nearest")
    first = F.interpolate(first.squeeze(2), scale_factor=(fh, fw), mode="nearest").unsqueeze(2)
    return torch.cat([first, rest], dim=2)


def torch_encoder(p, cfg, x):
    g = cfg.norm_num_groups
    x = causal_conv(p["conv_in"], x)
    for i in range(cfg.num_blocks):
        blk = p["down"][i]
        for r in blk["res"]:
            x = resnet(r, x, g)
        if "ds" in blk:
            st = (2 if cfg.temporal_ds(i) else 1, 2 if cfg.spatial_ds(i) else 1, 2 if cfg.spatial_ds(i) else 1)
            x = causal_conv(blk["ds"], x, stride=st)
    x = mid(p["mid"], x, g)
    x = F.silu(gnorm(p["norm_out"], x, g))
    return causal_conv(p["conv_out"], x)


def torch_decoder(p, cfg, z):
    g = cfg.norm_num_groups
    x = causal_conv(p["conv_in"], z)
    x = mid(p["mid"], x, g)
    for i in range(cfg.num_blocks):
        blk = p["up"][i]
        for r in blk["res"]:
            x = resnet(r, x, g)
        if "us" in blk:
            f = (2 if cfg.temporal_ds(i) else 1, 2 if cfg.spatial_ds(i) else 1, 2 if cfg.spatial_ds(i) else 1)
            x = upsample(x, f)
            x = causal_conv(blk["us"], x)
    x = F.silu(gnorm(p["norm_out"], x, g))
    return causal_conv(p["conv_out"], x)


def test_decode_parity():
    params = HV.init_hyvideo_vae_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, CFG.latent_channels, 3, 4, 6)).astype(np.float32)

    out = np.asarray(HV.vae_decode(params, CFG, jnp.asarray(z)))

    zt = torch.tensor(z) / CFG.scaling_factor
    w1 = np.asarray(params["post_quant_conv"]["w"])[0, 0, 0]
    zt = torch.einsum("bcthw,cd->bdthw", zt, torch.tensor(w1)) + t_b(params["post_quant_conv"]).view(1, -1, 1, 1, 1)
    ref = torch_decoder(params["decoder"], CFG, zt).numpy()

    assert out.shape == ref.shape == (1, 3, 9, 32, 48)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_encode_decode_roundtrip_shapes():
    params = HV.init_hyvideo_vae_params(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 32, 48)), jnp.float32)
    lat = HV.vae_encode(params, CFG, video)
    assert lat.shape == (1, CFG.latent_channels, 3, 4, 6)

    ref = torch_encoder(params["encoder"], CFG, torch.tensor(np.asarray(video)))
    w1 = np.asarray(params["quant_conv"]["w"])[0, 0, 0]
    mom = torch.einsum("bcthw,cd->bdthw", ref, torch.tensor(w1)) + t_b(params["quant_conv"]).view(1, -1, 1, 1, 1)
    mean = mom[:, : CFG.latent_channels].numpy() * CFG.scaling_factor
    np.testing.assert_allclose(np.asarray(lat), mean, rtol=2e-4, atol=2e-4)
