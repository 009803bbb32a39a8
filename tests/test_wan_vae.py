"""Wan causal-3D VAE: non-streaming JAX implementation vs a torch
re-implementation of the reference's *streaming* feat_cache algorithm
(wan_orig/modules/vae.py) sharing the same weights.

This specifically validates the chunked->full-sequence equivalences derived
in models/wan/vae.py (causal pads, downsample3d first-frame passthrough,
upsample3d 'Rep' zero-context)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sparse_videogen_tpu.models.wan import vae as V


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = V.WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                     temporal_downsample=(False, True))
CACHE_T = 2


def t_w(p):  # (kt,kh,kw,ci,co) -> torch conv3d (co,ci,kt,kh,kw)
    return torch.tensor(np.asarray(p["w"], np.float32)).permute(4, 3, 0, 1, 2)


def t_w2(p):  # (kh,kw,ci,co) -> torch conv2d (co,ci,kh,kw)
    return torch.tensor(np.asarray(p["w"], np.float32)).permute(3, 2, 0, 1)


def t_b(p):
    return torch.tensor(np.asarray(p["b"], np.float32))


def causal_conv(p, x, cache=None, stride=1):
    """Streaming CausalConv3d (vae.py:17-43). x: (B,C,T,H,W)."""
    w, b = t_w(p), t_b(p)
    kt, kh, kw = w.shape[2:]
    tpad = 2 * (kt // 2)
    if cache is not None and tpad > 0:
        x = torch.cat([cache, x], dim=2)
        tpad -= cache.shape[2]
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, tpad, 0))
    return F.conv3d(x, w, b, stride=(stride, 1, 1))


def rms_norm(g, x):
    gam = torch.tensor(np.asarray(g, np.float32)).view(1, -1, *([1] * (x.dim() - 2)))
    return F.normalize(x, dim=1) * math.sqrt(x.shape[1]) * gam


class Ctx:
    """feat_cache walker (mirrors feat_idx/feat_cache)."""

    def __init__(self):
        self.cache = {}
        self.idx = 0

    def step(self, x, fn):
        i = self.idx
        self.idx += 1
        prev = self.cache.get(i)
        cache_x = x[:, :, -CACHE_T:].clone()
        if cache_x.shape[2] < 2 and prev is not None and not isinstance(prev, str):
            cache_x = torch.cat([prev[:, :, -1:], cache_x], dim=2)
        out = fn(x, prev)
        self.cache[i] = cache_x
        return out


def res_block(p, x, ctx):
    h = causal_conv(p["shortcut"], x) if "shortcut" in p else x
    y = F.silu(rms_norm(p["norm1"], x))
    y = ctx.step(y, lambda v, c: causal_conv(p["conv1"], v, c))
    y = F.silu(rms_norm(p["norm2"], y))
    y = ctx.step(y, lambda v, c: causal_conv(p["conv2"], v, c))
    return y + h


def attn_block(p, x):
    b, c, t, h, w = x.shape
    y = rms_norm(p["norm"], x)
    y = y.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    qkv = F.conv2d(y, t_w2(p["to_qkv"]), t_b(p["to_qkv"]))
    q, k, v = qkv.reshape(b * t, 3 * c, h * w).permute(0, 2, 1).chunk(3, dim=-1)
    o = F.scaled_dot_product_attention(q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1))
    o = o.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
    o = F.conv2d(o, t_w2(p["proj"]), t_b(p["proj"]))
    return x + o.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


def spatial_up(p, x):
    b, c, t, h, w = x.shape
    y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = F.interpolate(y, scale_factor=2.0, mode="nearest-exact")
    y = F.conv2d(y, t_w2(p["conv"]), t_b(p["conv"]), padding=1)
    return y.reshape(b, t, -1, 2 * h, 2 * w).permute(0, 2, 1, 3, 4)


def spatial_down(p, x):
    b, c, t, h, w = x.shape
    y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = F.conv2d(F.pad(y, (0, 1, 0, 1)), t_w2(p["conv"]), t_b(p["conv"]), stride=2)
    return y.reshape(b, t, c, y.shape[-2], y.shape[-1]).permute(0, 2, 1, 3, 4)


def upsample3d(p, x, ctx):
    """Streaming temporal upsample (vae.py:106-132)."""
    i = ctx.idx
    ctx.idx += 1
    b, c, t, h, w = x.shape
    prev = ctx.cache.get(i)
    if prev is None:
        ctx.cache[i] = "Rep"
    else:
        cache_x = x[:, :, -CACHE_T:].clone()
        if cache_x.shape[2] < 2 and prev is not None:
            if isinstance(prev, str):  # 'Rep'
                cache_x = torch.cat([torch.zeros_like(cache_x), cache_x], dim=2)
            else:
                cache_x = torch.cat([prev[:, :, -1:], cache_x], dim=2)
        if isinstance(prev, str):
            y = causal_conv(p["time_conv"], x)
        else:
            y = causal_conv(p["time_conv"], x, prev)
        ctx.cache[i] = cache_x
        y = y.reshape(b, 2, c, t, h, w)
        y = torch.stack((y[:, 0], y[:, 1]), 3).reshape(b, c, t * 2, h, w)
        x = y
    return spatial_up(p, x)


def downsample3d(p, x, ctx):
    """Streaming temporal downsample (vae.py:133-152): spatial first."""
    x = spatial_down(p, x)
    i = ctx.idx
    ctx.idx += 1
    prev = ctx.cache.get(i)
    if prev is None:
        ctx.cache[i] = x.clone()
    else:
        cache_x = x[:, :, -1:].clone()
        x = causal_conv_nopad_s2(p["time_conv"], torch.cat([prev[:, :, -1:], x], 2))
        ctx.cache[i] = cache_x
    return x


def causal_conv_nopad_s2(p, x):
    w, b = t_w(p), t_b(p)
    return F.conv3d(x, w, b, stride=(2, 1, 1))


def torch_decoder(params, cfg, z_chunks):
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    outs = []
    ctx = Ctx()
    for z in z_chunks:
        ctx.idx = 0
        x = ctx.step(z, lambda v, c: causal_conv(p["decoder"]["conv1"], v, c))
        for j, blk in enumerate(p["decoder"]["middle"]):
            x = attn_block(blk, x) if j == 1 else res_block(blk, x, ctx)
        for stage in p["decoder"]["up"]:
            for blk in stage["blocks"]:
                x = res_block(blk, x, ctx)
            if "resample" in stage:
                if "time_conv" in stage["resample"]:
                    x = upsample3d(stage["resample"], x, ctx)
                else:
                    x = spatial_up(stage["resample"], x)
        x = F.silu(rms_norm(p["decoder"]["head_norm"], x))
        x = ctx.step(x, lambda v, c: causal_conv(p["decoder"]["head_conv"], v, c))
        outs.append(x)
    return torch.cat(outs, dim=2)


def torch_encoder(params, cfg, x_chunks):
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    outs = []
    ctx = Ctx()
    for xc in x_chunks:
        ctx.idx = 0
        x = ctx.step(xc, lambda v, c: causal_conv(p["encoder"]["conv1"], v, c))
        for i, stage in enumerate(p["encoder"]["down"]):
            for blk in stage["blocks"]:
                x = res_block(blk, x, ctx)
            if "resample" in stage:
                if "time_conv" in stage["resample"]:
                    x = downsample3d(stage["resample"], x, ctx)
                else:
                    x = spatial_down(stage["resample"], x)
        for j, blk in enumerate(p["encoder"]["middle"]):
            x = attn_block(blk, x) if j == 1 else res_block(blk, x, ctx)
        x = F.silu(rms_norm(p["encoder"]["head_norm"], x))
        x = ctx.step(x, lambda v, c: causal_conv(p["encoder"]["head_conv"], v, c))
        outs.append(x)
    return torch.cat(outs, dim=2)


@pytest.fixture(scope="module")
def params():
    return V.init_wan_vae_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_decoder_matches_streaming_reference(params):
    rng = np.random.default_rng(0)
    B, T, H, W = 1, 3, 6, 8  # 3 latent frames -> 1 + 2*2... per upsample
    z = rng.standard_normal((B, CFG.z_dim, T, H, W)).astype(np.float32)
    # jax non-streaming (skip latent normalization/conv2: decoder core only)
    x = jnp.transpose(jnp.asarray(z), (0, 2, 3, 4, 1))
    out = V.decoder_forward(params["decoder"], CFG, x)
    out = np.asarray(jnp.transpose(out, (0, 4, 1, 2, 3)))
    # torch streaming, frame by frame (reference decode loop vae.py:592-607)
    zt = torch.tensor(z)
    chunks = [zt[:, :, i : i + 1] for i in range(T)]
    ref = torch_decoder(params, CFG, chunks).numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_encoder_matches_streaming_reference(params):
    rng = np.random.default_rng(1)
    B, T, H, W = 1, 9, 8, 8  # 1 + 4k frames
    x = rng.standard_normal((B, 3, T, H, W)).astype(np.float32)
    xin = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))
    out = V.encoder_forward(params["encoder"], CFG, xin)
    out = np.asarray(jnp.transpose(out, (0, 4, 1, 2, 3)))
    xt = torch.tensor(x)
    chunks = [xt[:, :, :1]] + [xt[:, :, 1 + 4 * i : 5 + 4 * i] for i in range((T - 1) // 4)]
    ref = torch_encoder(params, CFG, chunks).numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_encode_decode_shapes(params):
    # encode: 1+4k pixel frames -> 1+k latent frames (here k per temporal stage)
    n_down = sum(CFG.temporal_downsample)
    sp = 2 ** (len(CFG.dim_mult) - 1)
    video = jnp.zeros((1, 3, 1 + 2 * 2**n_down, 8 * sp, 8 * sp), jnp.float32)
    mu = V.vae_encode(params, CFG, video)
    assert mu.shape == (1, CFG.z_dim, 1 + 2, 8, 8)
    # decode: T latent frames -> 1 + (T-1)*2^n_temporal_up frames
    z = jnp.zeros((1, CFG.z_dim, 3, 4, 4), jnp.float32)
    outv = V.vae_decode(params, CFG, z)
    n_up = sum(CFG.temporal_upsample)
    assert outv.shape == (1, 3, 1 + 2 * 2**n_up, 4 * sp, 4 * sp)


def test_streamed_decode_exact():
    """vae_decode_streamed == vae_decode exactly (the reference WanVAE's own
    feat_cache streaming, vae.py:584-610, as a functional per-conv cache).
    Exactness holds for ANY chunk size because frame-local ops carry no
    state and conv caches are exact."""
    import numpy as np

    from sparse_videogen_tpu.models.wan import vae as WV

    cfg = WV.WanVAEConfig(dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)
    params = WV.init_wan_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim, 7, 8, 12)) * 0.5
    whole = np.asarray(WV.vae_decode(params, cfg, z))
    for chunk in (1, 2, 5, 7):
        s = np.asarray(WV.vae_decode_streamed(params, cfg, z, chunk=chunk))
        np.testing.assert_allclose(s, whole, atol=2e-5)


def test_streamed_plus_tiled_decode_via_cli_factory():
    """--vae_stream_chunk composes with --vae_tiling through make_vae_decoder."""
    import types

    import numpy as np

    from sparse_videogen_tpu.cli._common import make_vae_decoder
    from sparse_videogen_tpu.models.wan import vae as WV
    from sparse_videogen_tpu.utils.logging import logger

    cfg = WV.WanVAEConfig(dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)
    params = WV.init_wan_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim, 5, 12, 16)) * 0.5
    whole = np.asarray(WV.vae_decode(params, cfg, z))
    def run(stream):
        args = types.SimpleNamespace(vae_tiling="on", vae_tile=8,
                                     vae_tile_overlap=2, vae_stream_chunk=stream)
        return np.asarray(make_vae_decoder(args, WV, params, cfg, logger)(z))

    tiled_only, composed = run(0), run(2)
    assert composed.shape == whole.shape
    # tiling is approximate at tile borders; streaming adds EXACTLY nothing:
    # the composed output equals the tiling-only output
    np.testing.assert_allclose(composed, tiled_only, atol=2e-5)
