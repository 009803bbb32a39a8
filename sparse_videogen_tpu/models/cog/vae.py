"""CogVideoX causal-3D VAE (v1.0 2b/5b and v1.5).

The reference consumes this model through diffusers
(``AutoencoderKLCogVideoX``; /root/reference/cog_inference.py:33-34 enables
its tiling/slicing). diffusers is not vendored in the reference repo, so this
is a structure-faithful re-derivation of the published architecture:

  encoder: causal conv_in -> 4 down blocks (``layers_per_block`` resnets each;
  spatial stride-2 conv downsample at non-final blocks, temporal pairwise
  avg-pool at blocks 0-1) -> mid (2 resnets) -> GroupNorm/silu/conv_out(2z).
  decoder: causal conv_in -> mid -> 4 up blocks (``layers_per_block + 1``
  resnets; nearest 2x upsample + 3x3 conv at non-final blocks, temporal 2x at
  up blocks 0-1) -> SpatialNorm/silu/conv_out.  Every decoder norm is a
  "spatial norm": GroupNorm(f) * conv_y(zq) + conv_b(zq) with the raw latent
  zq nearest-resized to f's resolution (first latent frame resized to the
  first output frame separately, because time upsampling doubles only frames
  1..T-1).

Causal conv padding differs from the Wan/HunyuanVideo VAEs: time is front-
padded by replicating the FIRST frame (k_t - 1 copies); height/width are
ZERO-padded symmetrically.  Temporal resampling keeps frame 0 unpaired, so
pixel frames = 1 + 4*(latent frames - 1).

No quant/post-quant convs (use_quant_conv = use_post_quant_conv = False in
every published CogVideoX VAE config).

TPU design notes: NDHWC conv layout, f32 conv accumulation
(`preferred_element_type`), functional param pytrees, whole-sequence decode
in one jit.  Upstream streams the decoder over 2-latent-frame chunks with a
conv cache to bound GPU memory; that makes its GroupNorm statistics
per-chunk, so whole-sequence decode differs at normalization-noise level —
we keep the cleaner whole-sequence semantics (TPU HBM fits it).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CogVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 256, 512)
    layers_per_block: int = 3
    latent_channels: int = 16
    norm_num_groups: int = 32
    # v1.0 (2b): 1.15258426, invert=False. v1.5 (and 5b-I2V v1.5): 0.7,
    # invert=True ("forgot to multiply the scaling factor during training").
    scaling_factor: float = 0.7
    invert_scale_latents: bool = True
    temporal_compression: int = 4
    spatial_compression: int = 8

    @property
    def num_blocks(self):
        return len(self.block_out_channels)

    @property
    def temporal_levels(self):
        return int(math.log2(self.temporal_compression))

    def compress_time(self, i):
        """Block i halves (encoder) / doubles (decoder) the frame count."""
        return i < self.temporal_levels

    def resample_spatial(self, i):
        return i != self.num_blocks - 1


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------


def causal_conv3d(p, x):
    """x: (B, C, T, H, W). T front-padded with frame-0 replicas; H/W zero-pad."""
    w = p["w"]  # (kt, kh, kw, ci, co)
    kt, kh, kw = w.shape[:3]
    x = jnp.moveaxis(x, 1, -1)  # NDHWC
    if kt > 1:
        x = jnp.concatenate([jnp.repeat(x[:, :1], kt - 1, axis=1), x], axis=1)
    if kh > 1 or kw > 1:
        x = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["b"]).astype(x.dtype)
    return jnp.moveaxis(y, -1, 1)


def conv3d_1x1(p, x):
    """Pointwise Conv3d (resnet shortcuts, spatial-norm projections)."""
    w = p["w"]
    w = w[0, 0, 0] if w.ndim == 5 else w
    y = jnp.einsum("bcthw,cd->bdthw", x.astype(jnp.float32), w.astype(jnp.float32))
    return (y + p["b"][None, :, None, None, None]).astype(x.dtype)


def conv2d_frames(p, x, *, stride=1, pad=((1, 1), (1, 1))):
    """Per-frame Conv2d over (B, C, T, H, W); weight (kh, kw, ci, co)."""
    B, C, T, H, W = x.shape
    y = x.transpose(0, 2, 3, 4, 1).reshape(B * T, H, W, C)
    y = jax.lax.conv_general_dilated(
        y, p["w"], window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["b"]).astype(x.dtype)
    Ho, Wo = y.shape[1:3]
    return y.reshape(B, T, Ho, Wo, -1).transpose(0, 4, 1, 2, 3)


def group_norm(p, x, groups, eps=1e-6):
    B, C, T, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, T, H, W)
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4, 5), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, C, T, H, W)
    out = xf * p["g"][None, :, None, None, None] + p["b"][None, :, None, None, None]
    return out.astype(x.dtype)


def _nearest_resize_to(zq, t, h, w):
    """Nearest-neighbour resize; target dims are integer multiples here, so
    repeat matches torch's floor-indexing nearest exactly."""
    _, _, tz, hz, wz = zq.shape
    if t != tz:
        zq = jnp.repeat(zq, t // tz, axis=2)
    if h != hz:
        zq = jnp.repeat(zq, h // hz, axis=3)
    if w != wz:
        zq = jnp.repeat(zq, w // wz, axis=4)
    return zq


def spatial_norm(p, f, zq, groups):
    """GroupNorm(f) * conv_y(zq~) + conv_b(zq~), zq~ resized to f; the first
    latent frame conditions the first output frame on its own."""
    B, C, T, H, W = f.shape
    if T > 1 and T % 2 == 1:
        z_first = _nearest_resize_to(zq[:, :, :1], 1, H, W)
        z_rest = _nearest_resize_to(zq[:, :, 1:], T - 1, H, W)
        zq = jnp.concatenate([z_first, z_rest], axis=2)
    else:
        zq = _nearest_resize_to(zq, T, H, W)
    nf = group_norm(p["norm"], f, groups)
    return nf * conv3d_1x1(p["conv_y"], zq) + conv3d_1x1(p["conv_b"], zq)


def _norm(p, x, zq, groups):
    return group_norm(p, x, groups) if zq is None else spatial_norm(p, x, zq, groups)


def resnet_block(p, x, zq, groups):
    h = _norm(p["norm1"], x, zq, groups)
    h = causal_conv3d(p["conv1"], jax.nn.silu(h))
    h = _norm(p["norm2"], h, zq, groups)
    h = causal_conv3d(p["conv2"], jax.nn.silu(h))
    if "shortcut" in p:
        x = conv3d_1x1(p["shortcut"], x)
    return x + h


def downsample(p, x, compress_time):
    """Temporal pairwise mean (frame 0 kept alone when T is odd), then
    right/bottom zero-pad + stride-2 Conv2d per frame."""
    if compress_time:
        B, C, T, H, W = x.shape
        if T % 2 == 1:
            first, rest = x[:, :, :1], x[:, :, 1:]
            if rest.shape[2] > 0:
                rest = 0.5 * (rest[:, :, ::2] + rest[:, :, 1::2])
            x = jnp.concatenate([first, rest], axis=2)
        else:
            x = 0.5 * (x[:, :, ::2] + x[:, :, 1::2])
    return conv2d_frames(p["conv"], x, stride=2, pad=((0, 1), (0, 1)))


def upsample(p, x, compress_time):
    """Nearest 2x (time doubled for frames 1..T-1 only when T is odd), then
    3x3 Conv2d per frame."""
    if compress_time:
        B, C, T, H, W = x.shape
        if T > 1 and T % 2 == 1:
            first, rest = x[:, :, :1], x[:, :, 1:]
            first = _nearest_resize_to(first, 1, 2 * H, 2 * W)
            rest = _nearest_resize_to(rest, 2 * (T - 1), 2 * H, 2 * W)
            x = jnp.concatenate([first, rest], axis=2)
        elif T > 1:
            x = _nearest_resize_to(x, 2 * T, 2 * H, 2 * W)
        else:
            x = _nearest_resize_to(x, 1, 2 * H, 2 * W)
    else:
        B, C, T, H, W = x.shape
        x = _nearest_resize_to(x, T, 2 * H, 2 * W)
    return conv2d_frames(p["conv"], x, stride=1, pad=((1, 1), (1, 1)))


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------


def encoder_forward(p, cfg: CogVAEConfig, x):
    g = cfg.norm_num_groups
    x = causal_conv3d(p["conv_in"], x)
    for i in range(cfg.num_blocks):
        blk = p["down"][i]
        for r in blk["res"]:
            x = resnet_block(r, x, None, g)
        if "ds" in blk:
            x = downsample(blk["ds"], x, cfg.compress_time(i))
    for r in p["mid"]["res"]:
        x = resnet_block(r, x, None, g)
    x = group_norm(p["norm_out"], x, g)
    return causal_conv3d(p["conv_out"], jax.nn.silu(x))


def decoder_forward(p, cfg: CogVAEConfig, z):
    g = cfg.norm_num_groups
    x = causal_conv3d(p["conv_in"], z)
    for r in p["mid"]["res"]:
        x = resnet_block(r, x, z, g)
    for i in range(cfg.num_blocks):
        blk = p["up"][i]
        for r in blk["res"]:
            x = resnet_block(r, x, z, g)
        if "us" in blk:
            x = upsample(blk["us"], x, cfg.compress_time(i))
    x = spatial_norm(p["norm_out"], x, z, g)
    return causal_conv3d(p["conv_out"], jax.nn.silu(x))


def vae_encode(params, cfg: CogVAEConfig, video, rng=None):
    """video (B, 3, T, H, W) in [-1, 1] -> RAW latents (B, z, T', H', W').

    Scaling is the caller's job (diffusers puts it in the pipeline, keyed on
    ``invert_scale_latents``); ``scale_latents`` mirrors that convention.
    """
    moments = encoder_forward(params["encoder"], cfg, video)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if rng is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean


def vae_decode(params, cfg: CogVAEConfig, latents):
    """Scaled latents -> video (B, 3, T, H, W); divides by scaling_factor the
    way the upstream pipeline's decode_latents does for every CogVideoX."""
    z = latents.astype(jnp.float32) / cfg.scaling_factor
    return decoder_forward(params["decoder"], cfg, z)


def scale_latents(cfg: CogVAEConfig, raw):
    """Raw encoder latents -> the space the DiT was trained in."""
    if cfg.invert_scale_latents:
        return raw / cfg.scaling_factor
    return raw * cfg.scaling_factor


# ---------------------------------------------------------------------------
# init (tests / smoke)
# ---------------------------------------------------------------------------


def _conv3_init(rng, kt, kh, kw, ci, co, dtype):
    fan = kt * kh * kw * ci
    w = jax.random.normal(rng, (kt, kh, kw, ci, co), dtype) / math.sqrt(fan)
    return {"w": w, "b": jnp.zeros((co,), dtype)}


def _conv2_init(rng, kh, kw, ci, co, dtype):
    fan = kh * kw * ci
    w = jax.random.normal(rng, (kh, kw, ci, co), dtype) / math.sqrt(fan)
    return {"w": w, "b": jnp.zeros((co,), dtype)}


def _gn_init(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _sn_init(rng, c, zc, dtype):
    k1, k2 = jax.random.split(rng)
    return {
        "norm": _gn_init(c, dtype),
        "conv_y": _conv3_init(k1, 1, 1, 1, zc, c, dtype),
        "conv_b": _conv3_init(k2, 1, 1, 1, zc, c, dtype),
    }


def _res_init(rng, ci, co, zc, dtype):
    ks = jax.random.split(rng, 5)
    norm = (lambda k, c: _sn_init(k, c, zc, dtype)) if zc else (lambda k, c: _gn_init(c, dtype))
    p = {
        "norm1": norm(ks[0], ci),
        "conv1": _conv3_init(ks[1], 3, 3, 3, ci, co, dtype),
        "norm2": norm(ks[2], co),
        "conv2": _conv3_init(ks[3], 3, 3, 3, co, co, dtype),
    }
    if ci != co:
        p["shortcut"] = _conv3_init(ks[4], 1, 1, 1, ci, co, dtype)
    return p


def init_cog_vae_params(rng, cfg: CogVAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(rng, 128))
    bo, z = cfg.block_out_channels, cfg.latent_channels
    down, ch = [], bo[0]
    for i in range(cfg.num_blocks):
        res, ci = [], ch
        for _ in range(cfg.layers_per_block):
            res.append(_res_init(next(ks), ci, bo[i], None, dtype))
            ci = bo[i]
        blk = {"res": res}
        if cfg.resample_spatial(i):
            blk["ds"] = {"conv": _conv2_init(next(ks), 3, 3, bo[i], bo[i], dtype)}
        down.append(blk)
        ch = bo[i]
    encoder = {
        "conv_in": _conv3_init(next(ks), 3, 3, 3, cfg.in_channels, bo[0], dtype),
        "down": down,
        "mid": {"res": [_res_init(next(ks), bo[-1], bo[-1], None, dtype) for _ in range(2)]},
        "norm_out": _gn_init(bo[-1], dtype),
        "conv_out": _conv3_init(next(ks), 3, 3, 3, bo[-1], 2 * z, dtype),
    }
    rev = list(reversed(bo))
    up, ch = [], rev[0]
    for i in range(cfg.num_blocks):
        res, ci = [], ch
        for _ in range(cfg.layers_per_block + 1):
            res.append(_res_init(next(ks), ci, rev[i], z, dtype))
            ci = rev[i]
        blk = {"res": res}
        if cfg.resample_spatial(i):
            blk["us"] = {"conv": _conv2_init(next(ks), 3, 3, rev[i], rev[i], dtype)}
        up.append(blk)
        ch = rev[i]
    decoder = {
        "conv_in": _conv3_init(next(ks), 3, 3, 3, z, rev[0], dtype),
        "mid": {"res": [_res_init(next(ks), rev[0], rev[0], z, dtype) for _ in range(2)]},
        "up": up,
        "norm_out": _sn_init(next(ks), bo[0], z, dtype),
        "conv_out": _conv3_init(next(ks), 3, 3, 3, bo[0], cfg.out_channels, dtype),
    }
    return {"encoder": encoder, "decoder": decoder}


def vae_decode_tiled(params, cfg: CogVAEConfig, z, *, tile: int = 32, overlap: int = 8):
    """Spatially tiled decode (diffusers CogVideoX enable_tiling analog; see
    models/common/vae_tiling.py)."""
    from sparse_videogen_tpu.models.common.vae_tiling import jit_tiled_decode

    return jit_tiled_decode(vae_decode, params, cfg, z, tile=tile,
                            overlap=overlap, scale=8)
