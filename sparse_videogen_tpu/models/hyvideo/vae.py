"""HunyuanVideo causal-3D VAE (884-16c-hy).

Reference: /root/reference/svg/models/hyvideo_orig/vae/
  autoencoder_kl_causal_3d.py (quant convs, encode/decode)
  vae.py:32-230 (EncoderCausal3D / DecoderCausal3D tower layout)
  unet_causal_3d_blocks.py:45-737 (CausalConv3d, Resnet, Mid w/ attention,
  Down/Up blocks, prepare_causal_attention_mask)

Structure (884 = time x height x width compression 4/8/8, 16 latent ch):
  encoder: conv_in -> 4 down blocks (2 resnets each; spatial ds at blocks
  0-2, temporal ds at blocks 1-2) -> mid (resnet, frame-causal attention,
  resnet) -> GroupNorm/silu/conv_out(2z) -> quant_conv(1x1x1).
  decoder: post_quant_conv -> conv_in -> mid -> 4 up blocks (3 resnets each;
  spatial us at blocks 0-2, temporal us at blocks 1-2; nearest upsample with
  the FIRST frame upsampled spatially only) -> GroupNorm/silu/conv_out.

TPU design: NDHWC layout inside convs (XLA TPU conv layout), functional
param pytrees, one jit for the whole decode. CausalConv3d pads H/W
symmetrically and T by (k-1) frames in front, all in *replicate* mode
(unet_causal_3d_blocks.py:64-71).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HyVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    norm_num_groups: int = 32
    scaling_factor: float = 0.476986
    time_compression: int = 4
    spatial_compression: int = 8

    @property
    def num_blocks(self):
        return len(self.block_out_channels)

    def spatial_ds(self, i):  # encoder order
        return i < int(math.log2(self.spatial_compression))

    def temporal_ds(self, i):
        return i >= (self.num_blocks - 1 - int(math.log2(self.time_compression))) and i != self.num_blocks - 1


def causal_conv3d(p, x, *, stride=(1, 1, 1)):
    """x: (B, C, T, H, W). Replicate-pad (W,H by k//2; T by k-1 in front)."""
    w = p["w"]  # (kt, kh, kw, ci, co)
    kt, kh, kw = w.shape[:3]
    x = jnp.moveaxis(x, 1, -1)  # NDHWC
    pads = ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads, mode="edge")
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["b"]).astype(x.dtype)
    return jnp.moveaxis(y, -1, 1)


def plain_conv3d_1x1(p, x):
    """1x1x1 Conv3d (quant/post_quant convs) as a pointwise linear."""
    w = p["w"][0, 0, 0]  # (ci, co)
    y = jnp.einsum("bcthw,cd->bdthw", x.astype(jnp.float32), w.astype(jnp.float32))
    return (y + p["b"][None, :, None, None, None]).astype(x.dtype)


def group_norm(p, x, groups, eps=1e-6):
    """x: (B, C, T, H, W), f32 statistics over (C/G, T, H, W)."""
    B, C, T, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, T, H, W)
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4, 5), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, C, T, H, W)
    out = xf * p["g"][None, :, None, None, None] + p["b"][None, :, None, None, None]
    return out.astype(x.dtype)


def resnet_block(p, x, groups):
    h = group_norm(p["norm1"], x, groups)
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv1"], h)
    h = group_norm(p["norm2"], h, groups)
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv2"], h)
    if "shortcut" in p:
        x = causal_conv3d(p["shortcut"], x)
    return x + h


def mid_attention(p, x, groups, q_chunk=4096):
    """Single-head full attention over (T*H*W) with frame-causal mask
    (unet_causal_3d_blocks.py:34-42,592-603); residual connection.

    Queries are processed in q_chunk rows so the logits never materialize as
    one (S, S) matrix: at 720p x 129f inside a 32-latent spatial tile,
    S = 33*32*32 = 33.8k and the full matrix is 4.4 GB f32 — a silent OOM on
    a 16 GB chip. Chunking bounds it at q_chunk*S (exact, same math)."""
    B, C, T, H, W = x.shape
    resid = x
    h = group_norm(p["norm"], x, groups)
    hs = h.reshape(B, C, T * H * W).transpose(0, 2, 1)  # (B, S, C)
    f32 = jnp.float32
    q = hs.astype(f32) @ p["q"]["w"].astype(f32) + p["q"]["b"]
    k = hs.astype(f32) @ p["k"]["w"].astype(f32) + p["k"]["b"]
    v = hs.astype(f32) @ p["v"]["w"].astype(f32) + p["v"]["b"]
    scale = C ** -0.5
    S = T * H * W
    frame_q = jnp.arange(S) // (H * W)
    chunks = []
    for s0 in range(0, S, q_chunk):
        s = jnp.einsum("bqc,bkc->bqk", q[:, s0:s0 + q_chunk], k) * scale
        mask = frame_q[s0:s0 + q_chunk, None] >= frame_q[None, :]
        s = jnp.where(mask[None], s, -jnp.inf)
        chunks.append(jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(s, axis=-1), v))
    o = jnp.concatenate(chunks, axis=1)
    o = o @ p["o"]["w"].astype(f32) + p["o"]["b"]
    o = o.transpose(0, 2, 1).reshape(B, C, T, H, W).astype(x.dtype)
    return resid + o


def mid_block(p, x, groups):
    x = resnet_block(p["res0"], x, groups)
    x = mid_attention(p["attn"], x, groups)
    x = resnet_block(p["res1"], x, groups)
    return x


def upsample_nearest(x, factor):
    """Nearest upsample; first frame only spatially when factor[0] == 2
    (unet_causal_3d_blocks.py:150-166)."""
    ft, fh, fw = factor
    B, C, T, H, W = x.shape

    def up_spatial(y):
        y = jnp.repeat(y, fh, axis=3)
        return jnp.repeat(y, fw, axis=4)

    if ft == 1 or T == 1:
        return up_spatial(x)
    first, rest = x[:, :, :1], x[:, :, 1:]
    rest = jnp.repeat(rest, ft, axis=2)
    return jnp.concatenate([up_spatial(first), up_spatial(rest)], axis=2)


def encoder_forward(p, cfg: HyVideoVAEConfig, x):
    g = cfg.norm_num_groups
    x = causal_conv3d(p["conv_in"], x)
    for i in range(cfg.num_blocks):
        blk = p["down"][i]
        for r in blk["res"]:
            x = resnet_block(r, x, g)
        if "ds" in blk:
            stride = (2 if cfg.temporal_ds(i) else 1,
                      2 if cfg.spatial_ds(i) else 1,
                      2 if cfg.spatial_ds(i) else 1)
            x = causal_conv3d(blk["ds"], x, stride=stride)
    x = mid_block(p["mid"], x, g)
    x = group_norm(p["norm_out"], x, g)
    x = jax.nn.silu(x)
    return causal_conv3d(p["conv_out"], x)


def decoder_forward(p, cfg: HyVideoVAEConfig, z):
    g = cfg.norm_num_groups
    x = causal_conv3d(p["conv_in"], z)
    x = mid_block(p["mid"], x, g)
    n = cfg.num_blocks
    for i in range(n):
        blk = p["up"][i]
        for r in blk["res"]:
            x = resnet_block(r, x, g)
        if "us" in blk:
            factor = (2 if cfg.temporal_ds(i) else 1,
                      2 if cfg.spatial_ds(i) else 1,
                      2 if cfg.spatial_ds(i) else 1)
            x = upsample_nearest(x, factor)
            x = causal_conv3d(blk["us"], x)
    x = group_norm(p["norm_out"], x, g)
    x = jax.nn.silu(x)
    return causal_conv3d(p["conv_out"], x)


def vae_decode(params, cfg: HyVideoVAEConfig, z):
    """latents (B, z, T', H', W') -> video (B, 3, T, H, W) in [-1, 1]."""
    z = z.astype(jnp.float32) / cfg.scaling_factor
    z = plain_conv3d_1x1(params["post_quant_conv"], z)
    return decoder_forward(params["decoder"], cfg, z)


def vae_encode(params, cfg: HyVideoVAEConfig, video, rng=None):
    """video (B, 3, T, H, W) -> latents; sample if rng given, else mean."""
    h = encoder_forward(params["encoder"], cfg, video)
    moments = plain_conv3d_1x1(params["quant_conv"], h)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if rng is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


# ---------------------------------------------------------------------------
# init (tests / smoke)
# ---------------------------------------------------------------------------


def _conv_init(rng, kt, kh, kw, ci, co, dtype):
    k1, _ = jax.random.split(rng)
    fan = kt * kh * kw * ci
    w = jax.random.normal(k1, (kt, kh, kw, ci, co), dtype) / math.sqrt(fan)
    return {"w": w, "b": jnp.zeros((co,), dtype)}


def _lin_init(rng, ci, co, dtype):
    w = jax.random.normal(rng, (ci, co), dtype) / math.sqrt(ci)
    return {"w": w, "b": jnp.zeros((co,), dtype)}


def _norm_init(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _res_init(rng, ci, co, dtype):
    ks = jax.random.split(rng, 3)
    p = {
        "norm1": _norm_init(ci, dtype),
        "conv1": _conv_init(ks[0], 3, 3, 3, ci, co, dtype),
        "norm2": _norm_init(co, dtype),
        "conv2": _conv_init(ks[1], 3, 3, 3, co, co, dtype),
    }
    if ci != co:
        p["shortcut"] = _conv_init(ks[2], 1, 1, 1, ci, co, dtype)
    return p


def _mid_init(rng, c, dtype):
    ks = jax.random.split(rng, 6)
    return {
        "res0": _res_init(ks[0], c, c, dtype),
        "attn": {
            "norm": _norm_init(c, dtype),
            "q": _lin_init(ks[1], c, c, dtype),
            "k": _lin_init(ks[2], c, c, dtype),
            "v": _lin_init(ks[3], c, c, dtype),
            "o": _lin_init(ks[4], c, c, dtype),
        },
        "res1": _res_init(ks[5], c, c, dtype),
    }


def init_hyvideo_vae_params(rng, cfg: HyVideoVAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(rng, 64))
    bo = cfg.block_out_channels
    z = cfg.latent_channels
    enc_down = []
    ch = bo[0]
    for i in range(cfg.num_blocks):
        res = []
        ci = ch
        for _ in range(cfg.layers_per_block):
            res.append(_res_init(next(ks), ci, bo[i], dtype))
            ci = bo[i]
        blk = {"res": res}
        if cfg.spatial_ds(i) or cfg.temporal_ds(i):
            blk["ds"] = _conv_init(next(ks), 3, 3, 3, bo[i], bo[i], dtype)
        enc_down.append(blk)
        ch = bo[i]
    encoder = {
        "conv_in": _conv_init(next(ks), 3, 3, 3, cfg.in_channels, bo[0], dtype),
        "down": enc_down,
        "mid": _mid_init(next(ks), bo[-1], dtype),
        "norm_out": _norm_init(bo[-1], dtype),
        "conv_out": _conv_init(next(ks), 3, 3, 3, bo[-1], 2 * z, dtype),
    }
    rev = list(reversed(bo))
    dec_up = []
    ch = rev[0]
    for i in range(cfg.num_blocks):
        res = []
        ci = ch
        for _ in range(cfg.layers_per_block + 1):
            res.append(_res_init(next(ks), ci, rev[i], dtype))
            ci = rev[i]
        blk = {"res": res}
        if cfg.spatial_ds(i) or cfg.temporal_ds(i):
            blk["us"] = _conv_init(next(ks), 3, 3, 3, rev[i], rev[i], dtype)
        dec_up.append(blk)
        ch = rev[i]
    decoder = {
        "conv_in": _conv_init(next(ks), 3, 3, 3, z, rev[0], dtype),
        "mid": _mid_init(next(ks), rev[0], dtype),
        "up": dec_up,
        "norm_out": _norm_init(bo[0], dtype),
        "conv_out": _conv_init(next(ks), 3, 3, 3, bo[0], cfg.out_channels, dtype),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv_init(next(ks), 1, 1, 1, 2 * z, 2 * z, dtype),
        "post_quant_conv": _conv_init(next(ks), 1, 1, 1, z, z, dtype),
    }


def vae_decode_tiled(params, cfg: HyVideoVAEConfig, z, *, tile: int = 32, overlap: int = 8):
    """Spatially tiled decode (reference: pipe.vae.enable_tiling(),
    hyvideo_t2v_inference.py:81; see models/common/vae_tiling.py)."""
    from sparse_videogen_tpu.models.common.vae_tiling import jit_tiled_decode

    return jit_tiled_decode(vae_decode, params, cfg, z, tile=tile,
                            overlap=overlap, scale=8)
