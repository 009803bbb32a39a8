"""Cosmos causal video tokenizer (continuous CV8x8x8) — encoder/decoder.

The reference consumes this through the diffusers Cosmos pipeline
(`/root/reference/cosmos_t2v_inference.py` ends in `export_to_video`, i.e.
the pipeline's VAE decodes latents to pixels). Neither diffusers nor the
NVIDIA Cosmos-Tokenizer sources are vendored in the reference repo, so this
is a structure-faithful re-derivation of the published architecture
(NVIDIA Cosmos-Tokenizer, arXiv:2411.04982; continuous-video CV8x8x8):

  patcher:  log2(patch_size) levels of CAUSAL 3-D Haar wavelet transform
            (temporal pairs are front-padded by replicating frame 0, so
            T -> (T-1)/2 + 1 per level and frame 0 maps to itself);
            each level: channels x8, (T,H,W)/2. patch_size=4 -> x64 channels,
            /4 in every dim. Exactly orthonormal, hence exactly invertible
            (unpatcher = transposed transform; round-trip tested).
  encoder:  causal conv_in -> len(channels_mult) levels of resnet blocks
            (GroupNorm(1) + SiLU + causal conv3d) with one strided
            (2,2,2) causal downsample (the remaining 2x of the 8x8x8
            compression beyond the patcher's 4x) -> mid (resnet, per-frame
            spatial attention, causal temporal attention, resnet) ->
            GroupNorm(1)/SiLU/causal conv_out -> latent_channels.
  decoder:  mirror image with nearest upsampling (temporal 2T-1: every
            frame repeated except the first, the causal inverse of the
            (T-1)/2+1 downsample).

Continuous Cosmos is non-variational: encode returns the latent directly
(the diffusion pipeline standardizes with per-channel latents_mean/std).

Validation boundary (same as the CogVideoX VAE, README.md): no diffusers
and no checkpoints exist in this environment, so parity is validated
structurally (shape contracts, exact wavelet round-trip, causality) rather
than bit-for-bit against the published weights; `convert_cosmos_vae`
(io/checkpoint.py) maps diffusers-style key names defensively and fails
loudly on mismatch.

TPU design notes: NDHWC convs with f32 accumulation, functional param
pytrees, whole-sequence decode in one jit, spatial attention chunked over
query rows (the bottleneck frame is 88x160 = 14k tokens at 704x1280 input —
never materialize the full 14k^2 matrix), tiled decode via the shared
models/common/vae_tiling.py helper.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


@dataclasses.dataclass(frozen=True)
class CosmosVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    base_channels: int = 128
    channels_mult: tuple = (2, 4, 4)
    num_res_blocks: int = 2
    patch_size: int = 4  # Haar levels = log2(patch_size)
    spatial_compression: int = 8
    temporal_compression: int = 8
    # mid spatial attention runs per frame with queries chunked to this many
    # rows (the bottleneck frame is ~14k tokens at 704x1280 — the full
    # (S, S) logits matrix must never materialize)
    attn_q_chunk: int = 2048
    latents_mean: tuple | None = None
    latents_std: tuple | None = None

    @property
    def wavelet_levels(self):
        return int(math.log2(self.patch_size))

    @property
    def conv_spatial_levels(self):
        return int(math.log2(self.spatial_compression // self.patch_size))

    @property
    def conv_temporal_levels(self):
        return int(math.log2(self.temporal_compression // self.patch_size))

    def downsample(self, i):
        """Level i ends with a causal (2,2,2) strided conv (encoder) /
        starts from a (2,2,2) upsample (decoder)."""
        return i < max(self.conv_spatial_levels, self.conv_temporal_levels)

    @property
    def patch_channels(self):
        return self.in_channels * 8 ** self.wavelet_levels


COSMOS_VAE_CV8x8x8 = CosmosVAEConfig()


# ---------------------------------------------------------------------------
# causal Haar wavelet patcher (exactly invertible)
# ---------------------------------------------------------------------------


def _haar_axis(x, axis, causal=False):
    """One orthonormal Haar level along `axis`: returns (low, high) with the
    axis halved. causal=True front-pads with the first slice when odd-sized
    (temporal: T -> (T-1)/2 + 1, frame 0 self-paired so high_0 = 0)."""
    n = x.shape[axis]
    if causal and n % 2 == 1:
        first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        x = jnp.concatenate([first, x], axis=axis)
        n += 1
    assert n % 2 == 0, (axis, x.shape)
    shape = list(x.shape)
    shape[axis:axis + 1] = [n // 2, 2]
    xr = x.reshape(shape)
    a = jax.lax.index_in_dim(xr, 0, axis=axis + 1, keepdims=False)
    b = jax.lax.index_in_dim(xr, 1, axis=axis + 1, keepdims=False)
    return (a + b) / _SQRT2, (a - b) / _SQRT2


def _ihaar_axis(lo, hi, axis, causal=False, out_len=None):
    a = (lo + hi) / _SQRT2
    b = (lo - hi) / _SQRT2
    y = jnp.stack([a, b], axis=axis + 1)
    shape = list(lo.shape)
    shape[axis] = 2 * lo.shape[axis]
    y = y.reshape(shape)
    if causal and out_len is not None and y.shape[axis] != out_len:
        y = jax.lax.slice_in_dim(y, y.shape[axis] - out_len, y.shape[axis], axis=axis)
    return y


def haar_patch3d(x, levels):
    """x (B, C, T, H, W) -> (B, C*8^levels, T', H/2^l, W/2^l) with
    T' = (T-1)/2^l + 1 (causal). Subband order per level: (W then H then T;
    low/high interleaved by channel-concat [lo, hi])."""
    for _ in range(levels):
        lo, hi = _haar_axis(x, 4)
        x = jnp.concatenate([lo, hi], axis=1)
        lo, hi = _haar_axis(x, 3)
        x = jnp.concatenate([lo, hi], axis=1)
        lo, hi = _haar_axis(x, 2, causal=True)
        x = jnp.concatenate([lo, hi], axis=1)
    return x


def haar_unpatch3d(x, levels, t_out):
    """Exact inverse of haar_patch3d (t_out = original frame count)."""
    ts = [t_out]
    for _ in range(levels - 1):
        ts.append((ts[-1] - 1) // 2 + 1)
    for lvl in range(levels):
        c = x.shape[1] // 2
        x = _ihaar_axis(x[:, :c], x[:, c:], 2, causal=True, out_len=ts[levels - 1 - lvl])
        c = x.shape[1] // 2
        x = _ihaar_axis(x[:, :c], x[:, c:], 3)
        c = x.shape[1] // 2
        x = _ihaar_axis(x[:, :c], x[:, c:], 4)
    return x


# ---------------------------------------------------------------------------
# primitive ops (NDHWC convs, f32 accumulation; cog/vae.py conventions)
# ---------------------------------------------------------------------------


def causal_conv3d(p, x, *, stride=(1, 1, 1)):
    """x (B, C, T, H, W); time front-padded with frame-0 replicas, H/W
    zero-padded symmetrically (k odd)."""
    w = p["w"]  # (kt, kh, kw, ci, co)
    kt, kh, kw = w.shape[:3]
    x = jnp.moveaxis(x, 1, -1)
    if kt > 1:
        x = jnp.concatenate([jnp.repeat(x[:, :1], kt - 1, axis=1), x], axis=1)
    if kh > 1 or kw > 1:
        x = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["b"]).astype(x.dtype)
    return jnp.moveaxis(y, -1, 1)


def group_norm1(p, x, eps=1e-6):
    """Per-FRAME GroupNorm(num_groups=1) — the tokenizer's CausalNormalize
    (statistics over (C, H, W) per (B, T); a norm over T would leak future
    frames into the past and break causality)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 3, 4), keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["g"][None, :, None, None, None] + p["b"][None, :, None, None, None]
    return out.astype(x.dtype)


def resnet_block(p, x):
    h = causal_conv3d(p["conv1"], jax.nn.silu(group_norm1(p["norm1"], x)))
    h = causal_conv3d(p["conv2"], jax.nn.silu(group_norm1(p["norm2"], h)))
    if "shortcut" in p:
        w = p["shortcut"]["w"]
        w2 = w[0, 0, 0] if w.ndim == 5 else w
        x = jnp.einsum("bcthw,cd->bdthw", x.astype(jnp.float32), w2.astype(jnp.float32))
        x = (x + p["shortcut"]["b"][None, :, None, None, None]).astype(h.dtype)
    return x + h


def _proj(p, x):  # 1x1x1 conv as einsum over channel axis LAST
    return x @ p["w"] + p["b"]


def spatial_attention(p, x, q_chunk):
    """Single-head per-frame self-attention over H*W, chunked queries.
    x (B, C, T, H, W)."""
    B, C, T, H, W = x.shape
    h = group_norm1(p["norm"], x)
    tok = h.transpose(0, 2, 3, 4, 1).reshape(B * T, H * W, C).astype(jnp.float32)
    q, k, v = _proj(p["q"], tok), _proj(p["k"], tok), _proj(p["v"], tok)
    scale = 1.0 / math.sqrt(C)
    n = tok.shape[1]
    chunks = []
    for s in range(0, n, q_chunk):
        a = jax.nn.softmax(q[:, s:s + q_chunk] @ k.swapaxes(-1, -2) * scale, axis=-1)
        chunks.append(a @ v)
    o = _proj(p["o"], jnp.concatenate(chunks, axis=1))
    o = o.reshape(B, T, H, W, C).transpose(0, 4, 1, 2, 3).astype(x.dtype)
    return x + o


def temporal_attention(p, x):
    """Single-head CAUSAL self-attention over T per spatial position."""
    B, C, T, H, W = x.shape
    h = group_norm1(p["norm"], x)
    tok = h.transpose(0, 3, 4, 2, 1).reshape(B * H * W, T, C).astype(jnp.float32)
    q, k, v = _proj(p["q"], tok), _proj(p["k"], tok), _proj(p["v"], tok)
    logits = q @ k.swapaxes(-1, -2) / math.sqrt(C)
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask, logits, -jnp.inf)
    o = _proj(p["o"], jax.nn.softmax(logits, axis=-1) @ v)
    o = o.reshape(B, H, W, T, C).transpose(0, 4, 3, 1, 2).astype(x.dtype)
    return x + o


def upsample_causal(x, factor):
    """Nearest upsample; temporal is causal: T -> 2T - 1 (every frame
    repeated except the first — the inverse of (T-1)/2 + 1)."""
    ft, fh, fw = factor
    if ft == 2:
        x = jnp.repeat(x, 2, axis=2)[:, :, 1:]
    if fh == 2:
        x = jnp.repeat(x, 2, axis=3)
    if fw == 2:
        x = jnp.repeat(x, 2, axis=4)
    return x


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def _mid(p, x, q_chunk):
    x = resnet_block(p["res1"], x)
    x = spatial_attention(p["attn_s"], x, q_chunk)
    x = temporal_attention(p["attn_t"], x)
    return resnet_block(p["res2"], x)


def encoder_forward(p, cfg: CosmosVAEConfig, x):
    x = haar_patch3d(x, cfg.wavelet_levels)
    x = causal_conv3d(p["conv_in"], x)
    for i, level in enumerate(p["levels"]):
        for blk in level["res"]:
            x = resnet_block(blk, x)
        if "down" in level:
            x = causal_conv3d(level["down"], x, stride=(2, 2, 2))
    x = _mid(p["mid"], x, cfg.attn_q_chunk)
    x = jax.nn.silu(group_norm1(p["norm_out"], x))
    return causal_conv3d(p["conv_out"], x)


def decoder_forward(p, cfg: CosmosVAEConfig, z, t_out):
    x = causal_conv3d(p["conv_in"], z)
    x = _mid(p["mid"], x, cfg.attn_q_chunk)
    for level in p["levels"]:  # deepest -> shallowest
        for blk in level["res"]:
            x = resnet_block(blk, x)
        if "up" in level:
            x = upsample_causal(x, (2, 2, 2))
            x = causal_conv3d(level["up"], x)
    x = jax.nn.silu(group_norm1(p["norm_out"], x))
    x = causal_conv3d(p["conv_out"], x)
    return haar_unpatch3d(x, cfg.wavelet_levels, t_out)


def _latent_stats(cfg):
    mean = jnp.zeros((cfg.latent_channels,)) if cfg.latents_mean is None \
        else jnp.asarray(cfg.latents_mean)
    std = jnp.ones((cfg.latent_channels,)) if cfg.latents_std is None \
        else jnp.asarray(cfg.latents_std)
    return mean, std


def vae_encode(params, cfg: CosmosVAEConfig, video):
    """video (B, 3, T, H, W) in [-1, 1], T = 1 + k*temporal_compression ->
    standardized latents (B, z, T', H/8, W/8), T' = (T-1)/8 + 1."""
    z = encoder_forward(params["encoder"], cfg, video)
    mean, std = _latent_stats(cfg)
    return (z - mean[None, :, None, None, None]) / std[None, :, None, None, None]


def vae_decode(params, cfg: CosmosVAEConfig, z):
    """standardized latents -> video (B, 3, T, H, W) in [-1, 1]."""
    mean, std = _latent_stats(cfg)
    z = z * jnp.asarray(std, z.dtype)[None, :, None, None, None]
    z = z + jnp.asarray(mean, z.dtype)[None, :, None, None, None]
    t_out = (z.shape[2] - 1) * cfg.temporal_compression + 1
    x = decoder_forward(params["decoder"], cfg, z, t_out)
    return jnp.clip(x, -1.0, 1.0)


def vae_decode_tiled(params, cfg: CosmosVAEConfig, z, *, tile: int = 32, overlap: int = 8):
    """Spatially tiled decode (models/common/vae_tiling.py)."""
    from sparse_videogen_tpu.models.common.vae_tiling import jit_tiled_decode

    return jit_tiled_decode(vae_decode, params, cfg, z, tile=tile,
                            overlap=overlap, scale=cfg.spatial_compression)


# ---------------------------------------------------------------------------
# init (tests / smoke; converter lives in io/checkpoint.py)
# ---------------------------------------------------------------------------


def _conv_init(rng, kt, kh, kw, ci, co, dtype):
    w = jax.random.normal(rng, (kt, kh, kw, ci, co), dtype) / math.sqrt(kt * kh * kw * ci)
    return {"w": w, "b": jnp.zeros((co,), dtype)}


def _norm_init(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _res_init(rng, ci, co, dtype):
    k = jax.random.split(rng, 3)
    p = {
        "norm1": _norm_init(ci, dtype), "conv1": _conv_init(k[0], 3, 3, 3, ci, co, dtype),
        "norm2": _norm_init(co, dtype), "conv2": _conv_init(k[1], 3, 3, 3, co, co, dtype),
    }
    if ci != co:
        p["shortcut"] = {"w": jax.random.normal(k[2], (ci, co), dtype) / math.sqrt(ci),
                         "b": jnp.zeros((co,), dtype)}
    return p


def _attn_init(rng, c, dtype):
    k = jax.random.split(rng, 4)
    lin = lambda r: {"w": jax.random.normal(r, (c, c), dtype) / math.sqrt(c),
                     "b": jnp.zeros((c,), dtype)}
    return {"norm": _norm_init(c, dtype), "q": lin(k[0]), "k": lin(k[1]),
            "v": lin(k[2]), "o": lin(k[3])}


def _mid_init(rng, c, dtype):
    k = jax.random.split(rng, 4)
    return {"res1": _res_init(k[0], c, c, dtype), "attn_s": _attn_init(k[1], c, dtype),
            "attn_t": _attn_init(k[2], c, dtype), "res2": _res_init(k[3], c, c, dtype)}


def init_cosmos_vae_params(rng, cfg: CosmosVAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(rng, 64))
    chans = [cfg.base_channels] + [cfg.base_channels * m for m in cfg.channels_mult]
    enc_levels, ci = [], cfg.base_channels
    for i, co in enumerate(chans[1:]):
        level = {"res": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(_res_init(next(keys), ci, co, dtype))
            ci = co
        if cfg.downsample(i):
            level["down"] = _conv_init(next(keys), 3, 3, 3, co, co, dtype)
        enc_levels.append(level)
    cz = chans[-1]
    enc = {
        "conv_in": _conv_init(next(keys), 3, 3, 3, cfg.patch_channels, cfg.base_channels, dtype),
        "levels": enc_levels,
        "mid": _mid_init(next(keys), cz, dtype),
        "norm_out": _norm_init(cz, dtype),
        "conv_out": _conv_init(next(keys), 3, 3, 3, cz, cfg.latent_channels, dtype),
    }
    dec_levels, ci = [], cz
    for i in reversed(range(len(cfg.channels_mult))):
        co = chans[i + 1]
        level = {"res": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["res"].append(_res_init(next(keys), ci, co, dtype))
            ci = co
        if cfg.downsample(i):
            level["up"] = _conv_init(next(keys), 3, 3, 3, co, co, dtype)
        dec_levels.append(level)
    dec = {
        "conv_in": _conv_init(next(keys), 3, 3, 3, cfg.latent_channels, cz, dtype),
        "mid": _mid_init(next(keys), cz, dtype),
        "levels": dec_levels,
        "norm_out": _norm_init(chans[1], dtype),
        "conv_out": _conv_init(next(keys), 3, 3, 3, chans[1], cfg.patch_channels, dtype),
    }
    return {"encoder": enc, "decoder": dec}
