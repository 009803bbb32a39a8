"""Wan 2.1 causal 3D VAE (functional JAX).

Re-derivation of WanVAE (/root/reference/svg/models/wan_orig/modules/vae.py):
dim=96, z_dim=16, dim_mult (1,2,4,4), 2 res blocks, temporal downsample
(False, True, True); per-channel latent mean/std normalization (vae.py:675-705).

The reference streams frames through the network in chunks with causal-conv
feature caches (vae.py:34-43 and the feat_cache plumbing) purely to bound
GPU memory. Here the whole sequence is processed at once with the exact
non-streaming equivalents, derived from the chunked traces:

  - CausalConv3d: pad the time axis with 2*(kt//2) leading zeros.
  - downsample3d temporal conv (vae.py:140-152): first chunk (frame 0)
    passes through; later chunks continue a stride-2 kernel-3 unpadded conv
    anchored at frame 0 -> concat([f0, conv_s2(x)]).
  - upsample3d temporal conv (vae.py:106-132): frame 0 is never temporally
    doubled ('Rep' marker skips it) and its features are *excluded* from
    later context (replaced by zeros); frames 1.. run a causal conv over
    x[1:], each output interleaving 2 frames (channel groups are
    frame-slot-major, vae.py:128-130).

Layout: activations are channels-last (B, T, H, W, C) — the TPU-friendly
layout for convolutions; weights are stored as (kt, kh, kw, Cin, Cout).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

WAN_LATENT_MEAN = np.array(
    [-0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
     0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921],
    np.float32,
)
WAN_LATENT_STD = np.array(
    [2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
     3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160],
    np.float32,
)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple = ()
    temporal_downsample: tuple = (False, True, True)

    @property
    def temporal_upsample(self):
        return self.temporal_downsample[::-1]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def conv3d(p, x, *, stride=(1, 1, 1), causal=True, t_pad=None):
    """x: (B,T,H,W,C); weight (kt,kh,kw,Ci,Co); causal = leading time pad."""
    w = p["w"]
    kt, kh, kw = w.shape[:3]
    if t_pad is None:
        t_pad = 2 * (kt // 2) if causal else 0
    pads = [(t_pad, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(x.dtype)


def conv2d(p, x, *, stride=(1, 1), padding="same"):
    """x: (B,H,W,C); weight (kh,kw,Ci,Co)."""
    w = p["w"]
    kh, kw = w.shape[:2]
    if padding == "same":
        pads = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    else:
        pads = padding
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def vae_rms_norm(gamma, x, eps=1e-12):
    """F.normalize over channels * sqrt(C) * gamma (vae.py:45-58)."""
    C = x.shape[-1]
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    y = x.astype(jnp.float32) / jnp.maximum(n, eps) * math.sqrt(C)
    return (y * gamma.astype(jnp.float32)).astype(x.dtype)


def residual_block(p, x):
    h = conv3d(p["shortcut"], x) if "shortcut" in p else x
    y = vae_rms_norm(p["norm1"], x)
    y = conv3d(p["conv1"], jax.nn.silu(y))
    y = vae_rms_norm(p["norm2"], y)
    y = conv3d(p["conv2"], jax.nn.silu(y))
    return y + h


def attention_block(p, x):
    """Single-head spatial self-attention per frame (vae.py:230-267)."""
    B, T, H, W, C = x.shape
    y = vae_rms_norm(p["norm"], x)
    y = y.reshape(B * T, H, W, C)
    qkv = conv2d(p["to_qkv"], y)  # 1x1
    q, k, v = jnp.split(qkv.reshape(B * T, H * W, 3 * C), 3, axis=-1)
    s = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) / math.sqrt(C)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", a, v).reshape(B * T, H, W, C)
    o = conv2d(p["proj"], o)
    return x + o.reshape(B, T, H, W, C)


def spatial_upsample(p, x):
    """nearest 2x + conv2d dim -> dim//2."""
    B, T, H, W, C = x.shape
    y = x.reshape(B * T, H, W, C)
    y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
    y = conv2d(p["conv"], y)
    return y.reshape(B, T, 2 * H, 2 * W, -1)


def spatial_downsample(p, x):
    """ZeroPad2d(right/bottom 1) + conv2d stride 2 (vae.py:100-103)."""
    B, T, H, W, C = x.shape
    y = x.reshape(B * T, H, W, C)
    y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = conv2d(p["conv"], y, stride=(2, 2), padding=[(0, 0), (0, 0)])
    return y.reshape(B, T, (H - 1) // 2 + 1, (W - 1) // 2 + 1, C)


def temporal_downsample(p, x):
    """First frame passes through; stride-2 kernel-3 unpadded causal conv."""
    first = x[:, :1]
    rest = conv3d(p["time_conv"], x, stride=(2, 1, 1), causal=False, t_pad=0)
    return jnp.concatenate([first, rest], axis=1)


def temporal_upsample(p, x):
    """Frame 0 untouched; frames 1.. causal-conv'd (f0 excluded from context)
    and interleaved into 2 output frames each (slot-major channel groups)."""
    B, T, H, W, C = x.shape
    first = x[:, :1]
    if T == 1:
        return x
    y = conv3d(p["time_conv"], x[:, 1:])  # causal pad 2, out 2C
    y = y.reshape(B, T - 1, H, W, 2, C)  # channel groups (2, C), group-major
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * (T - 1), H, W, C)
    return jnp.concatenate([first, y], axis=1)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def encoder_forward(p, cfg: WanVAEConfig, x):
    x = conv3d(p["conv1"], x)
    for i, stage in enumerate(p["down"]):
        for blk in stage["blocks"]:
            x = residual_block(blk, x) if "conv1" in blk else attention_block(blk, x)
        if "resample" in stage:
            x = spatial_downsample(stage["resample"], x)
            if "time_conv" in stage["resample"]:
                x = temporal_downsample(stage["resample"], x)
    for j, blk in enumerate(p["middle"]):
        x = attention_block(blk, x) if j == 1 else residual_block(blk, x)
    x = vae_rms_norm(p["head_norm"], x)
    x = conv3d(p["head_conv"], jax.nn.silu(x))
    return x


def decoder_forward(p, cfg: WanVAEConfig, x):
    x = conv3d(p["conv1"], x)
    for j, blk in enumerate(p["middle"]):
        x = attention_block(blk, x) if j == 1 else residual_block(blk, x)
    for stage in p["up"]:
        for blk in stage["blocks"]:
            x = residual_block(blk, x) if "conv1" in blk else attention_block(blk, x)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                x = temporal_upsample(stage["resample"], x)
            x = spatial_upsample(stage["resample"], x)
    x = vae_rms_norm(p["head_norm"], x)
    x = conv3d(p["head_conv"], jax.nn.silu(x))
    return x


def _latent_scale(cfg):
    if cfg.z_dim == len(WAN_LATENT_MEAN):
        return jnp.asarray(WAN_LATENT_MEAN), jnp.asarray(WAN_LATENT_STD)
    return jnp.zeros((cfg.z_dim,)), jnp.ones((cfg.z_dim,))


def vae_decode(params, cfg: WanVAEConfig, z):
    """z: (B, C=z_dim, T, H, W) normalized latents -> video (B, 3, T', H', W')
    in [-1, 1]. Matches WanVAE.decode (vae.py:584-610,727-731).

    NOTE the reference divides by scale[1] = 1/std, i.e. multiplies by std.
    """
    mean, std = _latent_scale(cfg)
    z = z * std[None, :, None, None, None]
    z = z + mean[None, :, None, None, None]
    x = jnp.transpose(z, (0, 2, 3, 4, 1))  # -> (B,T,H,W,C)
    x = conv3d(params["conv2"], x)  # 1x1x1
    x = decoder_forward(params["decoder"], cfg, x)
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def vae_encode(params, cfg: WanVAEConfig, video):
    """video (B, 3, T, H, W) in [-1,1] -> normalized latent mean (B, z, T', H', W')."""
    x = jnp.transpose(video, (0, 2, 3, 4, 1))
    y = encoder_forward(params["encoder"], cfg, x)
    y = conv3d(params["conv1"], y)  # 1x1x1, 2*z_dim
    mu = y[..., : cfg.z_dim]
    mu = jnp.transpose(mu, (0, 4, 1, 2, 3))
    mean, std = _latent_scale(cfg)
    mu = (mu - mean[None, :, None, None, None]) / std[None, :, None, None, None]
    return mu


# ---------------------------------------------------------------------------
# init (random, for tests; real weights via io/checkpoint)
# ---------------------------------------------------------------------------


def _conv3d_init(rng, kt, kh, kw, ci, co, dtype):
    scale = 1.0 / math.sqrt(kt * kh * kw * ci)
    return {
        "w": (jax.random.normal(rng, (kt, kh, kw, ci, co)) * scale).astype(dtype),
        "b": jnp.zeros((co,), dtype),
    }


def _conv2d_init(rng, kh, kw, ci, co, dtype):
    scale = 1.0 / math.sqrt(kh * kw * ci)
    return {
        "w": (jax.random.normal(rng, (kh, kw, ci, co)) * scale).astype(dtype),
        "b": jnp.zeros((co,), dtype),
    }


def _res_init(rng, ci, co, dtype):
    k = jax.random.split(rng, 3)
    p = {
        "norm1": jnp.ones((ci,), jnp.float32),
        "conv1": _conv3d_init(k[0], 3, 3, 3, ci, co, dtype),
        "norm2": jnp.ones((co,), jnp.float32),
        "conv2": _conv3d_init(k[1], 3, 3, 3, co, co, dtype),
    }
    if ci != co:
        p["shortcut"] = _conv3d_init(k[2], 1, 1, 1, ci, co, dtype)
    return p


def _attn_init(rng, c, dtype):
    k = jax.random.split(rng, 2)
    return {
        "norm": jnp.ones((c,), jnp.float32),
        "to_qkv": _conv2d_init(k[0], 1, 1, c, 3 * c, dtype),
        "proj": {"w": jnp.zeros((1, 1, c, c), dtype), "b": jnp.zeros((c,), dtype)},
    }


def init_wan_vae_params(rng, cfg: WanVAEConfig = WanVAEConfig(), dtype=jnp.float32):
    keys = iter(jax.random.split(rng, 256))
    d = cfg.dim
    dims_e = [d * u for u in (1,) + tuple(cfg.dim_mult)]
    enc = {"conv1": _conv3d_init(next(keys), 3, 3, 3, 3, dims_e[0], dtype), "down": []}
    for i, (ci, co) in enumerate(zip(dims_e[:-1], dims_e[1:])):
        stage = {"blocks": []}
        cin = ci
        for _ in range(cfg.num_res_blocks):
            stage["blocks"].append(_res_init(next(keys), cin, co, dtype))
            cin = co
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {"conv": _conv2d_init(next(keys), 3, 3, co, co, dtype)}
            if cfg.temporal_downsample[i]:
                stage["resample"]["time_conv"] = _conv3d_init(next(keys), 3, 1, 1, co, co, dtype)
        enc["down"].append(stage)
    mid = dims_e[-1]
    enc["middle"] = [
        _res_init(next(keys), mid, mid, dtype),
        _attn_init(next(keys), mid, dtype),
        _res_init(next(keys), mid, mid, dtype),
    ]
    enc["head_norm"] = jnp.ones((mid,), jnp.float32)
    enc["head_conv"] = _conv3d_init(next(keys), 3, 3, 3, mid, 2 * cfg.z_dim, dtype)

    dims_d = [d * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    dec = {"conv1": _conv3d_init(next(keys), 3, 3, 3, cfg.z_dim, dims_d[0], dtype)}
    dec["middle"] = [
        _res_init(next(keys), dims_d[0], dims_d[0], dtype),
        _attn_init(next(keys), dims_d[0], dtype),
        _res_init(next(keys), dims_d[0], dims_d[0], dtype),
    ]
    dec["up"] = []
    for i, (ci, co) in enumerate(zip(dims_d[:-1], dims_d[1:])):
        stage = {"blocks": []}
        cin = ci // 2 if i in (1, 2, 3) else ci  # vae.py:426-428
        for _ in range(cfg.num_res_blocks + 1):
            stage["blocks"].append(_res_init(next(keys), cin, co, dtype))
            cin = co
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {"conv": _conv2d_init(next(keys), 3, 3, co, co // 2, dtype)}
            if cfg.temporal_upsample[i]:
                stage["resample"]["time_conv"] = _conv3d_init(next(keys), 3, 1, 1, co, 2 * co, dtype)
        dec["up"].append(stage)
    dec["head_norm"] = jnp.ones((dims_d[-1],), jnp.float32)
    dec["head_conv"] = _conv3d_init(next(keys), 3, 3, 3, dims_d[-1], 3, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv3d_init(next(keys), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim, dtype),
        "conv2": _conv3d_init(next(keys), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
    }


class _TCache:
    """Per-conv temporal state threaded through a streamed decode.

    The reference WanVAE streams frames through the network in chunks with a
    per-conv feat_cache (vae.py:584-610) — exact, O(1) temporal memory. This
    is its functional analog: caches are pulled/pushed in code traversal
    order (fixed), so the state is a flat list. `None` = stream start
    (zero left-padding, identical to the whole-sequence conv's causal pad).
    """

    def __init__(self, old):
        self.old = old
        self.idx = 0
        self.new = []

    def pull(self):
        c = None if self.old is None else self.old[self.idx]
        self.idx += 1
        return c

    def push(self, c):
        self.new.append(c)


def _conv3d_stream(p, x, tc, *, activation=None):
    """Causal conv3d over a chunk with carried (kt-1)-frame input history."""
    kt = p["w"].shape[0]
    if kt == 1:
        y = conv3d(p, x if activation is None else activation(x), t_pad=0)
        return y
    cache = tc.pull()
    if cache is None:
        # stream start: a zero cache IS the whole-decode causal zero pad.
        # Invariant: the cache is always exactly kt-1 frames (short first
        # chunks stay zero-filled on the left).
        cache = jnp.zeros(x.shape[:1] + (kt - 1,) + x.shape[2:], x.dtype)
    xin = jnp.concatenate([cache, x], axis=1)
    tc.push(xin[:, -(kt - 1):])
    if activation is not None:
        xin = activation(xin)
    return conv3d(p, xin, causal=False, t_pad=0)


def _res_stream(p, x, tc):
    h = conv3d(p["shortcut"], x, t_pad=0) if "shortcut" in p else x
    y = _conv3d_stream(p["conv1"], vae_rms_norm(p["norm1"], x), tc,
                       activation=jax.nn.silu)
    y = _conv3d_stream(p["conv2"], vae_rms_norm(p["norm2"], y), tc,
                       activation=jax.nn.silu)
    return y + h


def _temporal_upsample_stream(p, x, tc, first):
    B, T, H, W, C = x.shape
    head = x[:, :1] if first else x[:, :0]
    rest = x[:, 1:] if first else x
    if rest.shape[1] == 0:
        tc.pull()
        tc.push(None)  # stream has not started; next chunk zero-pads
        return head
    y = _conv3d_stream(p["time_conv"], rest, tc)
    Tr = rest.shape[1]
    y = y.reshape(B, Tr, H, W, 2, C).transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * Tr, H, W, C)
    return jnp.concatenate([head, y], axis=1)


def decoder_forward_stream(p, cfg: WanVAEConfig, x, tstate, first):
    """One chunk through the decoder; returns (pixels, new tstate)."""
    tc = _TCache(tstate)
    x = _conv3d_stream(p["conv1"], x, tc)
    for j, blk in enumerate(p["middle"]):
        x = attention_block(blk, x) if j == 1 else _res_stream(blk, x, tc)
    for stage in p["up"]:
        for blk in stage["blocks"]:
            x = _res_stream(blk, x, tc) if "conv1" in blk else attention_block(blk, x)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                x = _temporal_upsample_stream(stage["resample"], x, tc, first)
            x = spatial_upsample(stage["resample"], x)
    x = _conv3d_stream(p["head_conv"], vae_rms_norm(p["head_norm"], x), tc,
                       activation=jax.nn.silu)
    return x, tc.new


def vae_decode_streamed(params, cfg: WanVAEConfig, z, *, chunk: int = 2):
    """Streamed decode in `chunk`-latent-frame chunks — EXACT (bit-level up
    to conv-splitting float noise) vs vae_decode, with temporal memory bound
    by the chunk instead of the full clip. The reference's own WanVAE.decode
    streams per latent frame with a conv cache (vae.py:584-610); frame-local
    ops (RMSNorm, per-frame spatial attention) carry no state, so only convs
    cache. Composes with spatial tiling for a fully bounded footprint."""
    mean, std = _latent_scale(cfg)
    z = z * std[None, :, None, None, None] + mean[None, :, None, None, None]
    x = jnp.transpose(z, (0, 2, 3, 4, 1))
    x = conv3d(params["conv2"], x)  # 1x1x1, stateless
    T = x.shape[1]

    # one compiled step per distinct (chunk shape, state structure): the
    # first chunk, the steady-state chunk, and possibly a short last chunk
    @functools.partial(jax.jit, static_argnames="first")
    def step(p, xc, st, first):
        y, st = decoder_forward_stream(p, cfg, xc, st, first=first)
        return jnp.clip(y, -1.0, 1.0), st

    outs, tstate = [], None
    for s in range(0, T, chunk):
        y, tstate = step(params["decoder"], x[:, s:s + chunk], tstate, s == 0)
        outs.append(y)
    out = jnp.concatenate(outs, axis=1)
    return jnp.transpose(out, (0, 4, 1, 2, 3))


def vae_decode_tiled(params, cfg: WanVAEConfig, z, *, tile: int = 32, overlap: int = 8):
    """Spatially tiled decode (reference: diffusers enable_tiling; see
    models/common/vae_tiling.py). Bounds peak memory by the tile footprint —
    required for 480p+/81f decode on a 16 GB chip."""
    from sparse_videogen_tpu.models.common.vae_tiling import jit_tiled_decode

    return jit_tiled_decode(vae_decode, params, cfg, z, tile=tile,
                            overlap=overlap, scale=8)
