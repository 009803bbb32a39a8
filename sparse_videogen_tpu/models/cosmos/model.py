"""Cosmos DiT (NVIDIA Cosmos-1.0-Diffusion Text2World, 7B/14B).

Reference: the SVG adapter subclasses diffusers' CosmosTransformer3DModel
(/root/reference/svg/models/cosmos/custom_models.py:60-158 — a verbatim copy
of the diffusers forward extended with per-frame 5-D timesteps) and its
attention processor (/root/reference/svg/models/cosmos/attention.py:30-124:
per-head RMS qk-norm after the head split, rotary with
use_real_unbind_dim=-2 i.e. half-split rotate_half, no GQA).

Block structure (custom_models.py:13-57): three AdaLN-zero norms
(self-attn, cross-attn, FFN), each producing (modulated, gate); the learned
positional embedding is ADDED INSIDE every block (extra_pos_emb, :26-27).

Internals reconstructed from diffusers transformer_cosmos.py (the live
dependency of the reference; not vendored here): sinusoidal timestep ->
linear/silu/linear (bias-free) -> 3*dim global temb + RMS-normed
embedded_timestep; per-norm low-rank AdaLN (dim -> adaln_lora_dim -> k*dim,
bias-free) added to temb; bias-free attention/FFN projections; learnable
T/H/W positional tables RMS-normalized and summed; 3D NTK-scaled RoPE split
[t|h|w] over head_dim with fps-rescaled temporal positions.

Self-attention runs through the package's sparse runtimes (layout: video
only, context_length 0 — SURVEY.md section 2.4).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.models.common import layers as L


@dataclasses.dataclass(frozen=True)
class CosmosConfig:
    in_channels: int = 16
    out_channels: int = 16
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 1024
    adaln_lora_dim: int = 256
    max_size: tuple = (128, 240, 240)
    patch_size: tuple = (1, 2, 2)
    rope_scale: tuple = (2.0, 1.0, 1.0)
    concat_padding_mask: bool = True
    extra_pos_embed_type: str | None = "learnable"
    eps: float = 1e-6

    @property
    def hidden_size(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def patch_in_channels(self):
        return self.in_channels + (1 if self.concat_padding_mask else 0)


COSMOS_7B = CosmosConfig()
COSMOS_14B = CosmosConfig(num_attention_heads=40, num_layers=36, rope_scale=(2.0, 2.0, 2.0))


def _timestep_sinusoid(t, dim):
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def rms_norm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def layer_norm_nw(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def time_embed(p, cfg: CosmosConfig, t):
    """-> (temb (B, 3*dim) f32, embedded_timestep (B, dim) f32)."""
    proj = _timestep_sinusoid(t, cfg.hidden_size)
    h = L.linear(p["t_fc1"], proj)
    temb = L.linear(p["t_fc2"], jax.nn.silu(h))
    embedded = rms_norm(proj, p["norm"], cfg.eps)
    return temb, embedded


def adaln(p, x, embedded, temb, k):
    """CosmosAdaLayerNorm(Zero): low-rank modulation, chunk into k parts.

    Returns (modulated, parts[2] if k == 3 else None)."""
    e = jax.nn.silu(embedded.astype(jnp.float32))
    e = L.linear(p["fc1"], e)
    e = L.linear(p["fc2"], e)
    if temb is not None:
        e = e + temb[..., : e.shape[-1]]
    parts = jnp.split(e, k, axis=-1)
    h = layer_norm_nw(x)
    h = h * (1.0 + parts[1]).astype(h.dtype) + parts[0].astype(h.dtype)
    return h, (parts[2].astype(x.dtype) if k == 3 else None)


def rope_3d(cfg: CosmosConfig, grid, fps=None):
    """3D NTK-scaled rope tables -> (cos, sin) each (S, head_dim) f32.

    head_dim split [t | h | w] with dim_h = dim_w = head_dim // 6 * 2 and
    dim_t the remainder; theta = 10000 * scale ** (dim / (dim - 2)) per axis;
    temporal positions rescaled by base_fps/fps when fps given.
    """
    d = cfg.attention_head_dim
    dim_h = d // 6 * 2
    dim_w = d // 6 * 2
    dim_t = d - dim_h - dim_w
    T, H, W = grid
    st, sh, sw = cfg.rope_scale

    def freqs(n, dim, scale, positions):
        ntk = scale ** (dim / max(dim - 2, 1))
        theta = 10000.0 * ntk
        f = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        return np.outer(positions, f)  # (n, dim/2)

    pos_t = np.arange(T, dtype=np.float64)
    if fps is not None:
        pos_t = pos_t / fps * 24.0  # base_fps 24
    emb_t = freqs(T, dim_t, st, pos_t)[:, None, None, :]
    emb_h = freqs(H, dim_h, sh, np.arange(H, dtype=np.float64))[None, :, None, :]
    emb_w = freqs(W, dim_w, sw, np.arange(W, dtype=np.float64))[None, None, :, :]
    z = np.zeros((T, H, W, 0))
    em = np.concatenate(
        [np.broadcast_to(emb_t, (T, H, W, dim_t // 2)),
         np.broadcast_to(emb_h, (T, H, W, dim_h // 2)),
         np.broadcast_to(emb_w, (T, H, W, dim_w // 2)), z],
        axis=-1,
    ).reshape(T * H * W, d // 2)
    # use_real_unbind_dim=-2 layout: [freqs | freqs] halves
    em2 = np.concatenate([em, em], axis=-1)
    return jnp.asarray(np.cos(em2), jnp.float32), jnp.asarray(np.sin(em2), jnp.float32)


def apply_rope_half(x, cos, sin):
    """x: (B, H, S, D); rotate_half convention (unbind_dim=-2)."""
    D = x.shape[-1]
    x1, x2 = x[..., : D // 2], x[..., D // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, None].astype(jnp.float32)
    s = sin[None, None].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s).astype(x.dtype)


def learnable_pos_emb(p, grid):
    """Summed per-axis tables, RMS-normalized (NVIDIA cosmos convention)."""
    T, H, W = grid
    emb = (
        p["t"][:T, None, None, :]
        + p["h"][None, :H, None, :]
        + p["w"][None, None, :W, :]
    ).reshape(1, T * H * W, -1)
    ef = emb.astype(jnp.float32)
    norm = jnp.sqrt(jnp.mean(ef * ef, axis=-1, keepdims=True) + 1e-6)
    return (ef / norm).astype(emb.dtype)


def _self_attention(p, cfg, x, cos, sin, t, rng, layer_idx, attn, state):
    B, S, d = x.shape
    H, D = cfg.num_attention_heads, cfg.attention_head_dim
    to_heads = lambda y: y.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    q = to_heads(L.linear(p["q"], x))
    k = to_heads(L.linear(p["k"], x))
    v = to_heads(L.linear(p["v"], x))
    q = rms_norm(q, p["norm_q"], cfg.eps)
    k = rms_norm(k, p["norm_k"], cfg.eps)
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)
    o, state = attn(q, k, v, t, rng, layer_idx, state)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, d)
    return L.linear(p["o"], o), state


def _cross_attention(p, cfg, x, context):
    B, S, d = x.shape
    H, D = cfg.num_attention_heads, cfg.attention_head_dim
    to_heads = lambda y: y.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
    q = rms_norm(to_heads(L.linear(p["q"], x)), p["norm_q"], cfg.eps)
    k = rms_norm(to_heads(L.linear(p["k"], context)), p["norm_k"], cfg.eps)
    v = to_heads(L.linear(p["v"], context))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, d)
    return L.linear(p["o"], o)


def _block(p, cfg, x, context, embedded, temb, cos, sin, extra_pos, t, rng, layer_idx, attn, state):
    """CosmosTransformerBlock_Sparse.forward (custom_models.py:13-57)."""
    if extra_pos is not None:
        x = x + extra_pos.astype(x.dtype)
    h, gate = adaln(p["norm1"], x, embedded, temb, 3)
    o, state = _self_attention(p["attn1"], cfg, h, cos, sin, t, rng, layer_idx, attn, state)
    x = x + gate * o
    h, gate = adaln(p["norm2"], x, embedded, temb, 3)
    x = x + gate * _cross_attention(p["attn2"], cfg, h, context)
    h, gate = adaln(p["norm3"], x, embedded, temb, 3)
    ff = L.linear(p["ff2"], jax.nn.gelu(L.linear(p["ff1"], h), approximate=False))
    x = x + gate * ff
    return x, state


def cosmos_forward(
    params,
    cfg: CosmosConfig,
    x,  # (B, C, F, H, W) latents
    t,  # (B,) or (B, 1, F, 1, 1) flow timesteps
    context,  # (B, L, text_embed_dim) T5 states
    *,
    fps: int | None = None,
    padding_mask=None,  # (B, 1, H, W); zeros if None
    attention=None,
    attn_states=None,
    attn_consts=None,
    rng=None,
):
    B, C, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    grid = (F // pt, H // ph, W // pw)
    S = grid[0] * grid[1] * grid[2]
    rng = jax.random.PRNGKey(0) if rng is None else rng

    if cfg.concat_padding_mask:
        if padding_mask is None:
            padding_mask = jnp.zeros((B, 1, H, W), x.dtype)
        pm = jnp.broadcast_to(padding_mask[:, :, None], (B, 1, F, H, W)).astype(x.dtype)
        x = jnp.concatenate([x, pm], axis=1)

    # patchify: (c, pt, ph, pw) per-token features (diffusers CosmosPatchEmbed)
    xp = x.reshape(B, cfg.patch_in_channels, grid[0], pt, grid[1], ph, grid[2], pw)
    xp = xp.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, S, -1)
    hs = L.linear(params["patch_embed"], xp)

    cos, sin = rope_3d(cfg, grid, fps=fps)
    extra_pos = (
        learnable_pos_emb(params["pos_embed"], grid)
        if cfg.extra_pos_embed_type
        else None
    )

    per_frame = t.ndim == 5
    t_flat = t.reshape(-1) if per_frame else t
    temb, embedded = time_embed(params["time_embed"], cfg, t_flat)
    if per_frame:
        expand = lambda e: jnp.broadcast_to(
            e.reshape(B, grid[0], 1, 1, -1), (B, grid[0], grid[1], grid[2], e.shape[-1])
        ).reshape(B, S, -1)
        temb, embedded = expand(temb), expand(embedded)
    else:
        temb, embedded = temb[:, None], embedded[:, None]

    t_attn = t_flat[0] if not per_frame else t.reshape(B, -1)[0, 0]
    if attention is None:
        from sparse_videogen_tpu.core.attention_ref import dense_attention

        attention = lambda q, k, v, tt, r, li, st: (dense_attention(q, k, v), st)
        attn_states = jnp.zeros((cfg.num_layers, 0), jnp.int32)

    def body(carry, xs):
        hs = carry
        bp, st, li = xs
        attn = lambda q, k, v, tt, r, li_, s: attention(q, k, v, tt, r, li_, s, attn_consts) \
            if attn_consts is not None else attention(q, k, v, tt, r, li_, s)
        hs, st = _block(
            bp, cfg, hs, context.astype(hs.dtype), embedded, temb, cos, sin,
            extra_pos, t_attn, jax.random.fold_in(rng, li), li, attn, st,
        )
        return hs, st

    li = jnp.arange(cfg.num_layers)
    hs, attn_states = jax.lax.scan(body, hs, (params["blocks"], attn_states, li))

    h, _ = adaln(params["norm_out"], hs, embedded, temb, 2)
    out = L.linear(params["proj_out"], h)
    # unpatchify with the reference's (p_h, p_w, p_t, c) unflatten order and
    # permute(0,7,1,6,2,4,3,5) (custom_models.py:147-152)
    out = out.reshape(B, grid[0], grid[1], grid[2], ph, pw, pt, cfg.out_channels)
    out = out.transpose(0, 7, 1, 6, 2, 4, 3, 5)
    # return the scanned-through attention states (SAP k-means warm-start
    # carry; dropping them silently re-ran the cold iter_init Lloyd every
    # step — wan/hyvideo/cog already thread them)
    return out.reshape(B, cfg.out_channels, F, H, W), attn_states


# ---------------------------------------------------------------------------
# init (tests / smoke)
# ---------------------------------------------------------------------------


def init_cosmos_params(rng, cfg: CosmosConfig, dtype=jnp.bfloat16):
    keys = iter(L.split_keys(rng, 16))
    h = cfg.hidden_size
    hd = cfg.attention_head_dim
    lin = lambda r, di, do: L.init_linear(r, di, do, bias=False, dtype=dtype)

    def norm_init(r):
        ks = iter(L.split_keys(r, 2))
        return {"fc1": lin(next(ks), h, cfg.adaln_lora_dim), "fc2": lin(next(ks), cfg.adaln_lora_dim, 3 * h)}

    def attn_init(r, kv_dim):
        ks = iter(L.split_keys(r, 4))
        return {
            "q": lin(next(ks), h, h),
            "k": lin(next(ks), kv_dim, h),
            "v": lin(next(ks), kv_dim, h),
            "o": lin(next(ks), h, h),
            "norm_q": jnp.ones((hd,), jnp.float32),
            "norm_k": jnp.ones((hd,), jnp.float32),
        }

    def block_init(r):
        ks = iter(L.split_keys(r, 8))
        mlp = int(h * cfg.mlp_ratio)
        return {
            "norm1": norm_init(next(ks)),
            "attn1": attn_init(next(ks), h),
            "norm2": norm_init(next(ks)),
            "attn2": attn_init(next(ks), cfg.text_embed_dim),
            "norm3": norm_init(next(ks)),
            "ff1": lin(next(ks), h, mlp),
            "ff2": lin(next(ks), mlp, h),
        }

    from sparse_videogen_tpu.io.checkpoint import _stack

    pvol = cfg.patch_in_channels * int(np.prod(cfg.patch_size))
    mt, mh, mw = (s // p for s, p in zip(cfg.max_size, cfg.patch_size))
    params = {
        "patch_embed": lin(next(keys), pvol, h),
        "time_embed": {
            "t_fc1": L.init_linear(next(keys), h, h, bias=False, dtype=jnp.float32),
            "t_fc2": L.init_linear(next(keys), h, 3 * h, bias=False, dtype=jnp.float32),
            "norm": jnp.ones((h,), jnp.float32),
        },
        "blocks": _stack([block_init(next(keys)) for _ in range(cfg.num_layers)]),
        "norm_out": {
            "fc1": lin(next(keys), h, cfg.adaln_lora_dim),
            "fc2": lin(next(keys), cfg.adaln_lora_dim, 2 * h),
        },
        "proj_out": L.init_linear(next(keys), h, int(np.prod(cfg.patch_size)) * cfg.out_channels, bias=True, dtype=dtype),
    }
    if cfg.extra_pos_embed_type:
        ks = iter(L.split_keys(next(keys), 3))
        params["pos_embed"] = {
            "t": jax.random.normal(next(ks), (mt, h), dtype) * 0.02,
            "h": jax.random.normal(next(ks), (mh, h), dtype) * 0.02,
            "w": jax.random.normal(next(ks), (mw, h), dtype) * 0.02,
        }
    return params
