"""CogVideoX 1.5 DiT, functional JAX.

Block/model wiring from the reference's vendored forwards
(/root/reference/svg/models/cog/custom_models.py:36-165): joint [text; video]
sequence (text FIRST, 226 tokens), CogVideoXLayerNormZero producing
(norm_x, norm_text, gate, text_gate) per sub-layer, joint attention with
per-head LayerNorm qk-norm and rotary applied to video tokens only
(custom_models.py:151-158), shared FFN over the concatenated sequence, final
norm over the concatenated sequence (use_rotary_positional_embeddings=True
path), AdaLN out + unpatchify with temporal patching (p_t=2, v1.5).

Norm-internal details (CogVideoXLayerNormZero / AdaLayerNorm / patch embed /
Timesteps(inner_dim, flip_sin_to_cos=True, freq_shift=0) / the v1.5 ofs
embedding) follow the diffusers implementations these classes subclass —
the reference forward (custom_models.py:70-165) calls them unchanged.
tests/test_cog_model.py validates numerics against an independent torch
mirror of those published formulas; io/checkpoint.convert_cog_dit maps the
diffusers state dict.

The reference supports SVG1 only for this model (cog_inference.py choices
SVG/dense); same here.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common import layers as L
from sparse_videogen_tpu.models.common.rope import apply_rope_interleaved, nd_rope_cos_sin


@dataclasses.dataclass(frozen=True)
class CogConfig:
    num_layers: int = 42
    hidden_size: int = 3072
    heads_num: int = 48
    head_dim: int = 64
    text_len: int = 226
    text_dim: int = 4096  # T5-xxl
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    patch_size_t: int = 2
    time_embed_dim: int = 512
    ofs_embed: bool = False  # v1.5 I2V: extra Timesteps(ofs) conditioning
    ffn_mult: int = 4
    eps: float = 1e-5

    @property
    def rope_dims(self):
        d = self.head_dim
        return (d // 4, 3 * d // 8, 3 * d // 8)  # (16, 24, 24) for d=64


COG_5B = CogConfig()
# CogVideoX1.5-5B-I2V (the reference's cog_inference.py model): image latents
# concatenated channel-wise (16 noise + 16 image), ofs conditioning.
COG_1_5_5B_I2V = CogConfig(in_channels=32, ofs_embed=True)


def _ln(x, eps, w=None, b=None):
    return L.layer_norm_f32(x, eps, w, b)


def _norm_zero(p, cfg, x, enc, temb):
    """CogVideoXLayerNormZero: silu(temb) -> 6 chunks; affine LN."""
    c = L.linear(p["lin"], jax.nn.silu(temb))
    shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(c, 6, axis=-1)
    nx = _ln(x, cfg.eps, p["norm"]["w"], p["norm"]["b"])
    ne = _ln(enc, cfg.eps, p["norm"]["w"], p["norm"]["b"])
    nx = (nx * (1 + scale[:, None]) + shift[:, None]).astype(x.dtype)
    ne = (ne * (1 + e_scale[:, None]) + e_shift[:, None]).astype(enc.dtype)
    return nx, ne, gate[:, None], e_gate[:, None]


def _attention(p, cfg, nx, ne, cos, sin, t, rng, layer_idx, attn, state):
    """Joint attention over [text; video] (attention.py:74-124)."""
    B = nx.shape[0]
    H, D = cfg.heads_num, cfg.head_dim
    x = jnp.concatenate([ne, nx], axis=1)  # text FIRST
    to_heads = lambda y: y.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
    q = to_heads(L.linear(p["q"], x))
    k = to_heads(L.linear(p["k"], x))
    v = to_heads(L.linear(p["v"], x))
    # per-head LayerNorm qk-norm (v1.5)
    q = _ln(q, cfg.eps, p["norm_q"]["w"], p["norm_q"]["b"]).astype(x.dtype)
    k = _ln(k, cfg.eps, p["norm_k"]["w"], p["norm_k"]["b"]).astype(x.dtype)
    tl = ne.shape[1]
    q = jnp.concatenate([q[:, :, :tl], apply_rope_interleaved(q[:, :, tl:], cos, sin)], axis=2)
    k = jnp.concatenate([k[:, :, :tl], apply_rope_interleaved(k[:, :, tl:], cos, sin)], axis=2)
    o, state = attn(q, k, v, t, rng, layer_idx, state)
    o = o.transpose(0, 2, 1, 3).reshape(B, -1, H * D)
    o = L.linear(p["o"], o)
    return o[:, tl:], o[:, :tl], state


def _block(p, cfg, x, enc, temb, cos, sin, t, rng, layer_idx, attn, state):
    # gates/modulations computed in f32; residual adds cast back to the
    # carry dtype (bf16 end to end, matching the reference's autocast)
    nx, ne, g, eg = _norm_zero(p["norm1"], cfg, x, enc, temb)
    ax, ae, state = _attention(p["attn"], cfg, nx, ne, cos, sin, t, rng, layer_idx, attn, state)
    x = (x + g * ax).astype(x.dtype)
    enc = (enc + eg * ae).astype(enc.dtype)
    nx, ne, g, eg = _norm_zero(p["norm2"], cfg, x, enc, temb)
    ff = L.mlp_gelu(p["ffn"], jnp.concatenate([ne, nx], axis=1))
    tl = enc.shape[1]
    x = (x + g * ff[:, tl:]).astype(x.dtype)
    enc = (enc + eg * ff[:, :tl]).astype(enc.dtype)
    return x, enc, state


def cog_forward(
    params,
    cfg: CogConfig,
    x,  # (B, C, F, H, W) latents (channel-first; F = latent frames)
    t,  # (B,)
    encoder_hidden_states,  # (B, text_len, text_dim) T5 states
    *,
    ofs=None,  # (B,) v1.5 I2V ofs values (pipeline passes 2.0)
    attention,
    attn_states=None,
    attn_consts=None,
    rng=None,
):
    B, C, F, H, W = x.shape
    p, pt = cfg.patch_size, cfg.patch_size_t
    grid = (F // pt, H // p, W // p)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    # time embedding: Timesteps(inner_dim, flip_sin_to_cos=True, shift=0)
    # -> TimestepEmbedding MLP (diffusers cogvideox_transformer_3d.__init__;
    # hyvideo's cos-first sinusoid is the same formula)
    from sparse_videogen_tpu.models.hyvideo.model import timestep_embedding

    temb = timestep_embedding(t, cfg.hidden_size)
    temb = L.linear(params["time_emb"]["fc2"], jax.nn.silu(L.linear(params["time_emb"]["fc1"], temb)))
    if cfg.ofs_embed:
        ofs = jnp.full(t.shape, 2.0, jnp.float32) if ofs is None else ofs
        oemb = timestep_embedding(ofs, cfg.time_embed_dim)
        oemb = L.linear(params["ofs_emb"]["fc2"], jax.nn.silu(L.linear(params["ofs_emb"]["fc1"], oemb)))
        temb = temb + oemb

    # patch embed: per (p_t, p, p) block -> linear; text projected and concat
    xt = x.reshape(B, C, grid[0], pt, grid[1], p, grid[2], p)
    tok = xt.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, -1, C * pt * p * p)
    tok = L.linear(params["patch_proj"], tok)
    enc = L.linear(params["text_proj"], encoder_hidden_states.astype(tok.dtype))

    cos_np, sin_np = nd_rope_cos_sin(grid, cfg.rope_dims)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    if attn_states is None:
        attn_states = attention.init_state(B * cfg.heads_num, cfg.head_dim, cfg.num_layers)
    if attn_consts is None:
        attn_consts = attention.consts()
    attn = lambda q, k, v, tt_, r, li, st: attention(q, k, v, tt_, r, li, st, attn_consts)
    t0 = t[0]

    def body(carry, xs):
        tok, enc = carry
        bp, st, li = xs
        krng = jax.random.fold_in(rng, li)
        tok, enc, st = _block(bp, cfg, tok, enc, temb, cos, sin, t0, krng, li, attn, st)
        return (tok, enc), st

    ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (tok, enc), new_states = jax.lax.scan(body, (tok, enc), (params["blocks"], attn_states, ids))

    # final norm over concat, then AdaLN out (custom_models.py:142-152)
    tl = enc.shape[1]
    full = jnp.concatenate([enc, tok], axis=1)
    full = _ln(full, cfg.eps, params["norm_final"]["w"], params["norm_final"]["b"]).astype(tok.dtype)
    tok = full[:, tl:]
    c = L.linear(params["norm_out_lin"], jax.nn.silu(temb))
    shift, scale = jnp.split(c, 2, axis=-1)
    tok = _ln(tok, cfg.eps, params["norm_out"]["w"], params["norm_out"]["b"]).astype(tok.dtype)
    tok = tok * (1 + scale[:, None]) + shift[:, None]
    tok = L.linear(params["proj_out"], tok)

    # unpatchify (custom_models.py:159-162, p_t path)
    co = cfg.out_channels
    out = tok.reshape(B, grid[0], grid[1], grid[2], co, pt, p, p)
    out = out.transpose(0, 1, 5, 4, 2, 6, 3, 7)  # n t pt c h p w p
    out = out.reshape(B, grid[0] * pt, co, H, W)  # frames-first, as the
    # reference returns (custom_models.py:160-162)
    return out.astype(jnp.float32), new_states


def init_cog_params(rng, cfg: CogConfig, dtype=jnp.bfloat16):
    keys = iter(L.split_keys(rng, 16))
    h = cfg.hidden_size
    lin = lambda di, do: L.init_linear(next(keys), di, do, dtype=dtype)
    ln_p = lambda d: {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}

    def block(r):
        ks = iter(L.split_keys(r, 8))
        li = lambda di, do: L.init_linear(next(ks), di, do, dtype=dtype)
        return {
            "norm1": {"lin": li(cfg.time_embed_dim, 6 * h), "norm": ln_p(h)},
            "attn": {
                "q": li(h, h), "k": li(h, h), "v": li(h, h), "o": li(h, h),
                "norm_q": ln_p(cfg.head_dim), "norm_k": ln_p(cfg.head_dim),
            },
            "norm2": {"lin": li(cfg.time_embed_dim, 6 * h), "norm": ln_p(h)},
            "ffn": {"fc1": li(h, cfg.ffn_mult * h), "fc2": li(cfg.ffn_mult * h, h)},
        }

    out = {
        "time_emb": {"fc1": lin(h, cfg.time_embed_dim), "fc2": lin(cfg.time_embed_dim, cfg.time_embed_dim)},
        "patch_proj": lin(cfg.in_channels * cfg.patch_size_t * cfg.patch_size**2, h),
        "text_proj": lin(cfg.text_dim, h),
        "blocks": jax.vmap(block)(jnp.stack(L.split_keys(next(keys), cfg.num_layers))),
        "norm_final": ln_p(h),
        "norm_out": ln_p(h),
        "norm_out_lin": lin(cfg.time_embed_dim, 2 * h),
        "proj_out": lin(h, cfg.patch_size_t * cfg.patch_size**2 * cfg.out_channels),
    }
    if cfg.ofs_embed:
        out["ofs_emb"] = {
            "fc1": lin(cfg.time_embed_dim, cfg.time_embed_dim),
            "fc2": lin(cfg.time_embed_dim, cfg.time_embed_dim),
        }
    return out
