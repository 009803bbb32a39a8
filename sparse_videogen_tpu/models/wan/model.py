"""Wan 2.1 DiT, functional JAX implementation.

Architecture & numerics follow WanModel
(/root/reference/svg/models/wan_orig/modules/model.py:339-540; the diffusers
WanTransformer3DModel is the same computation):
  - Conv3d patch embedding with kernel == stride (implemented as
    patch-extract + matmul: MXU-friendly, identical result)
  - f32 sinusoidal time embedding -> MLP -> 6-way AdaLN projection
  - text embedding MLP (GELU tanh), optional CLIP image MLPProj (I2V)
  - blocks: f32 LayerNorm + AdaLN modulate -> self-attn (qk RMSNorm, 3D
    interleaved RoPE) -> cross-attn to text (I2V: extra image-token branch)
    -> GELU-tanh FFN, gates in f32 (model.py:243-294)
  - head: f32 LN + 2-way modulation -> linear -> unpatchify

TPU design: all transformer blocks run through one lax.scan over stacked
block params (one compiled block body for N layers); self-attention is an
injected runtime (sparse/runtimes.py) whose per-layer state (SAP k-means
carry) flows through the scan as xs/ys.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common import layers as L
from sparse_videogen_tpu.models.common.rope import apply_rope_interleaved, wan_rope_cos_sin


@dataclasses.dataclass(frozen=True)
class WanConfig:
    model_type: str = "t2v"  # "t2v" | "i2v"
    patch_size: tuple = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: int = 1280  # CLIP features for I2V

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


WAN_1_3B = WanConfig()
WAN_14B = WanConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_block(rng, cfg: WanConfig, dtype):
    k = iter(L.split_keys(rng, 16))
    d = cfg.dim
    p = {
        "modulation": (jax.random.normal(next(k), (6, d)) / math.sqrt(d)).astype(jnp.float32),
        "self_attn": {
            "q": L.init_linear(next(k), d, d, dtype=dtype),
            "k": L.init_linear(next(k), d, d, dtype=dtype),
            "v": L.init_linear(next(k), d, d, dtype=dtype),
            "o": L.init_linear(next(k), d, d, dtype=dtype),
            "norm_q": jnp.ones((d,), jnp.float32),
            "norm_k": jnp.ones((d,), jnp.float32),
        },
        "cross_attn": {
            "q": L.init_linear(next(k), d, d, dtype=dtype),
            "k": L.init_linear(next(k), d, d, dtype=dtype),
            "v": L.init_linear(next(k), d, d, dtype=dtype),
            "o": L.init_linear(next(k), d, d, dtype=dtype),
            "norm_q": jnp.ones((d,), jnp.float32),
            "norm_k": jnp.ones((d,), jnp.float32),
        },
        "norm3": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        "ffn": {
            "fc1": L.init_linear(next(k), d, cfg.ffn_dim, dtype=dtype),
            "fc2": L.init_linear(next(k), cfg.ffn_dim, d, dtype=dtype),
        },
    }
    if cfg.model_type == "i2v":
        p["cross_attn"]["k_img"] = L.init_linear(next(k), d, d, dtype=dtype)
        p["cross_attn"]["v_img"] = L.init_linear(next(k), d, d, dtype=dtype)
        p["cross_attn"]["norm_k_img"] = jnp.ones((d,), jnp.float32)
    return p


def init_wan_params(rng, cfg: WanConfig, dtype=jnp.bfloat16):
    keys = L.split_keys(rng, 12)
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_dim * pt * ph * pw
    params = {
        "patch_embedding": L.init_linear(keys[0], patch_in, d, dtype=dtype),
        "text_embedding": {
            "fc1": L.init_linear(keys[1], cfg.text_dim, d, dtype=dtype),
            "fc2": L.init_linear(keys[2], d, d, dtype=dtype),
        },
        "time_embedding": {
            "fc1": L.init_linear(keys[3], cfg.freq_dim, d, dtype=jnp.float32),
            "fc2": L.init_linear(keys[4], d, d, dtype=jnp.float32),
        },
        "time_projection": L.init_linear(keys[5], d, 6 * d, dtype=jnp.float32),
        "head": {
            "modulation": (jax.random.normal(keys[6], (2, d)) / math.sqrt(d)).astype(jnp.float32),
            "out": L.init_linear(keys[7], d, math.prod(cfg.patch_size) * cfg.out_dim, dtype=dtype),
        },
        "blocks": jax.vmap(lambda r: _init_block(r, cfg, dtype))(
            jnp.stack(L.split_keys(keys[8], cfg.num_layers))
        ),
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm1": {"w": jnp.ones((cfg.image_dim,), jnp.float32), "b": jnp.zeros((cfg.image_dim,), jnp.float32)},
            "fc1": L.init_linear(keys[9], cfg.image_dim, d, dtype=dtype),
            "fc2": L.init_linear(keys[10], d, d, dtype=dtype),
            "norm2": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def sinusoidal_embedding_1d(dim: int, position):
    """model.py:15-23 (f32 instead of f64)."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sin = pos[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sin), jnp.sin(sin)], axis=1)


def _patchify(params, cfg: WanConfig, x):
    """x: (B, C, F, H, W) -> tokens (B, S, dim); kernel==stride conv as matmul."""
    B, C, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    Fp, Hp, Wp = F // pt, H // ph, W // pw
    x = x.reshape(B, C, Fp, pt, Hp, ph, Wp, pw)
    # conv3d weight layout (out, in, kt, kh, kw) -> flat (in*kt*kh*kw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, Fp * Hp * Wp, C * pt * ph * pw)
    return L.linear(params["patch_embedding"], x)


def _unpatchify(x, cfg: WanConfig, grid):
    Fp, Hp, Wp = grid
    B = x.shape[0]
    pt, ph, pw = cfg.patch_size
    c = cfg.out_dim
    x = x.reshape(B, Fp, Hp, Wp, pt, ph, pw, c)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(B, c, Fp * pt, Hp * ph, Wp * pw)


def _qk_norm_heads(x, w, n_heads, eps):
    return L.rms_norm(x, w, eps)


def _self_attention(p, cfg, x, cos, sin, t, rng, layer_idx, attn, state):
    B, S, d = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    q = L.rms_norm(L.linear(p["q"], x), p["norm_q"], cfg.eps)
    k = L.rms_norm(L.linear(p["k"], x), p["norm_k"], cfg.eps)
    v = L.linear(p["v"], x)
    q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    o, state = attn(q, k, v, t, rng, layer_idx, state)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, d)
    return L.linear(p["o"], o), state


def _cross_attention_dense(q, k, v):
    """Plain attention over the (short, padded) text context — matches the
    diffusers path, which runs SDPA without a padding mask
    (svg/models/wan/attention.py:198-201)."""
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _cross_attention(p, cfg, x, context, context_img):
    B, S, d = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    to_heads = lambda y: y.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
    q = to_heads(L.rms_norm(L.linear(p["q"], x), p["norm_q"], cfg.eps))
    k = to_heads(L.rms_norm(L.linear(p["k"], context), p["norm_k"], cfg.eps))
    v = to_heads(L.linear(p["v"], context))
    o = _cross_attention_dense(q, k, v)
    if context_img is not None:
        k_img = to_heads(L.rms_norm(L.linear(p["k_img"], context_img), p["norm_k_img"], cfg.eps))
        v_img = to_heads(L.linear(p["v_img"], context_img))
        o = o + _cross_attention_dense(q, k_img, v_img)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, d)
    return L.linear(p["o"], o)


def _block(p, cfg, x, e6, cos, sin, t, rng, layer_idx, context, context_img, attn, state):
    """WanAttentionBlock.forward (model.py:243-294). x bf16; e6 (B,6,dim) f32."""
    e = p["modulation"][None].astype(jnp.float32) + e6  # (B, 6, d)

    y = L.layer_norm_f32(x, cfg.eps)  # f32
    y = (y * (1 + e[:, 1:2]) + e[:, 0:1]).astype(x.dtype)
    y, state = _self_attention(p["self_attn"], cfg, y, cos, sin, t, rng, layer_idx, attn, state)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e[:, 2:3]).astype(x.dtype)

    y = L.layer_norm_f32(x, cfg.eps, p["norm3"]["w"], p["norm3"]["b"]).astype(x.dtype)
    x = x + _cross_attention(p["cross_attn"], cfg, y, context, context_img)

    y = L.layer_norm_f32(x, cfg.eps)
    y = (y * (1 + e[:, 4:5]) + e[:, 3:4]).astype(x.dtype)
    y = L.mlp_gelu(p["ffn"], y)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e[:, 5:6]).astype(x.dtype)
    return x, state


def wan_forward(
    params,
    cfg: WanConfig,
    x,  # (B, C, F, H, W) latents
    t,  # (B,) timesteps in [0, 1000]
    context,  # (B, text_len, text_dim) text-encoder states (padded)
    *,
    clip_fea=None,  # (B, 257, image_dim) CLIP features (I2V)
    attention,  # sparse/runtimes.py runtime
    attn_states=None,  # stacked per-layer state (or None -> fresh)
    attn_consts=None,  # runtime.consts() — pass explicitly from inside jit
    rng=None,
):
    """Returns (noise_pred (B, out_dim, F, H, W), new_attn_states)."""
    B, C, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    grid = (F // pt, H // ph, W // pw)
    S = math.prod(grid)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    tokens = _patchify(params, cfg, x)  # (B, S, d)

    # time embeddings, f32 (model.py:499-503)
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = L.linear(params["time_embedding"]["fc2"], L.silu(L.linear(params["time_embedding"]["fc1"], e)))
    e6 = L.linear(params["time_projection"], L.silu(e)).reshape(B, 6, cfg.dim)

    # context (model.py:507)
    ctx = L.mlp_gelu(params["text_embedding"], context.astype(tokens.dtype))
    ctx_img = None
    if clip_fea is not None:
        pe = params["img_emb"]
        y = L.layer_norm_f32(clip_fea, 1e-5, pe["norm1"]["w"], pe["norm1"]["b"]).astype(tokens.dtype)
        y = L.linear(pe["fc2"], L.gelu_tanh(L.linear(pe["fc1"], y)))
        ctx_img = L.layer_norm_f32(y, 1e-5, pe["norm2"]["w"], pe["norm2"]["b"]).astype(tokens.dtype)

    cos_np, sin_np = wan_rope_cos_sin(*grid, cfg.head_dim)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    if attn_states is None:
        attn_states = attention.init_state(B * cfg.num_heads, cfg.head_dim, cfg.num_layers)
    if attn_consts is None:
        attn_consts = attention.consts()

    t0 = t[0]
    attn = lambda q, k, v, tt, r, li, st: attention(q, k, v, tt, r, li, st, attn_consts)

    def body(carry, xs):
        tok = carry
        block_params, state, layer_idx = xs
        krng = jax.random.fold_in(rng, layer_idx)
        tok, state = _block(
            block_params, cfg, tok, e6, cos, sin, t0, krng, layer_idx, ctx, ctx_img, attn, state
        )
        return tok, state

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    tokens, new_states = jax.lax.scan(body, tokens, (params["blocks"], attn_states, layer_ids))

    # head (model.py:297-324)
    hm = params["head"]["modulation"][None].astype(jnp.float32) + e[:, None, :]
    y = L.layer_norm_f32(tokens, cfg.eps)
    y = (y * (1 + hm[:, 1:2]) + hm[:, 0:1]).astype(tokens.dtype)
    out = L.linear(params["head"]["out"], y)
    return _unpatchify(out, cfg, grid).astype(jnp.float32), new_states
