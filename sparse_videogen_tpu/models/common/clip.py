"""CLIP-L/14 text encoder (pooled output).

HunyuanVideo's secondary text encoder: HF CLIPTextModel "clipL" with
output_key="pooler_output" — a (B, 768) global text feature
(reference hyvideo_orig/text_encoder/__init__.py:129-135, config
--text-encoder-2 clipL, --text-len-2 77).

Architecture (HF CLIPTextTransformer): learned position embeddings, pre-LN
blocks, quick_gelu MLP, causal mask, final LayerNorm; pooled output = final
hidden state at each sequence's ARGMAX token id (the eot token, id 49407).

Wan I2V reuses this file's vision tower counterpart via models/wan/clip.py
(XLM-R CLIP); here only the text side needed by hyvideo is implemented.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    dim: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    eps: float = 1e-5


CLIP_L_TEXT = CLIPTextConfig()


def layer_norm(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def _block(p, cfg: CLIPTextConfig, x, bias):
    B, Lq, _ = x.shape
    H = cfg.num_heads
    hd = cfg.dim // H
    h = layer_norm(p["ln1"], x, cfg.eps)
    q = L.linear(p["q"], h).reshape(B, Lq, H, hd)
    k = L.linear(p["k"], h).reshape(B, Lq, H, hd)
    v = L.linear(p["v"], h).reshape(B, Lq, H, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * (hd**-0.5) + bias
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a.astype(v.dtype), v).reshape(B, Lq, cfg.dim)
    x = x + L.linear(p["o"], o)
    h = layer_norm(p["ln2"], x, cfg.eps)
    x = x + L.linear(p["fc2"], quick_gelu(L.linear(p["fc1"], h)))
    return x


def clip_text_encode(params, cfg: CLIPTextConfig, ids, mask=None):
    """ids: (B, L) -> (last_hidden (B, L, dim), pooled (B, dim))."""
    B, Lq = ids.shape
    x = params["token_embedding"][ids] + params["position_embedding"][None, :Lq]
    causal = jnp.tril(jnp.ones((Lq, Lq), bool))[None, None]
    if mask is not None:
        causal = causal & (mask[:, None, None, :] != 0)
    bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)

    def body(x, bp):
        return _block(bp, cfg, x, bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["final_ln"], x, cfg.eps)
    eot = jnp.argmax(ids, axis=-1)  # highest id = eot token (HF CLIP pooling)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return x, pooled


def init_clip_text_params(rng, cfg: CLIPTextConfig, dtype=jnp.float32):
    keys = iter(L.split_keys(rng, 3 + cfg.num_layers))
    ln = lambda: {"w": jnp.ones((cfg.dim,), jnp.float32), "b": jnp.zeros((cfg.dim,), jnp.float32)}

    def block_init(r):
        ks = iter(L.split_keys(r, 6))
        return {
            "ln1": ln(),
            "q": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "k": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "v": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "o": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "ln2": ln(),
            "fc1": L.init_linear(next(ks), cfg.dim, cfg.ffn_dim, dtype=dtype),
            "fc2": L.init_linear(next(ks), cfg.ffn_dim, cfg.dim, dtype=dtype),
        }

    from sparse_videogen_tpu.io.checkpoint import _stack

    return {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, cfg.dim), dtype) * 0.02,
        "position_embedding": jax.random.normal(next(keys), (cfg.max_positions, cfg.dim), dtype) * 0.01,
        "blocks": _stack([block_init(next(keys)) for _ in range(cfg.num_layers)]),
        "final_ln": ln(),
    }


# ---------------------------------------------------------------------------
# CLIP vision tower (ViT-H/14) — the Wan I2V image encoder.
#
# The live reference path loads HF CLIPVisionModel from the Wan I2V repo's
# image_encoder/ and feeds the PENULTIMATE hidden states (257, 1280) to the
# DiT's img_emb MLPProj (wan_i2v_inference.py:78, diffusers
# WanImageToVideoPipeline.encode_image hidden_states[-2]). The wan_orig
# vendored equivalent is VisionTransformer(use_31_block=True)
# (wan_orig/modules/clip.py:215-316,549-556) — same computation.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    ffn_dim: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    eps: float = 1e-5
    hidden_act: str = "gelu"  # ViT-H/14 ("gelu"); ViT-L uses "quick_gelu"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


CLIP_VIT_H_14 = CLIPVisionConfig()

# OpenCLIP normalization (wan_orig/modules/clip.py _clip transforms)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(img, size: int = 224):
    """(B, 3, H, W) in [-1, 1] -> bicubic-resized, CLIP-normalized.

    Mirrors CLIPModel.visual preprocessing (clip.py:549-553): squash-resize
    to size x size, map to [0, 1], normalize."""
    B = img.shape[0]
    x = (img.astype(jnp.float32) + 1.0) * 0.5
    x = jax.image.resize(x, (B, 3, size, size), method="cubic")
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)[:, None, None]
    std = jnp.asarray(CLIP_STD, jnp.float32)[:, None, None]
    return (x - mean) / std


def _act(name, x):
    return quick_gelu(x) if name == "quick_gelu" else jax.nn.gelu(x, approximate=False)


def _vision_block(p, cfg: CLIPVisionConfig, x):
    B, S, _ = x.shape
    H = cfg.num_heads
    hd = cfg.dim // H
    h = layer_norm(p["ln1"], x, cfg.eps)
    q = L.linear(p["q"], h).reshape(B, S, H, hd)
    k = L.linear(p["k"], h).reshape(B, S, H, hd)
    v = L.linear(p["v"], h).reshape(B, S, H, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    a = jax.nn.softmax(s * (hd**-0.5), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a.astype(v.dtype), v).reshape(B, S, cfg.dim)
    x = x + L.linear(p["o"], o)
    h = layer_norm(p["ln2"], x, cfg.eps)
    x = x + L.linear(p["fc2"], _act(cfg.hidden_act, L.linear(p["fc1"], h)))
    return x


def clip_vision_forward(params, cfg: CLIPVisionConfig, pixels, *, penultimate=True):
    """pixels: (B, 3, image_size, image_size), CLIP-normalized.

    Returns (B, 1 + grid^2, dim): penultimate hidden states (the I2V
    clip_fea) by default; the final-layer hidden states otherwise (like HF
    last_hidden_state, which is NOT post-layernormed — post_ln applies only
    to the pooled CLS in HF CLIP, and wan_orig's forward never applies it)."""
    B = pixels.shape[0]
    ps, g = cfg.patch_size, cfg.grid
    xp = pixels.reshape(B, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
    xp = xp.reshape(B, g * g, 3 * ps * ps)
    x = L.linear(params["patch_proj"], xp)
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][None].astype(x.dtype)
    x = layer_norm(params["pre_ln"], x, cfg.eps)

    n = cfg.num_layers - 1 if penultimate else cfg.num_layers
    blocks = jax.tree.map(lambda a: a[:n], params["blocks"])

    def body(x, bp):
        return _vision_block(bp, cfg, x), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def init_clip_vision_params(rng, cfg: CLIPVisionConfig, dtype=jnp.float32):
    keys = iter(L.split_keys(rng, 4 + cfg.num_layers))
    ln = lambda: {"w": jnp.ones((cfg.dim,), jnp.float32), "b": jnp.zeros((cfg.dim,), jnp.float32)}

    def block_init(r):
        ks = iter(L.split_keys(r, 6))
        return {
            "ln1": ln(),
            "q": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "k": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "v": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "o": L.init_linear(next(ks), cfg.dim, cfg.dim, dtype=dtype),
            "ln2": ln(),
            "fc1": L.init_linear(next(ks), cfg.dim, cfg.ffn_dim, dtype=dtype),
            "fc2": L.init_linear(next(ks), cfg.ffn_dim, cfg.dim, dtype=dtype),
        }

    from sparse_videogen_tpu.io.checkpoint import _stack

    return {
        "patch_proj": {"w": jax.random.normal(next(keys), (3 * cfg.patch_size**2, cfg.dim), dtype) * 0.02},
        "cls": jax.random.normal(next(keys), (1, cfg.dim), dtype) * 0.02,
        "pos": jax.random.normal(next(keys), (1 + cfg.grid**2, cfg.dim), dtype) * 0.01,
        "pre_ln": ln(),
        "blocks": _stack([block_init(next(keys)) for _ in range(cfg.num_layers)]),
        "post_ln": ln(),
    }
