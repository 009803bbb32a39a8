"""UMT5 encoder (functional JAX) — Wan 2.1's text encoder.

Re-derivation of the reference encoder (wan_orig/modules/t5.py:45-296,
umt5_xxl config :452-466): pre-norm T5 blocks, per-layer bidirectional
relative position bias (shared_pos=False — the UMT5 difference from T5),
gated tanh-GELU feed-forward, no attention scaling, f32 softmax and RMS
layer norms.

TPU design: blocks run under one lax.scan over stacked params; the relative
position bucket table depends only on sequence length and is computed in
numpy at trace time.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.models.common import layers as L


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    eps: float = 1e-6
    # architecture variants: UMT5 (Wan) = gated-GELU FFN + per-layer relative
    # bias; T5 v1.0 (t5-11b, the Cosmos text encoder) = ReLU FFN + bias shared
    # from the first layer (HF T5: has_relative_attention_bias on block 0).
    gated_ffn: bool = True
    shared_rel_bias: bool = False
    ffn_act: str = "gelu_tanh"  # "gelu_tanh" | "relu"


UMT5_XXL = T5Config()
T5_11B = T5Config(
    vocab_size=32128, dim=1024, dim_attn=16384, dim_ffn=65536, num_heads=128,
    num_layers=24, gated_ffn=False, shared_rel_bias=True, ffn_act="relu",
)


def t5_layer_norm(x, w, eps=1e-6):
    """RMS norm without mean subtraction (t5.py:51-63), f32 accumulation."""
    xf = x.astype(jnp.float32)
    n = x * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps).astype(x.dtype)
    return n * w.astype(x.dtype)


def gelu_tanh_exact(x):
    """The reference's handwritten tanh GELU (t5.py:45-48)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return y.astype(x.dtype)


def relative_position_buckets(seq_len: int, num_buckets: int, max_dist: int) -> np.ndarray:
    """Bidirectional bucket ids (t5.py:234-250), numpy, (L, L) int32."""
    rel_pos = np.arange(seq_len)[None, :] - np.arange(seq_len)[:, None]
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(rel_pos / max_exact + 1e-20) / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets.astype(np.int32)


def _block(p, cfg: T5Config, x, bias, mask_bias):
    B, Lq, _ = x.shape
    H, Dh = cfg.num_heads, cfg.dim_attn // cfg.num_heads
    # self-attention (pre-norm)
    y = t5_layer_norm(x, p["norm1"], cfg.eps)
    q = L.linear(p["q"], y).reshape(B, Lq, H, Dh)
    k = L.linear(p["k"], y).reshape(B, Lq, H, Dh)
    v = L.linear(p["v"], y).reshape(B, Lq, H, Dh)
    s = jnp.einsum("binc,bjnc->bnij", q, k).astype(jnp.float32)  # no 1/sqrt(d)
    s = s + bias[None] + mask_bias
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnij,bjnc->binc", a, v).reshape(B, Lq, cfg.dim_attn)
    x = x + L.linear(p["o"], o)
    # feed-forward: gated fc1(x) * act(gate(x)) -> fc2 (UMT5, t5.py:119-137)
    # or plain act(fc1(x)) -> fc2 (T5 v1.0 DenseReluDense)
    y = t5_layer_norm(x, p["norm2"], cfg.eps)
    act = gelu_tanh_exact if cfg.ffn_act == "gelu_tanh" else jax.nn.relu
    if cfg.gated_ffn:
        y = L.linear(p["fc1"], y) * act(L.linear(p["gate"], y))
    else:
        y = act(L.linear(p["fc1"], y))
    x = x + L.linear(p["fc2"], y)
    return x


def t5_encode(params, cfg: T5Config, ids, mask=None):
    """ids: (B, L) int32; mask: (B, L) 1/0 -> (B, L, dim) encoder states."""
    B, Lq = ids.shape
    x = params["token_embedding"].astype(jnp.float32)[ids].astype(params["norm"].dtype)
    buckets = jnp.asarray(relative_position_buckets(Lq, cfg.num_buckets, cfg.max_dist))
    if mask is not None:
        mask_bias = jnp.where(mask[:, None, None, :] == 0, jnp.finfo(jnp.float32).min, 0.0)
    else:
        mask_bias = jnp.zeros((1, 1, 1, Lq), jnp.float32)

    if cfg.shared_rel_bias:
        shared_bias = (
            params["rel_embedding"].astype(jnp.float32)[buckets].transpose(2, 0, 1)
        )

        def body(x, bp):
            return _block(bp, cfg, x, shared_bias, mask_bias), None

    else:

        def body(x, bp):
            # per-layer relative bias (UMT5: shared_pos=False, t5.py:165)
            bias = bp["rel_embedding"].astype(jnp.float32)[buckets].transpose(2, 0, 1)
            return _block(bp, cfg, x, bias, mask_bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_layer_norm(x, params["norm"], cfg.eps)


def init_t5_params(rng, cfg: T5Config, dtype=jnp.bfloat16):
    keys = iter(L.split_keys(rng, 8))

    def block_init(r):
        ks = iter(L.split_keys(r, 8))
        lin = lambda di, do, std: {
            "w": (jax.random.normal(next(ks), (di, do)) * std).astype(dtype)
        }
        p = {
            "norm1": jnp.ones((cfg.dim,), jnp.float32),
            "q": lin(cfg.dim, cfg.dim_attn, (cfg.dim * cfg.dim_attn) ** -0.5),
            "k": lin(cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
            "v": lin(cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
            "o": lin(cfg.dim_attn, cfg.dim, cfg.dim_attn**-0.5),
            "norm2": jnp.ones((cfg.dim,), jnp.float32),
            "fc1": lin(cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
            "fc2": lin(cfg.dim_ffn, cfg.dim, cfg.dim_ffn**-0.5),
        }
        if cfg.gated_ffn:
            p["gate"] = lin(cfg.dim, cfg.dim_ffn, cfg.dim**-0.5)
        if not cfg.shared_rel_bias:
            p["rel_embedding"] = (
                jax.random.normal(next(ks), (cfg.num_buckets, cfg.num_heads))
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
            ).astype(jnp.float32)
        return p

    params = {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, cfg.dim)).astype(dtype),
        "blocks": jax.vmap(block_init)(jnp.stack(L.split_keys(next(keys), cfg.num_layers))),
        "norm": jnp.ones((cfg.dim,), jnp.float32),
    }
    if cfg.shared_rel_bias:
        params["rel_embedding"] = (
            jax.random.normal(next(keys), (cfg.num_buckets, cfg.num_heads))
            * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
        ).astype(jnp.float32)
    return params
