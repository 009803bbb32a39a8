"""LLaMA-3 text encoder (decoder-only LM used as an encoder).

HunyuanVideo's primary text encoder is a LLaMA-3-8B (llava variant) run with
`output_hidden_states=True`; the conditioning is hidden_states[-(skip+1)]
with hidden_state_skip_layer=2, i.e. the activations AFTER layer N-2 and
WITHOUT the final norm (reference text_encoder/__init__.py:277-283, config
--hidden-state-skip-layer default 2). We therefore only materialize layers
0..N-1-skip — the last `skip` layers are never computed.

Architecture (HF LlamaModel): RMSNorm pre-norm blocks, GQA attention with
rotary embeddings (theta 500000), SwiGLU MLP. Right padding + causal mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.models.common import layers as L


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    dim: int = 4096
    ffn_dim: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    rope_theta: float = 500000.0
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads


LLAMA3_8B = LlamaConfig()


def rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def rope_tables(seq_len: int, head_dim: int, theta: float):
    """HF half-split rotary tables: (cos, sin) each (L, head_dim)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv)  # (L, hd/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def apply_rope(x, cos, sin):
    """x: (B, L, H, hd); HF rotate_half convention."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s).astype(x.dtype)


def _block(p, cfg: LlamaConfig, x, cos, sin, bias):
    B, Lq, _ = x.shape
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = rms_norm(x, p["ln1"], cfg.eps)
    q = L.linear(p["q"], h).reshape(B, Lq, H, hd)
    k = L.linear(p["k"], h).reshape(B, Lq, KV, hd)
    v = L.linear(p["v"], h).reshape(B, Lq, KV, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    rep = H // KV
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * (hd**-0.5) + bias
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a.astype(v.dtype), v).reshape(B, Lq, H * hd)
    x = x + L.linear(p["o"], o)
    h = rms_norm(x, p["ln2"], cfg.eps)
    gate = L.linear(p["gate"], h)
    up = L.linear(p["up"], h)
    x = x + L.linear(p["down"], jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up)
    return x


def llama_encode(params, cfg: LlamaConfig, ids, mask, *, inputs_embeds=None):
    """ids, mask: (B, L) -> hidden states after the last block in params.

    params["blocks"] holds only the ACTIVE layers (the converter drops the
    final hidden_state_skip_layer layers), so the result equals HF
    outputs.hidden_states[-(skip + 1)] with apply_final_norm=False (the
    hyvideo default).

    inputs_embeds: optional (B, L, dim) overriding the token embedding
    lookup (the Llava image-splice path, models/common/llava.py).
    """
    B, Lq = ids.shape
    x = params["embed"][ids] if inputs_embeds is None else inputs_embeds
    cos, sin = rope_tables(Lq, cfg.head_dim, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((Lq, Lq), bool))
    allowed = causal[None, None] & (mask[:, None, None, :] != 0)
    bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)

    def body(x, bp):
        return _block(bp, cfg, x, cos, sin, bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def llama_lm_logits(params, cfg: LlamaConfig, ids, mask):
    """Next-token logits (B, L, vocab) for the causal-LM use of this stack
    (prompt extension, utils/prompt_extend.py). Needs the full-depth params
    with `final_norm` (convert_qwen_lm / init_llama_lm_params); the LM head
    is `lm_head` when present, else tied to the embedding."""
    x = llama_encode(params, cfg, ids, mask)
    x = rms_norm(x, params["final_norm"], cfg.eps)
    head = params.get("lm_head", params["embed"].T)
    return jnp.einsum("bld,dv->blv", x.astype(jnp.float32), head.astype(jnp.float32))


def llama_greedy_generate(params, cfg: LlamaConfig, ids, *, max_new_tokens: int, eos_id: int):
    """Greedy decode: (L,) prompt ids -> generated ids (python list).

    Offline/structure-test scale: re-encodes the prefix per step (no KV
    cache) — the prompt-extension workload is one short completion per
    video, not a serving path."""
    ids = list(np.asarray(ids).tolist())
    out = []
    for _ in range(max_new_tokens):
        arr = jnp.asarray([ids + out], jnp.int32)
        mask = jnp.ones_like(arr)
        logits = llama_lm_logits(params, cfg, arr, mask)
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == eos_id:
            break
        out.append(nxt)
    return out


def init_llama_params(rng, cfg: LlamaConfig, *, n_layers: int | None = None, dtype=jnp.bfloat16):
    n = cfg.num_layers if n_layers is None else n_layers
    keys = iter(L.split_keys(rng, 2 + n))
    embed = jax.random.normal(next(keys), (cfg.vocab_size, cfg.dim), dtype) * 0.02

    def block_init(r):
        ks = iter(L.split_keys(r, 8))
        hd, KV = cfg.head_dim, cfg.num_kv_heads
        return {
            "ln1": jnp.ones((cfg.dim,), jnp.float32),
            "q": L.init_linear(next(ks), cfg.dim, cfg.dim, bias=False, dtype=dtype),
            "k": L.init_linear(next(ks), cfg.dim, KV * hd, bias=False, dtype=dtype),
            "v": L.init_linear(next(ks), cfg.dim, KV * hd, bias=False, dtype=dtype),
            "o": L.init_linear(next(ks), cfg.dim, cfg.dim, bias=False, dtype=dtype),
            "ln2": jnp.ones((cfg.dim,), jnp.float32),
            "gate": L.init_linear(next(ks), cfg.dim, cfg.ffn_dim, bias=False, dtype=dtype),
            "up": L.init_linear(next(ks), cfg.dim, cfg.ffn_dim, bias=False, dtype=dtype),
            "down": L.init_linear(next(ks), cfg.ffn_dim, cfg.dim, bias=False, dtype=dtype),
        }

    from sparse_videogen_tpu.io.checkpoint import _stack

    return {"embed": embed, "blocks": _stack([block_init(next(keys)) for _ in range(n)])}
