"""HunyuanVideo DiT (HYVideo-T/2), functional JAX.

Architecture from HYVideoDiffusionTransformer
(/root/reference/svg/models/hyvideo_orig/modules/models.py:369-700 with
embed/mlp/modulate/token_refiner layers): 20 double-stream blocks (separate
img/txt streams, joint attention) + 40 single-stream blocks (concat streams,
parallel attention+MLP via one fused linear1/linear2); 3-axis interleaved
RoPE on video tokens only (rope_dim_list (16,56,56)); AdaLN vec = timestep
embedding + pooled-CLIP MLPEmbedder (+ guidance embedding for the cfg-distilled
checkpoint); LLaMA text states pass through a 2-block token refiner.

Token layout: seq = video + text_len(256), text LAST — sparse attention uses
MaskSpec "hyvideo" with the dynamic real length in aux (the reference's
real/fake split, hyvideo/utils.py:20-44).

Blocks run under lax.scan over stacked params; attention is an injected
runtime (sparse/runtimes.py).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common import layers as L
from sparse_videogen_tpu.models.common.rope import apply_rope_interleaved, nd_rope_cos_sin


@dataclasses.dataclass(frozen=True)
class HyVideoConfig:
    patch_size: tuple = (1, 2, 2)
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 3072
    heads_num: int = 24
    mlp_width_ratio: float = 4.0
    mm_double_blocks_depth: int = 20
    mm_single_blocks_depth: int = 40
    rope_dim_list: tuple = (16, 56, 56)
    text_states_dim: int = 4096  # LLaMA hidden
    text_states_dim_2: int = 768  # CLIP-L pooled
    text_len: int = 256
    guidance_embed: bool = True
    refiner_depth: int = 2
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.heads_num

    @property
    def mlp_hidden(self):
        return int(self.hidden_size * self.mlp_width_ratio)


HYVIDEO_T2 = HyVideoConfig()


def _ln(x, eps=1e-6, w=None, b=None):
    return L.layer_norm_f32(x, eps, w, b)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """embed_layers.py:77-98 (cos first)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _mlp2(p, x, act=jax.nn.silu):
    return L.linear(p["fc2"], act(L.linear(p["fc1"], x)))


def _heads(x, H, D):
    B, S, _ = x.shape
    return x.reshape(B, S, H, D).transpose(0, 2, 1, 3)


def _unheads(x):
    B, H, S, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * D)


def _qk_norm(x, w, eps):
    """Per-head RMSNorm with affine weight over head_dim."""
    return L.rms_norm(x, w, eps)


def _refiner_attention(q, k, v, mask):
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (D**-0.5)
    if mask is not None:
        s = jnp.where(mask[:, None], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _token_refiner(p, cfg, txt, t, mask):
    """SingleTokenRefiner (token_refiner.py:145-212): c = own t_embedder(t) +
    ctx_emb(masked-mean text); 2 pre-LN blocks with gated attention/MLP."""
    t_emb = _mlp2(p["t_embedder"], timestep_embedding(t, 256))
    if mask is None:
        ctx = jnp.mean(txt, axis=1)
        attn_mask = None
    else:
        m = mask.astype(txt.dtype)[..., None]
        ctx = jnp.sum(txt * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        m1 = (mask[:, None, :] == 1) & (mask[:, :, None] == 1)
        attn_mask = m1.at[:, :, 0].set(True)
    c = t_emb + _mlp2(p["c_embedder"], ctx.astype(t_emb.dtype))
    x = L.linear(p["input_embedder"], txt)
    H, D = cfg.heads_num, cfg.head_dim
    for i in range(cfg.refiner_depth):
        bp = jax.tree.map(lambda a: a[i], p["blocks"])
        gate = L.linear(bp["adaln"], jax.nn.silu(c))
        g_msa, g_mlp = jnp.split(gate, 2, axis=-1)
        y = _ln(x, cfg.eps, bp["norm1"]["w"], bp["norm1"]["b"]).astype(x.dtype)
        qkv = L.linear(bp["qkv"], y)
        q, k, v = (
            _heads(z, H, D) for z in jnp.split(qkv, 3, axis=-1)
        )
        a = _unheads(_refiner_attention(q, k, v, attn_mask))
        x = x + L.linear(bp["proj"], a) * g_msa[:, None]
        y = _ln(x, cfg.eps, bp["norm2"]["w"], bp["norm2"]["b"]).astype(x.dtype)
        x = x + _mlp2(bp["mlp"], y) * g_mlp[:, None]
    return x


def _double_block(p, cfg, img, txt, vec, cos, sin, t, rng, layer_idx, attn, state, real_len_dummy):
    """MMDoubleStreamBlock.forward (models.py:106-225)."""
    H, D = cfg.heads_num, cfg.head_dim
    B = img.shape[0]
    silu_vec = jax.nn.silu(vec)
    im = L.linear(p["img_mod"], silu_vec)
    tm = L.linear(p["txt_mod"], silu_vec)
    i1s, i1c, i1g, i2s, i2c, i2g = jnp.split(im, 6, axis=-1)
    t1s, t1c, t1g, t2s, t2c, t2g = jnp.split(tm, 6, axis=-1)

    y = _modulate(_ln(img, cfg.eps), i1s, i1c).astype(img.dtype)
    img_qkv = L.linear(p["img_qkv"], y)
    iq, ik, iv = (_heads(z, H, D) for z in jnp.split(img_qkv, 3, axis=-1))
    iq = _qk_norm(iq, p["img_q_norm"], cfg.eps)
    ik = _qk_norm(ik, p["img_k_norm"], cfg.eps)
    iq = apply_rope_interleaved(iq, cos, sin)
    ik = apply_rope_interleaved(ik, cos, sin)

    y = _modulate(_ln(txt, cfg.eps), t1s, t1c).astype(txt.dtype)
    txt_qkv = L.linear(p["txt_qkv"], y)
    tq, tk, tv = (_heads(z, H, D) for z in jnp.split(txt_qkv, 3, axis=-1))
    tq = _qk_norm(tq, p["txt_q_norm"], cfg.eps)
    tk = _qk_norm(tk, p["txt_k_norm"], cfg.eps)

    q = jnp.concatenate([iq, tq], axis=2)
    k = jnp.concatenate([ik, tk], axis=2)
    v = jnp.concatenate([iv, tv], axis=2)
    o, state = attn(q, k, v, t, rng, layer_idx, state)
    o = _unheads(o)
    img_len = img.shape[1]
    img_attn, txt_attn = o[:, :img_len], o[:, img_len:]

    img = img + L.linear(p["img_proj"], img_attn) * i1g[:, None]
    y = _modulate(_ln(img, cfg.eps), i2s, i2c).astype(img.dtype)
    img = img + _mlp2(p["img_mlp"], y, act=L.gelu_tanh) * i2g[:, None]

    txt = txt + L.linear(p["txt_proj"], txt_attn) * t1g[:, None]
    y = _modulate(_ln(txt, cfg.eps), t2s, t2c).astype(txt.dtype)
    txt = txt + _mlp2(p["txt_mlp"], y, act=L.gelu_tanh) * t2g[:, None]
    return img, txt, state


def _col_slice(p, lo, hi, keep_bias=True):
    """Column slice [lo:hi) of a linear's output dim, preserving quantized
    storage (fp8 per-tensor scale is column-invariant; int8 per-output-
    channel wscale is sliced along with the columns)."""
    out = {k: v for k, v in p.items() if k in ("scale",)}
    for wk in ("w8", "wi8", "w"):
        if wk in p:
            out[wk] = p[wk][..., lo:hi]
            break
    if "wscale" in p:
        out["wscale"] = p["wscale"][..., lo:hi]
    if keep_bias and "b" in p:
        out["b"] = p["b"][..., lo:hi]
    return out


def _row_slice(p, lo, hi, keep_bias=True):
    """Row slice [lo:hi) of a linear's input dim (for summing partial
    matmuls of a concatenated input). Quantized scales are input-invariant
    (fp8 per-tensor, int8 per-output-channel) so they pass through."""
    out = {k: v for k, v in p.items() if k in ("scale", "wscale")}
    for wk in ("w8", "wi8", "w"):
        if wk in p:
            out[wk] = p[wk][..., lo:hi, :]
            break
    if keep_bias and "b" in p:
        out["b"] = p["b"]
    return out


def _single_block(p, cfg, x, vec, cos, sin, txt_len, t, rng, layer_idx, attn, state):
    """MMSingleStreamBlock.forward (models.py:289-368).

    The reference computes one fused linear1 -> (qkv | mlp) split and a
    concat([attn_out, gelu(mlp)]) @ linear2. At 720p x 129f (S=119,056)
    those intermediates are 5.1 GB and 4.4 GB in bf16 — prohibitive next to
    13B fp8 weights on a 16 GB v5e. Mathematically identical restructure:
    column-slice linear1 into its qkv and mlp halves (two matmuls over the
    same y), run attention while only y (h wide) stays live, recompute the
    mlp branch afterwards, and row-slice linear2 into a sum of two partial
    matmuls so the concat never materializes.
    """
    H, D = cfg.heads_num, cfg.head_dim
    h = cfg.hidden_size
    mod = L.linear(p["modulation"], jax.nn.silu(vec))
    ms, mc, mg = jnp.split(mod, 3, axis=-1)
    y = _modulate(_ln(x, cfg.eps), ms, mc).astype(x.dtype)
    qkv = L.linear(_col_slice(p["linear1"], 0, 3 * h), y)
    q, k, v = (_heads(u, H, D) for u in jnp.split(qkv, 3, axis=-1))
    q = _qk_norm(q, p["q_norm"], cfg.eps)
    k = _qk_norm(k, p["k_norm"], cfg.eps)
    vid = x.shape[1] - txt_len
    q = jnp.concatenate([apply_rope_interleaved(q[:, :, :vid], cos, sin), q[:, :, vid:]], axis=2)
    k = jnp.concatenate([apply_rope_interleaved(k[:, :, :vid], cos, sin), k[:, :, vid:]], axis=2)
    o, state = attn(q, k, v, t, rng, layer_idx, state)
    o = _unheads(o)
    mlp = L.gelu_tanh(L.linear(_col_slice(p["linear1"], 3 * h, 3 * h + cfg.mlp_hidden), y))
    out = L.linear(_row_slice(p["linear2"], 0, h), o) + L.linear(
        _row_slice(p["linear2"], h, h + cfg.mlp_hidden, keep_bias=False), mlp
    )
    return x + out * mg[:, None], state


def hyvideo_forward(
    params,
    cfg: HyVideoConfig,
    x,  # (B, C, F, H, W) latents
    t,  # (B,) timesteps
    text_states,  # (B, text_len, text_states_dim) LLaMA hidden states
    text_mask,  # (B, text_len) 1/0
    text_states_2,  # (B, text_states_dim_2) CLIP pooled
    *,
    guidance=None,  # (B,) distilled guidance (x1000), required if guidance_embed
    attention,
    attn_states=None,
    attn_consts=None,
    rng=None,
):
    B, C, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    grid = (F // pt, H // ph, W // pw)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    # vec = time + pooled text (+ guidance) (models.py:573-585)
    t_emb = _mlp2(params["time_in"], timestep_embedding(t, 256))
    vec = t_emb + _mlp2(params["vector_in"], text_states_2.astype(t_emb.dtype))
    if cfg.guidance_embed:
        assert guidance is not None
        vec = vec + _mlp2(params["guidance_in"], timestep_embedding(guidance, 256))

    # img / txt embeds
    img = x.reshape(B, C, grid[0], pt, grid[1], ph, grid[2], pw)
    img = img.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, -1, C * pt * ph * pw)
    img = L.linear(params["img_in"], img)
    txt = _token_refiner(params["txt_in"], cfg, text_states, t, text_mask)
    # the reference runs modulation/gates in the model dtype: pin stream and
    # conditioning dtypes so the scan carries stay stable
    txt = txt.astype(img.dtype)
    vec = vec.astype(img.dtype)

    cos_np, sin_np = nd_rope_cos_sin(grid, cfg.rope_dim_list)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    n_layers = cfg.mm_double_blocks_depth + cfg.mm_single_blocks_depth
    if attn_states is None:
        attn_states = attention.init_state(B * cfg.heads_num, cfg.head_dim, n_layers)
    if attn_consts is None:
        attn_consts = attention.consts()
    attn = lambda q, k, v, tt, r, li, st: attention(q, k, v, tt, r, li, st, attn_consts)
    t0 = t[0]

    dstates = jax.tree.map(lambda s: s[: cfg.mm_double_blocks_depth], attn_states)
    sstates = jax.tree.map(lambda s: s[cfg.mm_double_blocks_depth :], attn_states)

    def dbody(carry, xs):
        img, txt = carry
        bp, st, li = xs
        krng = jax.random.fold_in(rng, li)
        img, txt, st = _double_block(
            bp, cfg, img, txt, vec, cos, sin, t0, krng, li, attn, st, None
        )
        return (img, txt), st

    ids_d = jnp.arange(cfg.mm_double_blocks_depth, dtype=jnp.int32)
    (img, txt), dstates = jax.lax.scan(dbody, (img, txt), (params["double_blocks"], dstates, ids_d))

    xx = jnp.concatenate([img, txt], axis=1)
    txt_len = txt.shape[1]

    def sbody(carry, xs):
        xx = carry
        bp, st, li = xs
        krng = jax.random.fold_in(rng, li)
        xx, st = _single_block(bp, cfg, xx, vec, cos, sin, txt_len, t0, krng, li, attn, st)
        return xx, st

    ids_s = jnp.arange(
        cfg.mm_double_blocks_depth, n_layers, dtype=jnp.int32
    )
    xx, sstates = jax.lax.scan(sbody, xx, (params["single_blocks"], sstates, ids_s))

    img = xx[:, : img.shape[1]]
    # final layer (mlp_layers.py:69-103): shift, scale order
    fl = L.linear(params["final_adaln"], jax.nn.silu(vec))
    shift, scale = jnp.split(fl, 2, axis=-1)
    img = _modulate(_ln(img, cfg.eps), shift, scale).astype(xx.dtype)
    img = L.linear(params["final_linear"], img)

    # unpatchify (models.py:640-652)
    tt_, th_, tw_ = grid
    c = cfg.out_channels
    img = img.reshape(B, tt_, th_, tw_, c, pt, ph, pw)
    img = jnp.einsum("nthwcopq->nctohpwq", img)
    out = img.reshape(B, c, tt_ * pt, th_ * ph, tw_ * pw)

    new_states = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), dstates, sstates
    )
    return out.astype(jnp.float32), new_states


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_hyvideo_params(rng, cfg: HyVideoConfig, dtype=jnp.bfloat16):
    keys = iter(L.split_keys(rng, 64))
    h = cfg.hidden_size
    hd = cfg.head_dim
    mh = cfg.mlp_hidden
    lin = lambda di, do: L.init_linear(next(keys), di, do, dtype=dtype)
    ln_p = lambda d: {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}

    def mlp2(di, dh_, do):
        return {"fc1": lin(di, dh_), "fc2": lin(dh_, do)}

    def dblock(r):
        ks = iter(L.split_keys(r, 16))
        li = lambda di, do: L.init_linear(next(ks), di, do, dtype=dtype)
        return {
            "img_mod": li(h, 6 * h),
            "img_qkv": li(h, 3 * h),
            "img_q_norm": jnp.ones((hd,), jnp.float32),
            "img_k_norm": jnp.ones((hd,), jnp.float32),
            "img_proj": li(h, h),
            "img_mlp": {"fc1": li(h, mh), "fc2": li(mh, h)},
            "txt_mod": li(h, 6 * h),
            "txt_qkv": li(h, 3 * h),
            "txt_q_norm": jnp.ones((hd,), jnp.float32),
            "txt_k_norm": jnp.ones((hd,), jnp.float32),
            "txt_proj": li(h, h),
            "txt_mlp": {"fc1": li(h, mh), "fc2": li(mh, h)},
        }

    def sblock(r):
        ks = iter(L.split_keys(r, 4))
        li = lambda di, do: L.init_linear(next(ks), di, do, dtype=dtype)
        return {
            "modulation": li(h, 3 * h),
            "linear1": li(h, 3 * h + mh),
            "linear2": li(h + mh, h),
            "q_norm": jnp.ones((hd,), jnp.float32),
            "k_norm": jnp.ones((hd,), jnp.float32),
        }

    def refiner_block(r):
        ks = iter(L.split_keys(r, 8))
        li = lambda di, do: L.init_linear(next(ks), di, do, dtype=dtype)
        return {
            "norm1": ln_p(h),
            "qkv": li(h, 3 * h),
            "proj": li(h, h),
            "norm2": ln_p(h),
            "mlp": {"fc1": li(h, 4 * h), "fc2": li(4 * h, h)},
            "adaln": li(h, 2 * h),
        }

    params = {
        "img_in": lin(cfg.in_channels * math.prod(cfg.patch_size), h),
        "time_in": mlp2(256, h, h),
        "vector_in": mlp2(cfg.text_states_dim_2, h, h),
        "txt_in": {
            "input_embedder": lin(cfg.text_states_dim, h),
            "t_embedder": mlp2(256, h, h),
            "c_embedder": mlp2(cfg.text_states_dim, h, h),
            "blocks": jax.vmap(refiner_block)(
                jnp.stack(L.split_keys(next(keys), cfg.refiner_depth))
            ),
        },
        "double_blocks": jax.vmap(dblock)(
            jnp.stack(L.split_keys(next(keys), cfg.mm_double_blocks_depth))
        ),
        "single_blocks": jax.vmap(sblock)(
            jnp.stack(L.split_keys(next(keys), cfg.mm_single_blocks_depth))
        ),
        "final_adaln": lin(h, 2 * h),
        "final_linear": lin(h, math.prod(cfg.patch_size) * cfg.out_channels),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = mlp2(256, h, h)
    return params
