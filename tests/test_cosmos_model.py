"""Cosmos DiT vs a torch mirror of the reference forward sharing weights.

The torch side re-implements custom_models.py:60-158 (the diffusers
CosmosTransformer3DModel forward with per-frame timesteps) + the attention
processor (attention.py:30-124) literally, so transcription errors in the
JAX model (patchify order, AdaLN chunking, rope layout, unpatchify permute)
are caught.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.cosmos import model as CM


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
CFG = CM.CosmosConfig(num_attention_heads=2, attention_head_dim=64, num_layers=2,
                      text_embed_dim=32, adaln_lora_dim=16, max_size=(8, 16, 16),
                      rope_scale=(2.0, 1.0, 1.0))


def tt(x):
    return torch.tensor(np.asarray(x, np.float32))


def t_lin(p, x):
    y = x @ tt(p["w"])
    if "b" in p:
        y = y + tt(p["b"])
    return y


def t_rms(x, w, eps=1e-6):
    n = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return n * tt(w)


def t_adaln(p, x, emb, temb, k, dim):
    e = t_lin(p["fc2"], t_lin(p["fc1"], F.silu(emb)))
    if temb is not None:
        e = e + temb[..., : k * dim]
    parts = e.chunk(k, dim=-1)
    h = F.layer_norm(x, (dim,), eps=1e-6)
    h = h * (1 + parts[1]) + parts[0]
    return h, (parts[2] if k == 3 else None)


def t_attention(p, x, ctx, cos, sin, cfg, use_rope):
    B, S, d = x.shape
    H, hd = cfg.num_attention_heads, cfg.attention_head_dim
    q = t_lin(p["q"], x).unflatten(2, (H, hd)).transpose(1, 2)
    k = t_lin(p["k"], ctx).unflatten(2, (H, hd)).transpose(1, 2)
    v = t_lin(p["v"], ctx).unflatten(2, (H, hd)).transpose(1, 2)
    q = t_rms(q, p["norm_q"])
    k = t_rms(k, p["norm_k"])
    if use_rope:
        def rot(x):
            x1, x2 = x.reshape(*x.shape[:-1], 2, -1).unbind(-2)
            xr = torch.cat([-x2, x1], dim=-1)
            return x * cos + xr * sin
        q, k = rot(q), rot(k)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).flatten(2, 3)
    return t_lin(p["o"], o)


def torch_forward(params, cfg, x, t, ctx, fps=None):
    B, C, Fr, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    grid = (Fr // pt, H // ph, W // pw)
    S = math.prod(grid)
    dim = cfg.hidden_size
    pm = torch.zeros(B, 1, Fr, H, W)
    x = torch.cat([x, pm], dim=1)
    xp = x.reshape(B, cfg.patch_in_channels, grid[0], pt, grid[1], ph, grid[2], pw)
    xp = xp.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, S, -1)
    hs = t_lin(params["patch_embed"], xp)

    cosj, sinj = CM.rope_3d(cfg, grid, fps=fps)
    cos, sin = tt(cosj)[None, None], tt(sinj)[None, None]
    pe = tt(CM.learnable_pos_emb(params["pos_embed"], grid))

    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    proj = t.reshape(-1)[:, None] * exponent.exp()[None]
    proj = torch.cat([proj.cos(), proj.sin()], dim=-1)
    temb = t_lin(params["time_embed"]["t_fc2"], F.silu(t_lin(params["time_embed"]["t_fc1"], proj)))
    emb = t_rms(proj, params["time_embed"]["norm"])
    if t.ndim == 5:
        temb = temb.reshape(B, grid[0], 1, 1, -1).expand(-1, -1, grid[1], grid[2], -1).flatten(1, 3)
        emb = emb.reshape(B, grid[0], 1, 1, -1).expand(-1, -1, grid[1], grid[2], -1).flatten(1, 3)
    else:
        temb, emb = temb[:, None], emb[:, None]

    take = lambda tree, i: jax.tree.map(lambda a: a[i], tree)
    for i in range(cfg.num_layers):
        p = take(params["blocks"], i)
        hs = hs + pe
        h, gate = t_adaln(p["norm1"], hs, emb, temb, 3, dim)
        hs = hs + gate * t_attention(p["attn1"], h, h, cos, sin, cfg, True)
        h, gate = t_adaln(p["norm2"], hs, emb, temb, 3, dim)
        hs = hs + gate * t_attention(p["attn2"], h, ctx, cos, sin, cfg, False)
        h, gate = t_adaln(p["norm3"], hs, emb, temb, 3, dim)
        hs = hs + gate * t_lin(p["ff2"], F.gelu(t_lin(p["ff1"], h)))

    h, _ = t_adaln(params["norm_out"], hs, emb, temb, 2, dim)
    out = t_lin(params["proj_out"], h)
    out = out.unflatten(2, (ph, pw, pt, -1)).unflatten(1, grid)
    out = out.permute(0, 7, 1, 6, 2, 4, 3, 5)
    return out.flatten(6, 7).flatten(4, 5).flatten(2, 3)


@pytest.mark.parametrize("per_frame,fps", [(False, None), (True, 30)])
def test_cosmos_forward_parity(per_frame, fps):
    params = CM.init_cosmos_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, Fr, H, W = 1, 4, 8, 16
    x = rng.standard_normal((B, 16, Fr, H, W)).astype(np.float32)
    ctx = rng.standard_normal((B, 12, CFG.text_embed_dim)).astype(np.float32)
    if per_frame:
        t = np.linspace(100.0, 900.0, Fr, dtype=np.float32).reshape(1, 1, Fr, 1, 1)
        t = np.broadcast_to(t, (B, 1, Fr, 1, 1)).copy()
    else:
        t = np.full((B,), 500.0, np.float32)

    out = np.asarray(CM.cosmos_forward(params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), fps=fps)[0])
    ref = torch_forward(params, CFG, torch.tensor(x), torch.tensor(t), torch.tensor(ctx), fps=fps).numpy()
    assert out.shape == ref.shape == (B, 16, Fr, H, W)
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_cosmos_cli_smoke(tmp_path):
    from sparse_videogen_tpu.cli import cosmos_t2v

    out = str(tmp_path / "cosmos.npz")
    for pattern in ("SVG", "SAP"):
        cosmos_t2v.main(["--smoke", "--pattern", pattern, "--output_file", out,
                         "--num_inference_steps", "2"])
        lat = np.load(out)["latents"]
        assert np.isfinite(lat).all() and lat.shape[1] == 16
    # a video extension routes through the tokenizer VAE (wan convention:
    # .npz = latents, video ext = tiny-random-VAE decode in smoke mode)
    y4m = tmp_path / "cosmos.y4m"
    cosmos_t2v.main(["--smoke", "--output_file", str(y4m),
                     "--num_inference_steps", "2"])
    assert y4m.read_bytes()[:9] == b"YUV4MPEG2"


def test_cosmos_sap_state_threads_through_steps():
    """Regression: cosmos_forward must RETURN the scanned attention states —
    dropping them (pre-fix) silently re-ran SAP's cold iter_init k-means
    every denoising step and never logged density."""
    import numpy as np

    from sparse_videogen_tpu.config import SAPConfig

    cfg = CM.CosmosConfig(num_attention_heads=2, attention_head_dim=64, num_layers=2,
                          text_embed_dim=64, adaln_lora_dim=16, max_size=(8, 16, 16))
    params = CM.init_cosmos_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(0).standard_normal((1, 24, 64)), jnp.float32)
    from sparse_videogen_tpu.config import SVGConfig, WarmupSchedule
    from sparse_videogen_tpu.pipelines.cosmos import cosmos_layout
    from sparse_videogen_tpu.sparse.runtimes import SAPRuntime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan

    layout = cosmos_layout(cfg, 128, 128, 17)
    plan = make_svg1_plan(layout, SVGConfig(num_sampled_rows=8),
                          WarmupSchedule(first_layers=0, first_times=1001.0))
    rt = SAPRuntime(plan, SAPConfig(num_q_centroids=6, num_k_centroids=8,
                                    kmeans_iter_init=4, block_q=128, block_kv=128,
                                    max_runs=8),
                    WarmupSchedule(first_layers=0, first_times=1001.0))
    st = rt.init_state(2 * cfg.num_attention_heads, cfg.attention_head_dim, cfg.num_layers)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, cfg.in_channels, 3, 16, 16)), jnp.float32)
    out, st1 = CM.cosmos_forward(
        params, cfg, x, jnp.full((2,), 1.0, jnp.float32), jnp.concatenate([ctx, ctx], 0),
        attention=rt, attn_states=st, attn_consts=rt.consts(), rng=jax.random.PRNGKey(0))
    assert bool(np.asarray(st1.initialized).all()), "states must thread out"
    assert float(np.asarray(st1.last_density).mean()) > 0
