"""Wan DiT forward vs an independent torch re-implementation of the
reference equations (wan_orig/modules/model.py), sharing the same weights."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparse_videogen_tpu.config import SVGConfig, VideoLayout
from sparse_videogen_tpu.models.wan import model as WM
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = WM.WanConfig(
    dim=96, ffn_dim=192, num_heads=4, num_layers=2, freq_dim=32, text_dim=48, text_len=16
)


def t_lin(p, x):
    y = x @ torch.tensor(np.asarray(p["w"], np.float32))
    if "b" in p:
        y = y + torch.tensor(np.asarray(p["b"], np.float32))
    return y


def t_rms(x, w, eps=1e-6):
    n = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return n * torch.tensor(np.asarray(w, np.float32))


def t_ln(x, eps=1e-6, w=None, b=None):
    y = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)
    if w is not None:
        y = y * torch.tensor(np.asarray(w, np.float32)) + torch.tensor(np.asarray(b, np.float32))
    return y


def t_rope(x, f, h, w_, head_dim):
    """Interleaved complex rope, f64 (the reference's precision)."""
    from sparse_videogen_tpu.models.common.rope import _axis_freqs

    d = head_dim
    dt, dhw = d - 4 * (d // 6), 2 * (d // 6)
    ang = np.concatenate(
        [
            np.broadcast_to(_axis_freqs(f, dt)[:, None, None, :], (f, h, w_, dt // 2)),
            np.broadcast_to(_axis_freqs(h, dhw)[None, :, None, :], (f, h, w_, dhw // 2)),
            np.broadcast_to(_axis_freqs(w_, dhw)[None, None, :, :], (f, h, w_, dhw // 2)),
        ],
        -1,
    ).reshape(f * h * w_, d // 2)
    freqs = torch.polar(torch.ones(ang.shape, dtype=torch.float64), torch.tensor(ang))
    xc = torch.view_as_complex(x.to(torch.float64).reshape(*x.shape[:-1], d // 2, 2))
    out = torch.view_as_real(xc * freqs[None, None]).flatten(-2)
    return out.to(x.dtype)


def torch_wan_forward(params, cfg, x, t, context):
    """Direct port of WanModel.forward (t2v), f32 torch."""
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    B, C, F, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    Fp, Hp, Wp = F // pt, H // ph, W // pw
    S = Fp * Hp * Wp

    xt = torch.tensor(np.asarray(x, np.float32))
    tok = xt.reshape(B, C, Fp, pt, Hp, ph, Wp, pw).permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, S, -1)
    tok = t_lin(params["patch_embedding"], tok)

    half = cfg.freq_dim // 2
    pos = torch.tensor(np.asarray(t, np.float32))
    sin = pos[:, None] * torch.pow(10000.0, -torch.arange(half) / half)[None]
    e_in = torch.cat([torch.cos(sin), torch.sin(sin)], 1)
    e = t_lin(params["time_embedding"]["fc2"], torch.nn.functional.silu(t_lin(params["time_embedding"]["fc1"], e_in)))
    e6 = t_lin(params["time_projection"], torch.nn.functional.silu(e)).reshape(B, 6, cfg.dim)

    ctx = torch.tensor(np.asarray(context, np.float32))
    ctx = t_lin(params["text_embedding"]["fc2"], torch.nn.functional.gelu(t_lin(params["text_embedding"]["fc1"], ctx), approximate="tanh"))

    nh, hd = cfg.num_heads, cfg.head_dim
    for li in range(cfg.num_layers):
        p = jax.tree.map(lambda a: a[li], params["blocks"])
        ee = torch.tensor(p["modulation"])[None] + e6
        y = t_ln(tok, cfg.eps)
        y = y * (1 + ee[:, 1:2]) + ee[:, 0:1]
        sa = p["self_attn"]
        q = t_rms(t_lin(sa["q"], y), sa["norm_q"], cfg.eps).reshape(B, S, nh, hd).transpose(1, 2)
        k = t_rms(t_lin(sa["k"], y), sa["norm_k"], cfg.eps).reshape(B, S, nh, hd).transpose(1, 2)
        v = t_lin(sa["v"], y).reshape(B, S, nh, hd).transpose(1, 2)
        q = t_rope(q, Fp, Hp, Wp, hd)
        k = t_rope(k, Fp, Hp, Wp, hd)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        y = t_lin(sa["o"], o.transpose(1, 2).reshape(B, S, -1))
        tok = tok + y * ee[:, 2:3]

        y = t_ln(tok, cfg.eps, p["norm3"]["w"], p["norm3"]["b"])
        ca = p["cross_attn"]
        q = t_rms(t_lin(ca["q"], y), ca["norm_q"], cfg.eps).reshape(B, S, nh, hd).transpose(1, 2)
        k = t_rms(t_lin(ca["k"], ctx), ca["norm_k"], cfg.eps).reshape(B, -1, nh, hd).transpose(1, 2)
        v = t_lin(ca["v"], ctx).reshape(B, -1, nh, hd).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        tok = tok + t_lin(ca["o"], o.transpose(1, 2).reshape(B, S, -1))

        y = t_ln(tok, cfg.eps)
        y = y * (1 + ee[:, 4:5]) + ee[:, 3:4]
        y = t_lin(p["ffn"]["fc2"], torch.nn.functional.gelu(t_lin(p["ffn"]["fc1"], y), approximate="tanh"))
        tok = tok + y * ee[:, 5:6]

    hm = torch.tensor(params["head"]["modulation"])[None] + e[:, None]
    y = t_ln(tok, cfg.eps) * (1 + hm[:, 1:2]) + hm[:, 0:1]
    out = t_lin(params["head"]["out"], y)
    out = out.reshape(B, Fp, Hp, Wp, pt, ph, pw, cfg.out_dim).permute(0, 7, 1, 4, 2, 5, 3, 6)
    return out.reshape(B, cfg.out_dim, F, H, W).numpy()


@pytest.fixture(scope="module")
def setup():
    params = WM.init_wan_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, F, H, W = 1, 4, 8, 8
    x = jnp.asarray(rng.standard_normal((B, CFG.in_dim, F, H, W)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((B, CFG.text_len, CFG.text_dim)), jnp.float32)
    layout = VideoLayout(num_frames=F, frame_size=(H // 2) * (W // 2))
    return params, x, t, ctx, layout


def test_wan_forward_matches_torch_reference(setup):
    params, x, t, ctx, layout = setup
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    out, _ = WM.wan_forward(params, CFG, x, t, ctx, attention=DenseRuntime(plan))
    ref = torch_wan_forward(params, CFG, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-3, atol=5e-4)


def test_wan_forward_svg1_runs_and_warmup_matches_dense(setup):
    params, x, t, ctx, layout = setup
    from sparse_videogen_tpu.config import WarmupSchedule

    plan_w = make_svg1_plan(
        layout, SVGConfig(sparsity=0.4), WarmupSchedule(first_layers=0, first_times=400.0),
        block_q=128, block_kv=128,
    )
    dense_plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    # t=500 > 400 -> all layers dense
    out_w, _ = WM.wan_forward(params, CFG, x, t, ctx, attention=SVG1Runtime(plan_w))
    out_d, _ = WM.wan_forward(params, CFG, x, t, ctx, attention=DenseRuntime(dense_plan))
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_d), rtol=1e-4, atol=1e-5)
    # t=100 < 400 -> sparse; still finite and different
    out_s, _ = WM.wan_forward(
        params, CFG, x, jnp.asarray([100.0], jnp.float32), ctx, attention=SVG1Runtime(plan_w)
    )
    assert np.all(np.isfinite(np.asarray(out_s)))


def test_build_i2v_condition_mask_semantics():
    """diffusers WanImageToVideoPipeline.prepare_latents: 4 mask channels all
    ones at latent frame 0 (the conditioning image), zeros after; image
    latents appended -> 20 channels."""
    from sparse_videogen_tpu.pipelines.wan import build_i2v_condition

    lat = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 5, 4, 6)), jnp.float32)
    cond = build_i2v_condition(lat)
    assert cond.shape == (1, 20, 5, 4, 6)
    mask = np.asarray(cond[:, :4])
    np.testing.assert_array_equal(mask[:, :, 0], 1.0)
    np.testing.assert_array_equal(mask[:, :, 1:], 0.0)
    np.testing.assert_array_equal(np.asarray(cond[:, 4:]), np.asarray(lat))


def test_wan_i2v_pipeline_with_clip_and_condition():
    """I2V denoise loop: clip_fea through img_emb, latent_cond channel-concat
    (in_dim 36 = 16 noise + 20 cond)."""
    from sparse_videogen_tpu.config import SVGConfig
    from sparse_videogen_tpu.pipelines import WanPipeline
    from sparse_videogen_tpu.pipelines.wan import build_i2v_condition

    cfg = WM.WanConfig(model_type="i2v", in_dim=36, dim=64, ffn_dim=128,
                       num_heads=4, num_layers=2, freq_dim=32, text_dim=32,
                       text_len=8, image_dim=24)
    params = WM.init_wan_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    clip_fea = jnp.asarray(rng.standard_normal((1, 257, 24)), jnp.float32)
    img_lat = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 12)) * 0.1, jnp.float32)
    pipe = WanPipeline(cfg, params, dtype=jnp.float32)
    lat = pipe.generate_latents(
        ctx, jnp.zeros_like(ctx),
        height=64, width=96, num_frames=9, num_inference_steps=2,
        pattern="SVG", first_layers_fp=0.5, first_times_fp=0.5,
        svg=SVGConfig(num_sampled_rows=8, sparsity=0.5, profile_multiplier=1.5),
        clip_fea=clip_fea, latent_cond=build_i2v_condition(img_lat),
    )
    assert lat.shape == (1, 16, 3, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()
    # the conditioning image must influence the result
    lat2 = pipe.generate_latents(
        ctx, jnp.zeros_like(ctx),
        height=64, width=96, num_frames=9, num_inference_steps=2,
        pattern="SVG", first_layers_fp=0.5, first_times_fp=0.5,
        svg=SVGConfig(num_sampled_rows=8, sparsity=0.5, profile_multiplier=1.5),
        clip_fea=clip_fea, latent_cond=build_i2v_condition(img_lat * -1.0),
    )
    assert np.abs(np.asarray(lat) - np.asarray(lat2)).max() > 1e-6
