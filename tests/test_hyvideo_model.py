"""HunyuanVideo DiT vs independent torch port of the reference equations."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sparse_videogen_tpu.config import SVGConfig, TextPosition, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.models.hyvideo import model as HM
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
CFG = HM.HyVideoConfig(
    hidden_size=64, heads_num=4, mm_double_blocks_depth=2, mm_single_blocks_depth=2,
    rope_dim_list=(4, 6, 6), text_states_dim=32, text_states_dim_2=24, text_len=8,
    guidance_embed=True, mlp_width_ratio=2.0,
)

tt = lambda a: torch.tensor(np.asarray(a, np.float32))


def t_lin(p, x):
    y = x @ tt(p["w"])
    if "b" in p:
        y = y + tt(p["b"])
    return y


def t_mlp2(p, x, act=F.silu):
    return t_lin(p["fc2"], act(t_lin(p["fc1"], x)))


def t_ln(x, w=None, b=None, eps=1e-6):
    y = F.layer_norm(x, (x.shape[-1],), eps=eps)
    if w is not None:
        y = y * tt(w) + tt(b)
    return y


def t_rms(x, w, eps=1e-6):
    n = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return n * tt(w)


def t_timestep_emb(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], -1)


def t_rope(x, cos, sin):
    # x (B,H,S,D); interleaved: x*cos_ri + rotate_half(x)*sin_ri
    c = tt(cos).repeat_interleave(2, dim=-1)[None, None]
    s = tt(sin).repeat_interleave(2, dim=-1)[None, None]
    xr = x.reshape(*x.shape[:-1], -1, 2)
    rot = torch.stack([-xr[..., 1], xr[..., 0]], -1).flatten(-2)
    return x * c + rot * s


def t_heads(x, H):
    B, S, hd = x.shape
    return x.reshape(B, S, H, hd // H).permute(0, 2, 1, 3)


def t_attn(q, k, v, mask=None):
    return F.scaled_dot_product_attention(q, k, v, attn_mask=mask)


def torch_hyvideo(params, cfg, x, t, text, mask, text2, guidance, cos, sin):
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    B, C, Fr, Hh, Ww = x.shape
    pt, ph, pw = cfg.patch_size
    H = cfg.heads_num
    vec = t_mlp2(p["time_in"], t_timestep_emb(torch.tensor(t), 256))
    vec = vec + t_mlp2(p["vector_in"], tt(text2))
    vec = vec + t_mlp2(p["guidance_in"], t_timestep_emb(torch.tensor(guidance), 256))

    xt = tt(x).reshape(B, C, Fr // pt, pt, Hh // ph, ph, Ww // pw, pw)
    img = xt.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, -1, C * pt * ph * pw)
    img = t_lin(p["img_in"], img)

    # token refiner
    tr = p["txt_in"]
    temb = t_mlp2(tr["t_embedder"], t_timestep_emb(torch.tensor(t), 256))
    mt = tt(mask)[..., None]
    ctx = (tt(text) * mt).sum(1) / mt.sum(1).clamp(min=1)
    c = temb + t_mlp2(tr["c_embedder"], ctx)
    txt = t_lin(tr["input_embedder"], tt(text))
    m1 = (tt(mask)[:, None, :] > 0) & (tt(mask)[:, :, None] > 0)
    m1[:, :, 0] = True
    am = m1[:, None]
    for i in range(cfg.refiner_depth):
        bp = jax.tree.map(lambda a: a[i], tr["blocks"])
        g1, g2 = t_lin(bp["adaln"], F.silu(c)).chunk(2, -1)
        y = t_ln(txt, bp["norm1"]["w"], bp["norm1"]["b"])
        q, k, v = (t_heads(z, H) for z in t_lin(bp["qkv"], y).chunk(3, -1))
        a = t_attn(q, k, v, am).permute(0, 2, 1, 3).reshape(B, -1, cfg.hidden_size)
        txt = txt + t_lin(bp["proj"], a) * g1[:, None]
        y = t_ln(txt, bp["norm2"]["w"], bp["norm2"]["b"])
        txt = txt + t_mlp2(bp["mlp"], y) * g2[:, None]

    mod = lambda x, sh, sc: x * (1 + sc[:, None]) + sh[:, None]
    for i in range(cfg.mm_double_blocks_depth):
        bp = jax.tree.map(lambda a: a[i], p["double_blocks"])
        im6 = t_lin(bp["img_mod"], F.silu(vec)).chunk(6, -1)
        tm6 = t_lin(bp["txt_mod"], F.silu(vec)).chunk(6, -1)
        y = mod(t_ln(img), im6[0], im6[1])
        iq, ik, iv = (t_heads(z, H) for z in t_lin(bp["img_qkv"], y).chunk(3, -1))
        iq = t_rope(t_rms(iq, bp["img_q_norm"]), cos, sin)
        ik = t_rope(t_rms(ik, bp["img_k_norm"]), cos, sin)
        y = mod(t_ln(txt), tm6[0], tm6[1])
        tq, tk, tv = (t_heads(z, H) for z in t_lin(bp["txt_qkv"], y).chunk(3, -1))
        tq, tk = t_rms(tq, bp["txt_q_norm"]), t_rms(tk, bp["txt_k_norm"])
        q = torch.cat([iq, tq], 2); k = torch.cat([ik, tk], 2); v = torch.cat([iv, tv], 2)
        o = t_attn(q, k, v).permute(0, 2, 1, 3).reshape(B, -1, cfg.hidden_size)
        ia, ta = o[:, : img.shape[1]], o[:, img.shape[1]:]
        img = img + t_lin(bp["img_proj"], ia) * im6[2][:, None]
        img = img + t_mlp2(bp["img_mlp"], mod(t_ln(img), im6[3], im6[4]),
                           act=lambda u: F.gelu(u, approximate="tanh")) * im6[5][:, None]
        txt = txt + t_lin(bp["txt_proj"], ta) * tm6[2][:, None]
        txt = txt + t_mlp2(bp["txt_mlp"], mod(t_ln(txt), tm6[3], tm6[4]),
                           act=lambda u: F.gelu(u, approximate="tanh")) * tm6[5][:, None]

    xx = torch.cat([img, txt], 1)
    txt_len = txt.shape[1]
    for i in range(cfg.mm_single_blocks_depth):
        bp = jax.tree.map(lambda a: a[i], p["single_blocks"])
        ms, mc, mg = t_lin(bp["modulation"], F.silu(vec)).chunk(3, -1)
        y = mod(t_ln(xx), ms, mc)
        z = t_lin(bp["linear1"], y)
        qkv, mlp = z[..., : 3 * cfg.hidden_size], z[..., 3 * cfg.hidden_size:]
        q, k, v = (t_heads(u, H) for u in qkv.chunk(3, -1))
        q, k = t_rms(q, bp["q_norm"]), t_rms(k, bp["k_norm"])
        vid = xx.shape[1] - txt_len
        q = torch.cat([t_rope(q[:, :, :vid], cos, sin), q[:, :, vid:]], 2)
        k = torch.cat([t_rope(k[:, :, :vid], cos, sin), k[:, :, vid:]], 2)
        o = t_attn(q, k, v).permute(0, 2, 1, 3).reshape(B, -1, cfg.hidden_size)
        out = t_lin(bp["linear2"], torch.cat([o, F.gelu(mlp, approximate="tanh")], -1))
        xx = xx + out * mg[:, None]

    img = xx[:, : img.shape[1]]
    sh, sc = t_lin(p["final_adaln"], F.silu(vec)).chunk(2, -1)
    img = mod(t_ln(img), sh, sc)
    img = t_lin(p["final_linear"], img)
    tt_, th_, tw_ = Fr // pt, Hh // ph, Ww // pw
    img = img.reshape(B, tt_, th_, tw_, cfg.out_channels, pt, ph, pw)
    img = torch.einsum("nthwcopq->nctohpwq", img)
    return img.reshape(B, cfg.out_channels, Fr, Hh, Ww).numpy()


@pytest.fixture(scope="module")
def setup():
    params = HM.init_hyvideo_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, Fr, Hh, Ww = 1, 2, 8, 12
    x = rng.standard_normal((B, CFG.in_channels, Fr, Hh, Ww)).astype(np.float32)
    t = np.array([500.0], np.float32)
    g = np.array([6000.0], np.float32)
    text = rng.standard_normal((B, CFG.text_len, CFG.text_states_dim)).astype(np.float32)
    mask = np.ones((B, CFG.text_len), np.int32); mask[0, 5:] = 0
    text2 = rng.standard_normal((B, CFG.text_states_dim_2)).astype(np.float32)
    return params, x, t, g, text, mask, text2


def test_hyvideo_forward_matches_torch(setup):
    params, x, t, g, text, mask, text2 = setup
    grid = (2, 4, 6)
    layout = VideoLayout(num_frames=grid[0], frame_size=grid[1] * grid[2],
                         context_length=CFG.text_len, text_position=TextPosition.LAST)
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    rt = DenseRuntime(plan, prompt_length=5)
    out, _ = HM.hyvideo_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
        jnp.asarray(mask), jnp.asarray(text2), guidance=jnp.asarray(g), attention=rt,
    )
    from sparse_videogen_tpu.models.common.rope import nd_rope_cos_sin
    cos, sin = nd_rope_cos_sin(grid, CFG.rope_dim_list)
    ref = torch_hyvideo(params, CFG, x, t, text, mask, text2, g, cos, sin)
    # NOTE the torch port runs *full dense* attention (pads attend everything);
    # ours applies the reference's real/fake split. With prompt_length=5 they
    # differ, so compare against a full-dense run:
    plan_full = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128,
                               mask_kind="band_sink")
    # band_sink with no sink/band over text... instead force pure dense:
    object.__setattr__(plan_full, "mask_kind", "band_sink")
    rt_full = DenseRuntime(plan_full)
    out_full, _ = HM.hyvideo_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
        jnp.asarray(mask), jnp.asarray(text2), guidance=jnp.asarray(g), attention=rt_full,
    )
    np.testing.assert_allclose(np.asarray(out_full), ref, rtol=5e-3, atol=5e-4)
    # the real/fake-split output must differ from full dense (pads isolated)
    assert np.abs(np.asarray(out) - np.asarray(out_full)).max() > 1e-6


def test_hyvideo_svg1_runs(setup):
    params, x, t, g, text, mask, text2 = setup
    grid = (2, 4, 6)
    layout = VideoLayout(num_frames=grid[0], frame_size=grid[1] * grid[2],
                         context_length=CFG.text_len, text_position=TextPosition.LAST)
    plan = make_svg1_plan(
        layout, SVGConfig(sparsity=0.4, num_sampled_rows=8, profile_multiplier=1.5),
        WarmupSchedule(first_layers=1, first_times=900.0), block_q=128, block_kv=128,
    )
    rt = SVG1Runtime(plan, prompt_length=5)
    out, _ = HM.hyvideo_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
        jnp.asarray(mask), jnp.asarray(text2), guidance=jnp.asarray(g), attention=rt,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_hyvideo_i2v_latent_concat_pipeline():
    """I2V (community latent_concat checkpoint semantics): in_channels 33 =
    16 noise + 16 image latents + 1 first-frame mask; image must influence
    the result."""
    from sparse_videogen_tpu.pipelines.hyvideo import HyVideoPipeline

    cfg = HM.HyVideoConfig(in_channels=33, hidden_size=64, heads_num=4,
                           mm_double_blocks_depth=1, mm_single_blocks_depth=1,
                           rope_dim_list=(4, 6, 6), text_states_dim=32,
                           text_states_dim_2=16, text_len=8)
    params = HM.init_hyvideo_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pipe = HyVideoPipeline(cfg, params, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 1, 0, 0, 0]]), jnp.int32)
    pooled = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1, 16, 1, 8, 12)), jnp.float32)
    kw = dict(prompt_length=5, height=64, width=96, num_frames=9,
              num_inference_steps=2, pattern="dense")
    lat = pipe.generate_latents(text, mask, pooled, image_latents=img, **kw)
    assert lat.shape == (1, 16, 3, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()
    lat2 = pipe.generate_latents(text, mask, pooled, image_latents=img * -1.0, **kw)
    assert np.abs(np.asarray(lat) - np.asarray(lat2)).max() > 1e-6


def test_hyvideo_int8_quant_parity(setup):
    """W8A8 int8 block linears (utils/quant.quantize_linears_int8) track the
    fp32 forward within int8-matmul error — exercises the sliced single-
    stream linear1/linear2 paths with per-output-channel wscale slicing."""
    from sparse_videogen_tpu.utils.quant import quantize_linears_int8

    params, x, t, g, text, mask, text2 = setup
    grid = (2, 4, 6)
    layout = VideoLayout(num_frames=grid[0], frame_size=grid[1] * grid[2],
                         context_length=CFG.text_len, text_position=TextPosition.LAST)
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    rt = DenseRuntime(plan, prompt_length=5)

    qparams = dict(params)
    for key in ("double_blocks", "single_blocks"):
        qparams[key] = quantize_linears_int8(params[key], min_size=1 << 8)

    run = lambda p: np.asarray(HM.hyvideo_forward(
        p, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
        jnp.asarray(mask), jnp.asarray(text2), guidance=jnp.asarray(g),
        attention=rt)[0])
    ref, got = run(params), run(qparams)
    assert np.isfinite(got).all()
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel
    assert np.abs(got - ref).max() > 0  # int8 actually engaged


def test_hyvideo_sap_runtime(setup):
    """SAPRuntime through the full hyvideo forward (text-last layout):
    force_density=1.0 must equal the masked dense runtime, and the k-means
    state carry must initialize on the first (cold) step. This is the path
    scripts/bench_hyvideo.py times for the SVG2 e2e number."""
    from sparse_videogen_tpu.config import SAPConfig
    from sparse_videogen_tpu.sparse.runtimes import SAPRuntime

    params, x, t, g, text, mask, text2 = setup
    grid = (2, 4, 6)
    layout = VideoLayout(num_frames=grid[0], frame_size=grid[1] * grid[2],
                         context_length=CFG.text_len, text_position=TextPosition.LAST,
                         prompt_length=5)
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    nl = CFG.mm_double_blocks_depth + CFG.mm_single_blocks_depth

    def run(rt, st=None):
        consts = rt.consts()
        if st is None:
            st = rt.init_state(CFG.heads_num, CFG.head_dim, nl)
        out, new_st = HM.hyvideo_forward(
            params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
            jnp.asarray(mask), jnp.asarray(text2), guidance=jnp.asarray(g),
            attention=rt, attn_states=st, attn_consts=consts,
            rng=jax.random.PRNGKey(3))
        return np.asarray(out), new_st

    sap_cfg = SAPConfig(num_q_centroids=3, num_k_centroids=4, kmeans_iter_init=4,
                        kmeans_iter_step=2, block_q=128, block_kv=128,
                        max_runs=6, force_density=1.0)
    warm = WarmupSchedule(first_layers=0, first_times=1001.0)
    got, st1 = run(SAPRuntime(plan, sap_cfg, warm))
    ref, _ = run(DenseRuntime(plan, prompt_length=5))
    assert bool(np.asarray(st1.initialized).all())
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-5, rel
    # warm step (carried centroids) stays finite and close to dense at fd=1
    got2, _ = run(SAPRuntime(plan, sap_cfg, warm), st=st1)
    rel2 = np.linalg.norm(got2 - ref) / np.linalg.norm(ref)
    assert rel2 < 2e-5, rel2
