"""Checkpoint converters: synthetic reference-named state dicts must convert
into pytrees with exactly the structure/shapes of our random init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.io import checkpoint as CK
from sparse_videogen_tpu.models.common import t5 as T5
from sparse_videogen_tpu.models.wan import model as WM
from sparse_videogen_tpu.models.wan import vae as V


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def tree_shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


def make_sd_wan_orig(cfg):
    rng = np.random.default_rng(0)
    sd = {}
    d = cfg.dim

    def lin(key, di, do, bias=True):
        sd[f"{key}.weight"] = rng.standard_normal((do, di)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal((do,)).astype(np.float32)

    pt, ph, pw = cfg.patch_size
    sd["patch_embedding.weight"] = rng.standard_normal((d, cfg.in_dim, pt, ph, pw)).astype(np.float32)
    sd["patch_embedding.bias"] = rng.standard_normal((d,)).astype(np.float32)
    lin("text_embedding.0", cfg.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", cfg.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, 6 * d)
    sd["head.modulation"] = rng.standard_normal((1, 2, d)).astype(np.float32)
    lin("head.head", d, pt * ph * pw * cfg.out_dim)
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        sd[f"{b}.modulation"] = rng.standard_normal((1, 6, d)).astype(np.float32)
        for m in ["self_attn", "cross_attn"]:
            for nm in ["q", "k", "v", "o"]:
                lin(f"{b}.{m}.{nm}", d, d)
            sd[f"{b}.{m}.norm_q.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{m}.norm_k.weight"] = np.ones(d, np.float32)
        sd[f"{b}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"{b}.norm3.bias"] = np.zeros(d, np.float32)
        lin(f"{b}.ffn.0", d, cfg.ffn_dim)
        lin(f"{b}.ffn.2", cfg.ffn_dim, d)
    return sd


def make_sd_diffusers(cfg):
    sd_orig = make_sd_wan_orig(cfg)
    ren = {}
    for k, v in sd_orig.items():
        k2 = (
            k.replace("text_embedding.0", "condition_embedder.text_embedder.linear_1")
            .replace("text_embedding.2", "condition_embedder.text_embedder.linear_2")
            .replace("time_embedding.0", "condition_embedder.time_embedder.linear_1")
            .replace("time_embedding.2", "condition_embedder.time_embedder.linear_2")
            .replace("time_projection.1", "condition_embedder.time_proj")
            .replace("head.modulation", "scale_shift_table")
            .replace("head.head", "proj_out")
            .replace(".modulation", ".scale_shift_table")
            .replace("self_attn.q", "attn1.to_q")
            .replace("self_attn.k", "attn1.to_k")
            .replace("self_attn.v", "attn1.to_v")
            .replace("self_attn.o", "attn1.to_out.0")
            .replace("self_attn.norm_q", "attn1.norm_q")
            .replace("self_attn.norm_k", "attn1.norm_k")
            .replace("cross_attn.q", "attn2.to_q")
            .replace("cross_attn.k", "attn2.to_k")
            .replace("cross_attn.v", "attn2.to_v")
            .replace("cross_attn.o", "attn2.to_out.0")
            .replace("cross_attn.norm_q", "attn2.norm_q")
            .replace("cross_attn.norm_k", "attn2.norm_k")
            .replace("norm3.", "norm2.")
            .replace("ffn.0", "ffn.net.0.proj")
            .replace("ffn.2", "ffn.net.2")
        )
        ren[k2] = v
    return ren


CFG = WM.WanConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2, freq_dim=16, text_dim=24, text_len=8)


@pytest.mark.parametrize("fmt", ["orig", "diffusers"])
def test_convert_wan_dit_structure_and_forward(fmt):
    sd = make_sd_wan_orig(CFG) if fmt == "orig" else make_sd_diffusers(CFG)
    params = CK.convert_wan_dit(sd, CFG, dtype=jnp.float32)
    ref = WM.init_wan_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    assert tree_shapes(params) == tree_shapes(ref)
    # converted params actually run
    from sparse_videogen_tpu.config import SVGConfig, VideoLayout
    from sparse_videogen_tpu.sparse.runtimes import DenseRuntime
    from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan

    layout = VideoLayout(num_frames=2, frame_size=8)
    plan = make_svg1_plan(layout, SVGConfig(), block_q=128, block_kv=128)
    x = jnp.ones((1, CFG.in_dim, 2, 8, 4), jnp.float32)
    out, _ = WM.wan_forward(
        params, CFG, x, jnp.asarray([500.0]), jnp.ones((1, 8, 24)),
        attention=DenseRuntime(plan),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_convert_wan_dit_orig_equals_diffusers():
    p1 = CK.convert_wan_dit(make_sd_wan_orig(CFG), CFG, dtype=jnp.float32)
    p2 = CK.convert_wan_dit(make_sd_diffusers(CFG), CFG, dtype=jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), p1, p2)


def test_convert_wan_vae_structure():
    cfg = V.WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                         temporal_downsample=(False, True))
    ref = V.init_wan_vae_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    sd = {}

    def c3(key, co, ci, kt=3, kh=3, kw=3):
        sd[f"{key}.weight"] = rng.standard_normal((co, ci, kt, kh, kw)).astype(np.float32)
        sd[f"{key}.bias"] = rng.standard_normal((co,)).astype(np.float32)

    def c2(key, co, ci, k=3):
        sd[f"{key}.weight"] = rng.standard_normal((co, ci, k, k)).astype(np.float32)
        sd[f"{key}.bias"] = rng.standard_normal((co,)).astype(np.float32)

    def res(prefix, ci, co):
        sd[f"{prefix}.residual.0.gamma"] = np.ones((ci, 1, 1, 1), np.float32)
        c3(f"{prefix}.residual.2", co, ci)
        sd[f"{prefix}.residual.3.gamma"] = np.ones((co, 1, 1, 1), np.float32)
        c3(f"{prefix}.residual.6", co, co)
        if ci != co:
            c3(f"{prefix}.shortcut", co, ci, 1, 1, 1)

    def attn(prefix, c):
        sd[f"{prefix}.norm.gamma"] = np.ones((c, 1, 1), np.float32)
        c2(f"{prefix}.to_qkv", 3 * c, c, 1)
        c2(f"{prefix}.proj", c, c, 1)

    # encoder: dims [8, 8, 16, 16] (dim_mult 1,2,2); resamples end stages 0,1
    c3("encoder.conv1", 8, 3)
    res("encoder.downsamples.0", 8, 8)
    c2("encoder.downsamples.1.resample.1", 8, 8)
    res("encoder.downsamples.2", 8, 16)
    c2("encoder.downsamples.3.resample.1", 16, 16)
    c3("encoder.downsamples.3.time_conv", 16, 16, 3, 1, 1)
    res("encoder.downsamples.4", 16, 16)
    res("encoder.middle.0", 16, 16)
    attn("encoder.middle.1", 16)
    res("encoder.middle.2", 16, 16)
    sd["encoder.head.0.gamma"] = np.ones((16, 1, 1, 1), np.float32)
    c3("encoder.head.2", 8, 16)

    # decoder: dims [16, 16, 16, 8], in halved after each spatial upsample
    c3("decoder.conv1", 16, 4)
    res("decoder.middle.0", 16, 16)
    attn("decoder.middle.1", 16)
    res("decoder.middle.2", 16, 16)
    res("decoder.upsamples.0", 16, 16)
    res("decoder.upsamples.1", 16, 16)
    c3("decoder.upsamples.2.time_conv", 32, 16, 3, 1, 1)
    c2("decoder.upsamples.2.resample.1", 8, 16)
    res("decoder.upsamples.3", 8, 16)
    res("decoder.upsamples.4", 16, 16)
    c2("decoder.upsamples.5.resample.1", 8, 16)
    res("decoder.upsamples.6", 8, 8)
    res("decoder.upsamples.7", 8, 8)
    sd["decoder.head.0.gamma"] = np.ones((8, 1, 1, 1), np.float32)
    c3("decoder.head.2", 3, 8)

    c3("conv1", 8, 8, 1, 1, 1)
    c3("conv2", 4, 4, 1, 1, 1)
    params = CK.convert_wan_vae(sd, cfg)
    assert tree_shapes(params) == tree_shapes(ref)


def test_convert_umt5_structure():
    cfg = T5.T5Config(vocab_size=50, dim=16, dim_attn=16, dim_ffn=24, num_heads=2,
                      num_layers=2, num_buckets=8)
    ref = T5.init_t5_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    sd = {"token_embedding.weight": rng.standard_normal((50, 16)).astype(np.float32),
          "norm.weight": np.ones(16, np.float32)}
    for i in range(2):
        b = f"blocks.{i}"
        for nm in ["q", "k", "v", "o"]:
            sd[f"{b}.attn.{nm}.weight"] = rng.standard_normal((16, 16)).astype(np.float32)
        sd[f"{b}.norm1.weight"] = np.ones(16, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(16, np.float32)
        sd[f"{b}.pos_embedding.embedding.weight"] = rng.standard_normal((8, 2)).astype(np.float32)
        sd[f"{b}.ffn.gate.0.weight"] = rng.standard_normal((24, 16)).astype(np.float32)
        sd[f"{b}.ffn.fc1.weight"] = rng.standard_normal((24, 16)).astype(np.float32)
        sd[f"{b}.ffn.fc2.weight"] = rng.standard_normal((16, 24)).astype(np.float32)
    params = CK.convert_umt5(sd, cfg, dtype=jnp.float32)
    assert tree_shapes(params) == tree_shapes(ref)
    out = T5.t5_encode(params, cfg, jnp.zeros((1, 6), jnp.int32), jnp.ones((1, 6), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_hyvideo_dit_structure():
    from sparse_videogen_tpu.models.hyvideo import model as HM

    cfg = HM.HyVideoConfig(hidden_size=32, heads_num=2, mm_double_blocks_depth=2,
                           mm_single_blocks_depth=2, rope_dim_list=(4, 6, 6),
                           text_states_dim=24, text_states_dim_2=12, text_len=8)
    ref = HM.init_hyvideo_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    sd = {}
    h, mh = 32, int(32 * cfg.mlp_width_ratio)
    hd = cfg.head_dim

    def lin(key, di, do, bias=True):
        sd[f"{key}.weight"] = rng.standard_normal((do, di)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal((do,)).astype(np.float32)

    def ln(key, d):
        sd[f"{key}.weight"] = np.ones(d, np.float32)
        sd[f"{key}.bias"] = np.zeros(d, np.float32)

    pt, ph, pw = cfg.patch_size
    sd["img_in.proj.weight"] = rng.standard_normal((h, cfg.in_channels, pt, ph, pw)).astype(np.float32)
    sd["img_in.proj.bias"] = rng.standard_normal((h,)).astype(np.float32)
    lin("time_in.mlp.0", 256, h); lin("time_in.mlp.2", h, h)
    lin("vector_in.in_layer", cfg.text_states_dim_2, h); lin("vector_in.out_layer", h, h)
    lin("guidance_in.mlp.0", 256, h); lin("guidance_in.mlp.2", h, h)
    lin("txt_in.input_embedder", cfg.text_states_dim, h)
    lin("txt_in.t_embedder.mlp.0", 256, h); lin("txt_in.t_embedder.mlp.2", h, h)
    lin("txt_in.c_embedder.linear_1", cfg.text_states_dim, h); lin("txt_in.c_embedder.linear_2", h, h)
    for i in range(cfg.refiner_depth):
        b = f"txt_in.individual_token_refiner.blocks.{i}"
        ln(f"{b}.norm1", h); lin(f"{b}.self_attn_qkv", h, 3 * h); lin(f"{b}.self_attn_proj", h, h)
        ln(f"{b}.norm2", h); lin(f"{b}.mlp.fc1", h, 4 * h); lin(f"{b}.mlp.fc2", 4 * h, h)
        lin(f"{b}.adaLN_modulation.1", h, 2 * h)
    for i in range(cfg.mm_double_blocks_depth):
        b = f"double_blocks.{i}"
        for s in ("img", "txt"):
            lin(f"{b}.{s}_mod.linear", h, 6 * h)
            lin(f"{b}.{s}_attn_qkv", h, 3 * h)
            sd[f"{b}.{s}_attn_q_norm.weight"] = np.ones(hd, np.float32)
            sd[f"{b}.{s}_attn_k_norm.weight"] = np.ones(hd, np.float32)
            lin(f"{b}.{s}_attn_proj", h, h)
            lin(f"{b}.{s}_mlp.fc1", h, mh); lin(f"{b}.{s}_mlp.fc2", mh, h)
    for i in range(cfg.mm_single_blocks_depth):
        b = f"single_blocks.{i}"
        lin(f"{b}.modulation.linear", h, 3 * h)
        lin(f"{b}.linear1", h, 3 * h + mh); lin(f"{b}.linear2", h + mh, h)
        sd[f"{b}.q_norm.weight"] = np.ones(hd, np.float32)
        sd[f"{b}.k_norm.weight"] = np.ones(hd, np.float32)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    lin("final_layer.linear", h, pt * ph * pw * cfg.out_channels)

    params = CK.convert_hyvideo_dit(sd, cfg, dtype=jnp.float32)
    assert tree_shapes(params) == tree_shapes(ref)


def test_convert_hyvideo_vae_structure():
    from sparse_videogen_tpu.models.hyvideo import vae as HV

    cfg = HV.HyVideoVAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                              latent_channels=4, norm_num_groups=4)
    ref = HV.init_hyvideo_vae_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    sd = {}

    def c3(key, co, ci, k=3):
        sd[f"{key}.weight"] = rng.standard_normal((co, ci, k, k, k)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(co, np.float32)

    def ln(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def lin(key, d):
        sd[f"{key}.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(d, np.float32)

    def res(prefix, ci, co):
        ln(f"{prefix}.norm1", ci); c3(f"{prefix}.conv1.conv", co, ci)
        ln(f"{prefix}.norm2", co); c3(f"{prefix}.conv2.conv", co, co)
        if ci != co:
            c3(f"{prefix}.conv_shortcut.conv", co, ci, 1)

    def mid(prefix, c):
        res(f"{prefix}.resnets.0", c, c)
        ln(f"{prefix}.attentions.0.group_norm", c)
        for nm in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{prefix}.attentions.0.{nm}", c)
        res(f"{prefix}.resnets.1", c, c)

    bo = cfg.block_out_channels
    c3("encoder.conv_in.conv", bo[0], 3)
    ch = bo[0]
    for i in range(4):
        res(f"encoder.down_blocks.{i}.resnets.0", ch, bo[i])
        ch = bo[i]
        if cfg.spatial_ds(i) or cfg.temporal_ds(i):
            c3(f"encoder.down_blocks.{i}.downsamplers.0.conv.conv", bo[i], bo[i])
    mid("encoder.mid_block", bo[-1])
    ln("encoder.conv_norm_out", bo[-1]); c3("encoder.conv_out.conv", 2 * cfg.latent_channels, bo[-1])
    rev = list(reversed(bo))
    c3("decoder.conv_in.conv", rev[0], cfg.latent_channels)
    mid("decoder.mid_block", rev[0])
    ch = rev[0]
    for i in range(4):
        for j in range(cfg.layers_per_block + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}", ch if j == 0 else rev[i], rev[i])
        ch = rev[i]
        if cfg.spatial_ds(i) or cfg.temporal_ds(i):
            c3(f"decoder.up_blocks.{i}.upsamplers.0.conv.conv", rev[i], rev[i])
    ln("decoder.conv_norm_out", bo[0]); c3("decoder.conv_out.conv", 3, bo[0])
    sd["quant_conv.weight"] = rng.standard_normal((8, 8, 1, 1, 1)).astype(np.float32)
    sd["quant_conv.bias"] = np.zeros(8, np.float32)
    sd["post_quant_conv.weight"] = rng.standard_normal((4, 4, 1, 1, 1)).astype(np.float32)
    sd["post_quant_conv.bias"] = np.zeros(4, np.float32)

    params = CK.convert_hyvideo_vae(sd, cfg)
    assert tree_shapes(params) == tree_shapes(ref)


def make_sd_cosmos(cfg, seed=5):
    rng = np.random.default_rng(seed)
    sd = {}
    h = cfg.hidden_size

    def lin(key, di, do, bias=False):
        sd[f"{key}.weight"] = rng.standard_normal((do, di)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal((do,)).astype(np.float32)

    import math as _m
    lin("patch_embed.proj", cfg.patch_in_channels * _m.prod(cfg.patch_size), h)
    lin("time_embed.t_embedder.linear_1", h, h)
    lin("time_embed.t_embedder.linear_2", h, 3 * h)
    sd["time_embed.norm.weight"] = np.ones(h, np.float32)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        for n in ("norm1", "norm2", "norm3"):
            lin(f"{b}.{n}.linear_1", h, cfg.adaln_lora_dim)
            lin(f"{b}.{n}.linear_2", cfg.adaln_lora_dim, 3 * h)
        for a, kv in (("attn1", h), ("attn2", cfg.text_embed_dim)):
            lin(f"{b}.{a}.to_q", h, h); lin(f"{b}.{a}.to_k", kv, h)
            lin(f"{b}.{a}.to_v", kv, h); lin(f"{b}.{a}.to_out.0", h, h)
            sd[f"{b}.{a}.norm_q.weight"] = np.ones(cfg.attention_head_dim, np.float32)
            sd[f"{b}.{a}.norm_k.weight"] = np.ones(cfg.attention_head_dim, np.float32)
        lin(f"{b}.ff.net.0.proj", h, int(h * cfg.mlp_ratio))
        lin(f"{b}.ff.net.2", int(h * cfg.mlp_ratio), h)
    lin("norm_out.linear_1", h, cfg.adaln_lora_dim)
    lin("norm_out.linear_2", cfg.adaln_lora_dim, 2 * h)
    lin("proj_out", h, _m.prod(cfg.patch_size) * cfg.out_channels, bias=True)
    mt, mh, mw = (s // p for s, p in zip(cfg.max_size, cfg.patch_size))
    sd["learnable_pos_embed.pos_emb_t"] = rng.standard_normal((mt, h)).astype(np.float32)
    sd["learnable_pos_embed.pos_emb_h"] = rng.standard_normal((mh, h)).astype(np.float32)
    sd["learnable_pos_embed.pos_emb_w"] = rng.standard_normal((mw, h)).astype(np.float32)
    return sd


def test_convert_cosmos_dit_structure():
    from sparse_videogen_tpu.models.cosmos import model as CM

    cfg = CM.CosmosConfig(num_attention_heads=2, attention_head_dim=32, num_layers=2,
                          text_embed_dim=24, adaln_lora_dim=8, max_size=(4, 8, 8))
    ref = CM.init_cosmos_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = CK.convert_cosmos_dit(make_sd_cosmos(cfg), cfg, dtype=jnp.float32)
    assert tree_shapes(params) == tree_shapes(ref)


def make_sd_cog(cfg, seed=7):
    """Synthetic diffusers CogVideoXTransformer3DModel state dict."""
    rng = np.random.default_rng(seed)
    sd = {}
    h = cfg.hidden_size

    def lin(key, di, do):
        sd[f"{key}.weight"] = rng.standard_normal((do, di)).astype(np.float32)
        sd[f"{key}.bias"] = rng.standard_normal((do,)).astype(np.float32)

    def ln(key, d):
        sd[f"{key}.weight"] = np.ones(d, np.float32)
        sd[f"{key}.bias"] = np.zeros(d, np.float32)

    lin("time_embedding.linear_1", h, cfg.time_embed_dim)
    lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    if cfg.ofs_embed:
        lin("ofs_embedding.linear_1", cfg.time_embed_dim, cfg.time_embed_dim)
        lin("ofs_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    lin("patch_embed.proj",
        cfg.in_channels * cfg.patch_size_t * cfg.patch_size**2, h)
    lin("patch_embed.text_proj", cfg.text_dim, h)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        for n in ("norm1", "norm2"):
            lin(f"{b}.{n}.linear", cfg.time_embed_dim, 6 * h)
            ln(f"{b}.{n}.norm", h)
        for q in ("to_q", "to_k", "to_v"):
            lin(f"{b}.attn1.{q}", h, h)
        lin(f"{b}.attn1.to_out.0", h, h)
        ln(f"{b}.attn1.norm_q", cfg.head_dim)
        ln(f"{b}.attn1.norm_k", cfg.head_dim)
        lin(f"{b}.ff.net.0.proj", h, cfg.ffn_mult * h)
        lin(f"{b}.ff.net.2", cfg.ffn_mult * h, h)
    ln("norm_final", h)
    ln("norm_out.norm", h)
    lin("norm_out.linear", cfg.time_embed_dim, 2 * h)
    lin("proj_out", h, cfg.patch_size_t * cfg.patch_size**2 * cfg.out_channels)
    return sd


def test_convert_cog_dit_structure():
    from sparse_videogen_tpu.models.cog import model as CM

    cfg = CM.CogConfig(num_layers=2, hidden_size=64, heads_num=4, head_dim=16,
                       text_len=10, text_dim=32, time_embed_dim=48,
                       in_channels=32, ofs_embed=True)
    ref = CM.init_cog_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = CK.convert_cog_dit(make_sd_cog(cfg), cfg, dtype=jnp.float32)
    assert tree_shapes(params) == tree_shapes(ref)


def make_sd_cog_vae(cfg, seed=5):
    """Synthetic diffusers AutoencoderKLCogVideoX state dict."""
    rng = np.random.default_rng(seed)
    sd = {}

    def c3(key, co, ci, k=3):
        sd[f"{key}.weight"] = rng.standard_normal((co, ci, k, k, k)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(co, np.float32)

    def c2(key, co, ci):
        sd[f"{key}.weight"] = rng.standard_normal((co, ci, 3, 3)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(co, np.float32)

    def gn(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def sn(key, c):
        gn(f"{key}.norm_layer", c)
        c3(f"{key}.conv_y.conv", c, cfg.latent_channels, 1)
        c3(f"{key}.conv_b.conv", c, cfg.latent_channels, 1)

    def res(prefix, ci, co, spatial):
        norm = sn if spatial else gn
        norm(f"{prefix}.norm1", ci); c3(f"{prefix}.conv1.conv", co, ci)
        norm(f"{prefix}.norm2", co); c3(f"{prefix}.conv2.conv", co, co)
        if ci != co:
            c3(f"{prefix}.conv_shortcut", co, ci, 1)

    bo = cfg.block_out_channels
    c3("encoder.conv_in.conv", bo[0], 3)
    ch = bo[0]
    for i in range(4):
        res(f"encoder.down_blocks.{i}.resnets.0", ch, bo[i], False)
        ch = bo[i]
        if cfg.resample_spatial(i):
            c2(f"encoder.down_blocks.{i}.downsamplers.0.conv", bo[i], bo[i])
    for j in range(2):
        res(f"encoder.mid_block.resnets.{j}", bo[-1], bo[-1], False)
    gn("encoder.norm_out", bo[-1]); c3("encoder.conv_out.conv", 2 * cfg.latent_channels, bo[-1])
    rev = list(reversed(bo))
    c3("decoder.conv_in.conv", rev[0], cfg.latent_channels)
    for j in range(2):
        res(f"decoder.mid_block.resnets.{j}", rev[0], rev[0], True)
    ch = rev[0]
    for i in range(4):
        for j in range(cfg.layers_per_block + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}", ch if j == 0 else rev[i], rev[i], True)
        ch = rev[i]
        if cfg.resample_spatial(i):
            c2(f"decoder.up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i])
    sn("decoder.norm_out", bo[0]); c3("decoder.conv_out.conv", 3, bo[0])
    return sd


def test_convert_cog_vae_structure():
    from sparse_videogen_tpu.models.cog import vae as CV

    cfg = CV.CogVAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                          latent_channels=4, norm_num_groups=4)
    ref = CV.init_cog_vae_params(jax.random.PRNGKey(0), cfg)
    params = CK.convert_cog_vae(make_sd_cog_vae(cfg), cfg)
    assert tree_shapes(params) == tree_shapes(ref)


def test_save_load_pytree_roundtrip(tmp_path):
    """Converted-checkpoint cache: nested dict/list pytrees with mixed
    dtypes (incl. bf16) survive the safetensors round trip exactly."""
    rng = np.random.default_rng(0)
    params = {
        "blocks": [
            {"w": jnp.asarray(rng.standard_normal((4, 8)), jnp.bfloat16),
             "b": jnp.zeros((8,), jnp.float32)},
            {"w": jnp.asarray(rng.standard_normal((4, 8)), jnp.bfloat16)},
        ],
        "head": {"scale": jnp.asarray([2.0], jnp.float32),
                 "idx": jnp.arange(5, dtype=jnp.int32)},
    }
    d = str(tmp_path / "cache")
    CK.save_pytree(d, params)
    back = CK.load_pytree(d)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), back, params)
    assert back["blocks"][0]["w"].dtype == jnp.bfloat16
    up = CK.load_pytree(d, dtype=jnp.float32)
    assert up["blocks"][0]["w"].dtype == jnp.float32
    assert up["head"]["idx"].dtype == jnp.int32  # ints untouched
