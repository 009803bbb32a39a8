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
