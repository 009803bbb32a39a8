"""HunyuanVideo raw prompt -> video on a tiny synthetic checkpoint.

Drives the hyvideo_t2v CLI exactly as a user would (reference flow:
hyvideo_t2v_inference.py): LLaMA template + crop_start text encoding, CLIP-L
pooled, DiT denoise (SVG pattern), causal-3D VAE decode, y4m out.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _save_st(path, sd):
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file(sd, os.path.join(path, "model.safetensors"))


def _word_tokenizer(path, vocab_words, pad="<pad>"):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {pad: 0, "<unk>": 1}
    for w in vocab_words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    os.makedirs(path, exist_ok=True)
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"pad_token": pad}, f)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import torch
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaModel

    from tests.test_checkpoint import test_convert_hyvideo_dit_structure  # noqa: F401
    from tests.test_hyvideo_vae import CFG as VAE_CFG  # tiny vae config

    d = tmp_path_factory.mktemp("hy_ckpt")
    words = "a cat walks on the grass realistic video of some".split()

    # --- transformer (reuse the structural test's builder via direct build) ---
    from sparse_videogen_tpu.models.hyvideo import model as HM

    cfg = HM.HyVideoConfig(hidden_size=64, heads_num=1, mm_double_blocks_depth=1,
                           mm_single_blocks_depth=1, rope_dim_list=(16, 24, 24),
                           text_states_dim=32, text_states_dim_2=24, text_len=12)
    # synthesize a reference-named state dict by round-tripping our init
    params = HM.init_hyvideo_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sd = {}

    def put_lin(key, p):
        sd[f"{key}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{key}.bias"] = np.asarray(p["b"])

    def put_ln(key, p):
        sd[f"{key}.weight"] = np.asarray(p["w"])
        sd[f"{key}.bias"] = np.asarray(p["b"])

    pt, ph, pw = cfg.patch_size
    w = np.asarray(params["img_in"]["w"]).T.reshape(cfg.hidden_size, cfg.in_channels, pt, ph, pw)
    sd["img_in.proj.weight"] = w
    sd["img_in.proj.bias"] = np.asarray(params["img_in"]["b"])
    put_lin("time_in.mlp.0", params["time_in"]["fc1"]); put_lin("time_in.mlp.2", params["time_in"]["fc2"])
    put_lin("vector_in.in_layer", params["vector_in"]["fc1"]); put_lin("vector_in.out_layer", params["vector_in"]["fc2"])
    put_lin("guidance_in.mlp.0", params["guidance_in"]["fc1"]); put_lin("guidance_in.mlp.2", params["guidance_in"]["fc2"])
    put_lin("txt_in.input_embedder", params["txt_in"]["input_embedder"])
    put_lin("txt_in.t_embedder.mlp.0", params["txt_in"]["t_embedder"]["fc1"])
    put_lin("txt_in.t_embedder.mlp.2", params["txt_in"]["t_embedder"]["fc2"])
    put_lin("txt_in.c_embedder.linear_1", params["txt_in"]["c_embedder"]["fc1"])
    put_lin("txt_in.c_embedder.linear_2", params["txt_in"]["c_embedder"]["fc2"])
    take = lambda tree, i: jax.tree.map(lambda x: x[i], tree)
    for i in range(cfg.refiner_depth):
        rb = take(params["txt_in"]["blocks"], i)
        b = f"txt_in.individual_token_refiner.blocks.{i}"
        put_ln(f"{b}.norm1", rb["norm1"]); put_lin(f"{b}.self_attn_qkv", rb["qkv"])
        put_lin(f"{b}.self_attn_proj", rb["proj"]); put_ln(f"{b}.norm2", rb["norm2"])
        put_lin(f"{b}.mlp.fc1", rb["mlp"]["fc1"]); put_lin(f"{b}.mlp.fc2", rb["mlp"]["fc2"])
        put_lin(f"{b}.adaLN_modulation.1", rb["adaln"])
    for i in range(cfg.mm_double_blocks_depth):
        db = take(params["double_blocks"], i)
        b = f"double_blocks.{i}"
        for s in ("img", "txt"):
            put_lin(f"{b}.{s}_mod.linear", db[f"{s}_mod"])
            put_lin(f"{b}.{s}_attn_qkv", db[f"{s}_qkv"])
            sd[f"{b}.{s}_attn_q_norm.weight"] = np.asarray(db[f"{s}_q_norm"])
            sd[f"{b}.{s}_attn_k_norm.weight"] = np.asarray(db[f"{s}_k_norm"])
            put_lin(f"{b}.{s}_attn_proj", db[f"{s}_proj"])
            put_lin(f"{b}.{s}_mlp.fc1", db[f"{s}_mlp"]["fc1"]); put_lin(f"{b}.{s}_mlp.fc2", db[f"{s}_mlp"]["fc2"])
    for i in range(cfg.mm_single_blocks_depth):
        sb = take(params["single_blocks"], i)
        b = f"single_blocks.{i}"
        put_lin(f"{b}.modulation.linear", sb["modulation"])
        put_lin(f"{b}.linear1", sb["linear1"]); put_lin(f"{b}.linear2", sb["linear2"])
        sd[f"{b}.q_norm.weight"] = np.asarray(sb["q_norm"])
        sd[f"{b}.k_norm.weight"] = np.asarray(sb["k_norm"])
    put_lin("final_layer.adaLN_modulation.1", params["final_adaln"])
    put_lin("final_layer.linear", params["final_linear"])
    _save_st(d / "transformer", {k: v.astype(np.float32) for k, v in sd.items()})
    with open(d / "transformer" / "config.json", "w") as f:
        json.dump({"hidden_size": 64, "heads_num": 1, "mm_double_blocks_depth": 1,
                   "mm_single_blocks_depth": 1, "rope_dim_list": [16, 24, 24],
                   "text_states_dim": 32, "text_states_dim_2": 24, "text_len": 12}, f)

    # --- LLaMA text encoder ---
    torch.manual_seed(0)
    hf = LlamaModel(HFLlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                                  num_hidden_layers=3, num_attention_heads=4,
                                  num_key_value_heads=2, rope_theta=500000.0))
    _save_st(d / "text_encoder", {k: v.numpy() for k, v in hf.state_dict().items()})
    with open(d / "text_encoder" / "config.json", "w") as f:
        json.dump({"vocab_size": 64, "dim": 32, "ffn_dim": 48, "num_layers": 3,
                   "num_heads": 4, "num_kv_heads": 2}, f)
    _word_tokenizer(str(d / "text_encoder"), words)

    # --- CLIP ---
    torch.manual_seed(1)
    clip = CLIPTextModel(HFCLIPTextConfig(vocab_size=64, hidden_size=24, intermediate_size=48,
                                          num_hidden_layers=2, num_attention_heads=4,
                                          max_position_embeddings=77, hidden_act="quick_gelu"))
    _save_st(d / "text_encoder_2", {k: v.numpy() for k, v in clip.state_dict().items()})
    with open(d / "text_encoder_2" / "config.json", "w") as f:
        json.dump({"vocab_size": 64, "dim": 24, "ffn_dim": 48, "num_layers": 2,
                   "num_heads": 4, "max_positions": 77}, f)
    _word_tokenizer(str(d / "text_encoder_2"), words)

    # --- VAE (z must equal DiT in_channels=16) ---
    from tests.test_hyvideo_vae import CFG as _  # noqa: F811
    from sparse_videogen_tpu.models.hyvideo import vae as HVV

    vcfg = HVV.HyVideoVAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                                latent_channels=16, norm_num_groups=4)
    vparams = HVV.init_hyvideo_vae_params(jax.random.PRNGKey(2), vcfg)
    vsd = {}

    def put_conv(key, p):
        vsd[f"{key}.weight"] = np.asarray(p["w"]).transpose(4, 3, 0, 1, 2)
        vsd[f"{key}.bias"] = np.asarray(p["b"])

    def put_gn(key, p):
        vsd[f"{key}.weight"] = np.asarray(p["g"])
        vsd[f"{key}.bias"] = np.asarray(p["b"])

    def put_res(prefix, p):
        put_gn(f"{prefix}.norm1", p["norm1"]); put_conv(f"{prefix}.conv1.conv", p["conv1"])
        put_gn(f"{prefix}.norm2", p["norm2"]); put_conv(f"{prefix}.conv2.conv", p["conv2"])
        if "shortcut" in p:
            put_conv(f"{prefix}.conv_shortcut.conv", p["shortcut"])

    def put_mid(prefix, p):
        put_res(f"{prefix}.resnets.0", p["res0"])
        put_gn(f"{prefix}.attentions.0.group_norm", p["attn"]["norm"])
        for nm, q in (("to_q", "q"), ("to_k", "k"), ("to_v", "v"), ("to_out.0", "o")):
            vsd[f"{prefix}.attentions.0.{nm}.weight"] = np.asarray(p["attn"][q]["w"]).T
            vsd[f"{prefix}.attentions.0.{nm}.bias"] = np.asarray(p["attn"][q]["b"])
        put_res(f"{prefix}.resnets.1", p["res1"])

    e = vparams["encoder"]
    put_conv("encoder.conv_in.conv", e["conv_in"])
    for i, blk in enumerate(e["down"]):
        for j, r in enumerate(blk["res"]):
            put_res(f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "ds" in blk:
            put_conv(f"encoder.down_blocks.{i}.downsamplers.0.conv.conv", blk["ds"])
    put_mid("encoder.mid_block", e["mid"])
    put_gn("encoder.conv_norm_out", e["norm_out"]); put_conv("encoder.conv_out.conv", e["conv_out"])
    dec = vparams["decoder"]
    put_conv("decoder.conv_in.conv", dec["conv_in"])
    put_mid("decoder.mid_block", dec["mid"])
    for i, blk in enumerate(dec["up"]):
        for j, r in enumerate(blk["res"]):
            put_res(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "us" in blk:
            put_conv(f"decoder.up_blocks.{i}.upsamplers.0.conv.conv", blk["us"])
    put_gn("decoder.conv_norm_out", dec["norm_out"]); put_conv("decoder.conv_out.conv", dec["conv_out"])
    put_conv("quant_conv", vparams["quant_conv"])
    put_conv("post_quant_conv", vparams["post_quant_conv"])
    _save_st(d / "vae", {k: v.astype(np.float32) for k, v in vsd.items()})
    with open(d / "vae" / "config.json", "w") as f:
        json.dump({"block_out_channels": [8, 16, 16, 16], "layers_per_block": 1,
                   "latent_channels": 16, "norm_num_groups": 4}, f)
    return str(d)


@pytest.mark.pipeline_smoke
def test_hyvideo_cli_prompt_to_video(model_dir, tmp_path):
    from sparse_videogen_tpu.cli import hyvideo_t2v

    out = str(tmp_path / "hy.npz")
    hyvideo_t2v.main([
        "--prompt", "a cat walks on the grass",
        "--model_dir", model_dir,
        "--pattern", "SVG",
        "--height", "64", "--width", "64", "--num_frames", "5",
        "--num_inference_steps", "2",
        "--output_file", out,
    ])
    y4m = str(tmp_path / "hy.y4m")
    assert os.path.isfile(y4m)
    with open(y4m, "rb") as f:
        assert f.readline().startswith(b"YUV4MPEG2")
