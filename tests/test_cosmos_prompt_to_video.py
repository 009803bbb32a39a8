"""Cosmos raw prompt -> video on a tiny synthetic checkpoint.

Builds a diffusers-layout model_dir (transformer/text_encoder/vae +
spiece.model) and drives the cosmos_t2v CLI end-to-end the way the reference
entry does (/root/reference/cosmos_t2v_inference.py: load pipeline,
generate, export_to_video). Covers: T5 tokenizer+encoder from files, cosmos
DiT converter, the Cosmos tokenizer VAE converter (Cosmos-Tokenizer key
naming) and decode to .y4m."""

import json

import numpy as np
import pytest

from sparse_videogen_tpu.models.cosmos import model as CM
from sparse_videogen_tpu.models.cosmos import vae as CV
from tests.test_checkpoint import make_sd_cosmos
from tests.test_cosmos_vae import _fake_sd
from tests.test_prompt_to_video import _save_st, _write_spiece


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

DIT_CFG = CM.CosmosConfig(num_attention_heads=2, attention_head_dim=32,
                          num_layers=2, text_embed_dim=16, adaln_lora_dim=8,
                          max_size=(4, 8, 8))
VAE_CFG = CV.CosmosVAEConfig(base_channels=16, channels_mult=(1, 2),
                             num_res_blocks=1, latent_channels=16)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cosmos_ckpt")
    _save_st(d / "transformer", make_sd_cosmos(DIT_CFG))
    with open(d / "transformer" / "config.json", "w") as f:
        json.dump({"num_attention_heads": 2, "attention_head_dim": 32,
                   "num_layers": 2, "text_embed_dim": 16, "adaln_lora_dim": 8,
                   "max_size": [4, 8, 8]}, f)

    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    torch.manual_seed(0)
    hf = T5EncoderModel(HFT5Config(vocab_size=32, d_model=16, d_kv=8, d_ff=24,
                                   num_layers=2, num_heads=2,
                                   relative_attention_num_buckets=8,
                                   dropout_rate=0.0)).eval()
    _save_st(d / "text_encoder", {k: v.numpy() for k, v in hf.state_dict().items()})
    with open(d / "text_encoder" / "config.json", "w") as f:
        json.dump({"vocab_size": 32, "dim": 16, "dim_attn": 16, "dim_ffn": 24,
                   "num_heads": 2, "num_layers": 2, "num_buckets": 8,
                   "gated_ffn": False, "shared_rel_bias": True, "ffn_act": "relu"}, f)
    _write_spiece(str(d))

    _save_st(d / "vae", _fake_sd(VAE_CFG))
    with open(d / "vae" / "config.json", "w") as f:
        json.dump({"base_channels": 16, "channels_mult": [1, 2],
                   "num_res_blocks": 1, "latent_channels": 16}, f)
    return str(d)


@pytest.mark.pipeline_smoke
def test_cosmos_cli_prompt_to_video(model_dir, tmp_path):
    from sparse_videogen_tpu.cli import cosmos_t2v

    out = tmp_path / "cosmos.y4m"
    cosmos_t2v.main([
        "--prompt", "a robot walks through a city.",
        "--model_dir", model_dir,
        "--pattern", "SVG",
        "--height", "32", "--width", "32", "--num_frames", "9",
        "--num_inference_steps", "2",
        "--output_file", str(out),
    ])
    data = out.read_bytes()
    assert data[:9] == b"YUV4MPEG2" and len(data) > 1000
