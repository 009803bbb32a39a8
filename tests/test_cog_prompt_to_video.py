"""CogVideoX raw prompt + image -> video on a tiny synthetic checkpoint.

Builds a diffusers-layout model_dir (transformer/text_encoder/vae +
spiece.model) and drives the cog_i2v CLI end-to-end the way the reference
entry does (/root/reference/cog_inference.py: load pipeline, sample_image).
Covers: T5 tokenizer+encoder from files, cog DiT converter, CogVideoX VAE
encode (pixel image conditioning) and decode (.y4m out)."""

import json
import os

import numpy as np
import pytest

from sparse_videogen_tpu.models.cog import model as CM
from sparse_videogen_tpu.models.cog import vae as CV
from tests.test_checkpoint import make_sd_cog, make_sd_cog_vae
from tests.test_prompt_to_video import _save_st, _write_spiece


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
DIT_CFG = CM.CogConfig(num_layers=2, hidden_size=64, heads_num=4, head_dim=16,
                       text_len=10, text_dim=16, time_embed_dim=48,
                       in_channels=8, out_channels=4, ofs_embed=True)
VAE_CFG = CV.CogVAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                          latent_channels=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cog_ckpt")
    _save_st(d / "transformer", make_sd_cog(DIT_CFG))
    with open(d / "transformer" / "config.json", "w") as f:
        json.dump({"num_layers": 2, "num_attention_heads": 4, "attention_head_dim": 16,
                   "max_text_seq_length": 10, "text_embed_dim": 16,
                   "in_channels": 8, "out_channels": 4, "patch_size": 2,
                   "patch_size_t": 2, "time_embed_dim": 48, "ofs_embed_dim": 48}, f)

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

    _save_st(d / "vae", make_sd_cog_vae(VAE_CFG))
    with open(d / "vae" / "config.json", "w") as f:
        json.dump({"block_out_channels": [8, 16, 16, 16], "layers_per_block": 1,
                   "latent_channels": 4, "norm_num_groups": 4,
                   "scaling_factor": 0.7, "invert_scale_latents": True,
                   "temporal_compression_ratio": 4}, f)
    return str(d)


@pytest.mark.pipeline_smoke
def test_cog_cli_image_to_video(model_dir, tmp_path):
    from sparse_videogen_tpu.cli import cog_i2v

    try:  # exercise the VAE-encode path with a real image file if PIL exists
        from PIL import Image

        img = str(tmp_path / "cond.png")
        Image.fromarray(np.full((40, 48, 3), 128, np.uint8)).save(img)
    except ImportError:  # fall back to precomputed-latents conditioning
        img = str(tmp_path / "cond.npy")
        np.save(img, np.zeros((1, 4, 1, 4, 4), np.float32))

    out = str(tmp_path / "out.npz")
    cog_i2v.main([
        "--prompt", "a cat.",
        "--model_dir", model_dir,
        "--image_path", img,
        "--pattern", "SVG",
        "--height", "32", "--width", "32", "--num_frames", "9",
        "--num_step", "2",
        "--output_path", out,
    ])
    y4m = str(tmp_path / "out.y4m")
    assert os.path.isfile(y4m)
    with open(y4m, "rb") as f:
        assert f.readline().startswith(b"YUV4MPEG2")
