"""Raw prompt -> video: the full user surface on a tiny synthetic checkpoint.

Builds a model_dir with transformer/umt5/vae safetensors (reference naming),
config.json files, and a synthetic spiece.model, then runs the wan_t2v CLI
exactly the way a user would (reference flow: wan_t2v_inference.py:72-166).
Asserts a playable .y4m comes out.
"""

import json
import os

import numpy as np
import pytest

from sparse_videogen_tpu.models.common import t5 as T5
from sparse_videogen_tpu.models.wan import model as WM
from tests.test_checkpoint import make_sd_wan_orig

CFG = WM.WanConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2, freq_dim=16,
                   text_dim=16, text_len=8)


def _save_st(path, sd):
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file(sd, os.path.join(path, "model.safetensors"))


def _write_spiece(path):
    try:
        from transformers.utils import sentencepiece_model_pb2_new as pb2
    except ImportError:
        from transformers.utils import sentencepiece_model_pb2 as pb2

    m = pb2.ModelProto()
    for piece, typ in [("<pad>", 3), ("</s>", 3), ("<unk>", 2)]:
        p = m.pieces.add()
        p.piece = piece
        p.score = 0.0
        p.type = typ
    for w in ["▁a", "▁cat", "▁the", "▁on", "▁grass", "▁", "a", "c", "t", "s", "."]:
        p = m.pieces.add()
        p.piece = w
        p.score = -1.0 - 0.01 * len(w)
        p.type = 1
    m.trainer_spec.unk_id = 2
    with open(os.path.join(path, "spiece.model"), "wb") as f:
        f.write(m.SerializeToString())


def _make_umt5_sd(cfg):
    rng = np.random.default_rng(1)
    sd = {"token_embedding.weight": 0.1 * rng.standard_normal((cfg.vocab_size, cfg.dim)).astype(np.float32),
          "norm.weight": np.ones(cfg.dim, np.float32)}
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        for nm in ["q", "k", "v", "o"]:
            sd[f"{b}.attn.{nm}.weight"] = 0.1 * rng.standard_normal((cfg.dim_attn, cfg.dim)).astype(np.float32)
        sd[f"{b}.norm1.weight"] = np.ones(cfg.dim, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(cfg.dim, np.float32)
        sd[f"{b}.pos_embedding.embedding.weight"] = 0.1 * rng.standard_normal((cfg.num_buckets, cfg.num_heads)).astype(np.float32)
        sd[f"{b}.ffn.gate.0.weight"] = 0.1 * rng.standard_normal((cfg.dim_ffn, cfg.dim)).astype(np.float32)
        sd[f"{b}.ffn.fc1.weight"] = 0.1 * rng.standard_normal((cfg.dim_ffn, cfg.dim)).astype(np.float32)
        sd[f"{b}.ffn.fc2.weight"] = 0.1 * rng.standard_normal((cfg.dim, cfg.dim_ffn)).astype(np.float32)
    return sd


def _make_vae_sd(z=16):
    """Tiny 2-stage VAE (dim 8, z_dim=z) in wan_orig naming (vae.py layers)."""
    rng = np.random.default_rng(2)
    sd = {}

    def c3(key, co, ci, kt=3, kh=3, kw=3):
        sd[f"{key}.weight"] = 0.1 * rng.standard_normal((co, ci, kt, kh, kw)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(co, np.float32)

    def c2(key, co, ci, k=3):
        sd[f"{key}.weight"] = 0.1 * rng.standard_normal((co, ci, k, k)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(co, np.float32)

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
    c3("encoder.head.2", 2 * z, 16)
    c3("decoder.conv1", 16, z)
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
    c3("conv1", 2 * z, 2 * z, 1, 1, 1)
    c3("conv2", z, z, 1, 1, 1)
    return sd


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wan_ckpt")
    t5_cfg = T5.T5Config(vocab_size=16, dim=16, dim_attn=16, dim_ffn=24, num_heads=2,
                         num_layers=2, num_buckets=8)
    _save_st(d / "transformer", make_sd_wan_orig(CFG))
    with open(d / "transformer" / "config.json", "w") as f:
        json.dump({"dim": 32, "ffn_dim": 64, "num_heads": 4, "num_layers": 2,
                   "freq_dim": 16, "text_dim": 16, "text_len": 8}, f)
    _save_st(d / "umt5", _make_umt5_sd(t5_cfg))
    with open(d / "umt5" / "config.json", "w") as f:
        json.dump({"vocab_size": 16, "dim": 16, "dim_attn": 16, "dim_ffn": 24,
                   "num_heads": 2, "num_layers": 2, "num_buckets": 8}, f)
    _write_spiece(str(d))
    _save_st(d / "vae", _make_vae_sd())
    with open(d / "vae" / "config.json", "w") as f:
        json.dump({"dim": 8, "z_dim": 16, "dim_mult": [1, 2, 2], "num_res_blocks": 1,
                   "temporal_downsample": [False, True]}, f)
    return str(d)


@pytest.mark.parametrize("pattern", ["SVG"])
def test_cli_prompt_to_video(model_dir, tmp_path, pattern):
    from sparse_videogen_tpu.cli import wan_t2v

    out = str(tmp_path / "out.npz")  # CLI switches extension to .y4m
    wan_t2v.main([
        "--prompt", "a cat on the grass.",
        "--model_dir", model_dir,
        "--pattern", pattern,
        "--height", "96", "--width", "128", "--num_frames", "9",
        "--num_inference_steps", "2",
        "--output_file", out,
    ])
    y4m = str(tmp_path / "out.y4m")
    assert os.path.isfile(y4m)
    with open(y4m, "rb") as f:
        header = f.readline()
    assert header.startswith(b"YUV4MPEG2")


def test_umt5_encoder_from_dir(model_dir):
    from sparse_videogen_tpu.io.encoders import UMT5Encoder

    enc = UMT5Encoder.from_dir(model_dir, text_len=8)
    ctx = enc(["a cat", "the grass on the grass"])
    assert ctx.shape == (2, 8, 16)
    arr = np.asarray(ctx, np.float32)
    assert np.isfinite(arr).all()
    # padding rows zeroed; prompt 1 is longer than prompt 0
    assert np.abs(arr[0, -1]).max() == 0.0
    assert (np.abs(arr).sum(axis=(1, 2)) > 0).all()


def test_cli_converted_cache(model_dir, tmp_path):
    """--converted_cache: first run converts + saves, second run loads the
    cached pytree (and still produces a video)."""
    import os

    from sparse_videogen_tpu.cli import wan_t2v

    cache = str(tmp_path / "cache")
    for i in range(2):
        out = str(tmp_path / f"c{i}.npz")
        wan_t2v.main([
            "--prompt", "a cat.",
            "--model_dir", model_dir,
            "--converted_cache", cache,
            "--pattern", "dense",
            "--height", "96", "--width", "128", "--num_frames", "9",
            "--num_inference_steps", "1",
            "--output_file", out,
        ])
        assert os.path.isfile(str(tmp_path / f"c{i}.y4m"))
    assert os.path.isfile(os.path.join(cache, "wan_dit", "params.safetensors"))
    # cached and fresh runs agree bit-for-bit
    a = open(str(tmp_path / "c0.y4m"), "rb").read()
    b = open(str(tmp_path / "c1.y4m"), "rb").read()
    assert a == b
