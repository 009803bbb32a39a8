"""Utility layer tests: metrics, timer, dataloader, quant, visualizer, native IO."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.utils import metric as M
from sparse_videogen_tpu.utils import timer as T
from sparse_videogen_tpu.utils.dataloader import load_prompts
from sparse_videogen_tpu.utils.quant import pseudo_quantize_absmax_perhead

import pytest

# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def test_psnr_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    frames, mean = M.video_metrics(a, a)
    assert mean["psnr"] == float("inf") and abs(mean["ssim"] - 1.0) < 1e-6
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
    _, mean2 = M.video_metrics(a, b)
    assert 20 < mean2["psnr"] < 40 and 0.2 < mean2["ssim"] < 1.0


def test_timer(monkeypatch, capsys):
    monkeypatch.setenv("TIME_BENCH", "2")
    with T.time_logging("unit - sleepless"):
        sum(range(1000))
    T.print_operator_log_data()
    out = capsys.readouterr().out
    assert "unit - sleepless" in out
    assert not T.get_log()[0]  # cleared at level 2


def test_dataloader(tmp_path):
    d = tmp_path / "examples"
    for i in range(2):
        sub = d / str(i)
        sub.mkdir(parents=True)
        (sub / "prompt.txt").write_text(f"prompt {i}")
    (d / "1" / "image.png").write_bytes(b"x")
    items = load_prompts(str(d))
    assert items[0] == ("prompt 0", None)
    assert items[1][0] == "prompt 1" and items[1][1].endswith("image.png")
    assert load_prompts("a literal prompt") == [("a literal prompt", None)]


def test_pseudo_quant_error_shrinks_with_bits():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    e8 = float(jnp.abs(pseudo_quantize_absmax_perhead(x, 8) - x).max())
    e4 = float(jnp.abs(pseudo_quantize_absmax_perhead(x, 4) - x).max())
    assert e8 < e4 < 1.0 and e8 > 0


def test_visualizer_and_native_video(tmp_path):
    from sparse_videogen_tpu.ops import metadata as MD
    from sparse_videogen_tpu.utils.visualize import visualize_meta

    bm = np.zeros((1, 4, 8), bool)
    bm[0, range(4), range(4)] = True
    meta = MD.chunk_meta_np(bm, np.full((1, 8), 128, np.int32), block_kv=128)
    art = visualize_meta(meta, block_kv=128, seq_kv=1024)
    assert "density" in art and "#" in art

    from sparse_videogen_tpu.io.native import write_y4m

    vid = (np.random.default_rng(0).random((3, 16, 16, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.y4m")
    write_y4m(p, vid, fps=8)
    head = open(p, "rb").read(32)
    assert head.startswith(b"YUV4MPEG2 W16 H16 F8:1")


def test_fp8_weight_only_linear_path():
    """quantize_linears_fp8 + layers.linear dequant: error bounded by e4m3
    resolution, small linears untouched, stacked weights get per-layer scale."""
    import jax
    import jax.numpy as jnp

    from sparse_videogen_tpu.models.common import layers as L
    from sparse_videogen_tpu.utils.quant import quantize_linears_fp8

    rng = np.random.default_rng(0)
    params = {
        "big": {"w": jnp.asarray(rng.standard_normal((512, 256)), jnp.float32),
                "b": jnp.zeros((256,), jnp.float32)},
        "stacked": {"w": jnp.asarray(rng.standard_normal((3, 512, 256)) * 5.0, jnp.float32)},
        "tiny": {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)},
    }
    q = quantize_linears_fp8(params, min_size=1 << 10)
    assert "w8" in q["big"] and q["big"]["w8"].dtype == jnp.float8_e4m3fn
    assert q["stacked"]["scale"].shape == (3, 1, 1)
    assert "w" in q["tiny"]  # untouched

    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    y_ref = L.linear(params["big"], x)
    y_q = L.linear(q["big"], x)
    rel = np.abs(np.asarray(y_q - y_ref)).max() / np.abs(np.asarray(y_ref)).max()
    assert rel < 0.05, rel  # e4m3 ~2 significand bits => few-% matmul error

    y2_ref = jnp.einsum("bi,lio->lbo", x, params["stacked"]["w"])
    y2_q = jnp.einsum("bi,lio->lbo", x, q["stacked"]["w8"].astype(jnp.float32) * q["stacked"]["scale"])
    rel2 = np.abs(np.asarray(y2_q - y2_ref)).max() / np.abs(np.asarray(y2_ref)).max()
    assert rel2 < 0.05, rel2


def test_load_prompt_or_image_sources(tmp_path):
    from sparse_videogen_tpu.utils.dataloader import load_prompt_or_image

    # passthrough
    assert load_prompt_or_image("prompt", 0, "hi", None) == ("hi", None)
    # T2V txt
    txt = tmp_path / "p.txt"
    txt.write_text("first\nsecond\n")
    p, img = load_prompt_or_image("T2V_Wan_VBench", 1, str(txt), None)
    assert p.strip() == "second" and img is None
    # I2V web layout
    ex = tmp_path / "web" / "003"
    ex.mkdir(parents=True)
    (ex / "prompt.txt").write_text("web prompt")
    (ex / "image.jpg").write_bytes(b"\xff\xd8")
    p, img = load_prompt_or_image("I2V_Wan_Web", 3, str(tmp_path / "web"), str(tmp_path / "web"))
    assert p == "web prompt" and img.endswith("003/image.jpg")
    # I2V VBench json
    import json
    (tmp_path / "orig name.jpg").write_bytes(b"\xff\xd8")
    vb = tmp_path / "vb.json"
    vb.write_text(json.dumps({"2": {"original": "orig name", "improved": "better"}}))
    p, img = load_prompt_or_image("I2V_VBench", 2, str(vb), str(tmp_path))
    assert p == "better" and img.endswith("orig name.jpg")


def test_vbench_collect_and_mean(tmp_path):
    import json

    from sparse_videogen_tpu.utils import vbench

    d1 = tmp_path / "a"; d1.mkdir()
    (d1 / "x_eval_results.json").write_text(json.dumps(
        {"subject_consistency": [0.9, ["..."]], "motion_smoothness": [0.7, []]}))
    (tmp_path / "y_eval_results.json").write_text(json.dumps(
        {"subject_consistency": [0.5, []]}))
    m = vbench.mean_scores(str(tmp_path))
    assert abs(m["subject_consistency"] - 0.7) < 1e-9
    assert abs(m["motion_smoothness"] - 0.7) < 1e-9


def test_extract_time(tmp_path):
    from sparse_videogen_tpu.utils.extract_time import analyze_log

    log = tmp_path / "run.log"
    log.write_text(
        "100%|██████████| 50/50 [02:00<00:00]\n"
        "100%|██████████| 50/50 [04:00<00:00]\n"
        "junk\n"
    )
    n, avg = analyze_log(str(log), 50)
    assert n == 2 and avg == "03:00"


def test_save_qkv_roundtrip(tmp_path):
    from sparse_videogen_tpu.utils.misc import save_qkv

    q = np.ones((1, 2, 4, 8), np.float32)
    path = save_qkv(q, q * 2, q * 3, str(tmp_path), layer_idx=3, timestep=900)
    data = np.load(path)
    assert data["k"].max() == 2.0 and int(data["layer_idx"]) == 3


def test_prompt_expander_local_backend():
    from sparse_videogen_tpu.utils.prompt_extend import (
        LM_EN_SYS_PROMPT,
        VL_ZH_SYS_PROMPT,
        LocalLLMPromptExpander,
    )

    calls = []

    def chat(system, user, image=None):
        calls.append((system, user, image))
        return f"rewritten: {user}"

    pe = LocalLLMPromptExpander(chat)
    out = pe("a cat", tar_lang="en", seed=7)
    assert out.status and out.prompt == "rewritten: a cat" and out.seed == 7
    assert calls[0][0] == LM_EN_SYS_PROMPT

    vl = LocalLLMPromptExpander(chat, is_vl=True)
    out2 = vl("a dog", tar_lang="zh", image="IMG")
    assert out2.status and calls[-1] == (VL_ZH_SYS_PROMPT, "a dog", "IMG")

    def broken(system, user, image=None):
        raise RuntimeError("backend down")

    out3 = LocalLLMPromptExpander(broken)("a cat", tar_lang="en")
    assert not out3.status and out3.prompt == "a cat" and "backend down" in out3.message


def test_dashscope_expander_offline(monkeypatch):
    """The REST DashScope backend without the dashscope package: request
    construction is pure/offline-testable; the network call is mocked; a
    failing call returns the reference's failure envelope (original prompt,
    status False)."""
    import json

    from sparse_videogen_tpu.utils import prompt_extend as PE

    monkeypatch.delenv("DASHSCOPE_API_KEY", raising=False)
    with pytest.raises(ValueError):
        PE.DashScopePromptExpander()  # no key anywhere

    pe = PE.DashScopePromptExpander(api_key="sk-test")
    url, headers, data = pe.build_request(
        [{"role": "system", "content": "S"}, {"role": "user", "content": "U"}])
    assert url.startswith("https://dashscope.aliyuncs.com/")
    assert headers["Authorization"] == "Bearer sk-test"
    payload = json.loads(data)
    assert payload["model"] == "qwen-plus"
    assert payload["input"]["messages"][1]["content"] == "U"
    assert payload["parameters"]["result_format"] == "message"

    # mock the HTTP layer -> full call path exercised offline
    monkeypatch.setattr(pe, "_http_chat",
                        lambda messages: "rewritten: " + messages[-1]["content"])
    pe._dashscope = None
    out = pe("a cat", tar_lang="en", seed=3)
    assert out.status and out.prompt == "rewritten: a cat" and out.seed == 3

    vl = PE.DashScopePromptExpander(api_key="sk-test", is_vl=True)
    assert vl.model_name == "qwen-vl-max"
    url_vl, _, data_vl = vl.build_request([{"role": "user", "content": [{"text": "x"}]}])
    assert "multimodal" in url_vl
    seen = {}
    monkeypatch.setattr(vl, "_http_chat", lambda m: seen.setdefault("m", m) and "ok" or "ok")
    vl._dashscope = None
    out_vl = vl("a dog", tar_lang="en", image="https://x/img.png")
    assert out_vl.status and out_vl.prompt == "ok"
    assert seen["m"][-1]["content"][0] == {"image": "https://x/img.png"}

    # network down (urlopen unavailable): failure envelope, no raise
    def boom(messages):
        raise OSError("no egress")

    monkeypatch.setattr(pe, "_http_chat", boom)
    pe.retry_times = 2
    bad = pe("a cat", tar_lang="en")
    assert not bad.status and bad.prompt == "a cat" and "no egress" in bad.message


def test_profiler_trace(tmp_path):
    import glob
    import os

    import jax.numpy as jnp

    with T.profiler_trace(str(tmp_path)):
        with T.named_scope("probe"):
            jnp.ones((8, 8)).sum().block_until_ready()
    assert glob.glob(os.path.join(str(tmp_path), "**", "*.xplane.pb"), recursive=True)


def test_y4m_roundtrip_and_metric_cli(tmp_path, capsys):
    import json

    from sparse_videogen_tpu.io.native import load_video, read_y4m, write_y4m
    from sparse_videogen_tpu.utils import metric as M

    rng = np.random.default_rng(0)
    # smooth gradients: 4:2:0 chroma subsampling is near-lossless there
    t, yy, xx = np.meshgrid(np.arange(3), np.arange(16), np.arange(24), indexing="ij")
    vid = np.stack([yy * 8 + t * 20, xx * 6, 255 - yy * 7], -1).astype(np.uint8)
    p1 = str(tmp_path / "a.y4m")
    write_y4m(p1, vid, fps=8)
    back, fps = read_y4m(p1)
    assert fps == 8 and back.shape == vid.shape
    assert np.abs(back.astype(int) - vid.astype(int)).mean() < 4

    v2 = np.clip(vid.astype(np.float32) / 255.0 + 0.01 * rng.standard_normal(vid.shape), 0, 1)
    p2 = str(tmp_path / "b.npy")
    np.save(p2, v2.astype(np.float32))
    out_jsonl = str(tmp_path / "m.jsonl")
    M.main([p1, p2, "--output_jsonl", out_jsonl])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["mean"]["psnr"] > 20

    # aggregation surface
    mean = M.metrics_mean(str(tmp_path))
    assert abs(mean["psnr"] - got["mean"]["psnr"]) < 1e-9

    from sparse_videogen_tpu.utils.density import densities_mean
    assert densities_mean(str(tmp_path / "empty-nowhere")) == 0.0


def test_cli_skip_existing(tmp_path, capsys):
    """--skip_existing short-circuits before any model work (reference
    wan_t2v_inference.py:62-65 batch-resume semantics; also honors the
    .npz -> .y4m extension switch the CLIs perform)."""
    from sparse_videogen_tpu.cli import wan_t2v

    out = tmp_path / "gen.npz"
    y4m = tmp_path / "gen.y4m"
    y4m.write_bytes(b"YUV4MPEG2\n")
    wan_t2v.main(["--output_file", str(out), "--skip_existing"])
    assert "skipping" in capsys.readouterr().out


def test_int8_w8a8_linear_path():
    """quantize_linears_int8 + layers.linear W8A8: per-output-channel weight
    scales, dynamic per-token activation scales; error in the int8 matmul
    class; small linears untouched."""
    import jax.numpy as jnp

    from sparse_videogen_tpu.models.common import layers as L
    from sparse_videogen_tpu.utils.quant import quantize_linears_int8

    rng = np.random.default_rng(1)
    params = {
        "big": {"w": jnp.asarray(rng.standard_normal((512, 256)), jnp.float32),
                "b": jnp.asarray(rng.standard_normal((256,)), jnp.float32)},
        "tiny": {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)},
    }
    q = quantize_linears_int8(params, min_size=1 << 10)
    assert q["big"]["wi8"].dtype == jnp.int8
    assert q["big"]["wscale"].shape == (1, 256)
    assert "w" in q["tiny"]

    # scale channels independently to exercise per-channel scales
    wscaled = params["big"]["w"] * jnp.linspace(0.1, 10.0, 256)[None, :]
    pscaled = {"w": wscaled, "b": params["big"]["b"]}
    qs = quantize_linears_int8(pscaled, min_size=1 << 10)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    y_ref = np.asarray(L.linear(pscaled, x))
    y_q = np.asarray(L.linear(qs, x))
    rel = np.abs(y_q - y_ref).max() / np.abs(y_ref).max()
    assert rel < 0.02, rel  # 8-bit symmetric quant, both operands

    # bf16 activations keep the path working and return bf16
    yb = L.linear(qs, x.astype(jnp.bfloat16))
    assert yb.dtype == jnp.bfloat16


def test_cli_model_id_parity(tmp_path):
    """Every CLI accepts the reference's --model_id (reference entry scripts,
    e.g. wan_t2v_inference.py:22): a local dir folds into --model_dir, an HF
    repo id (no network here) resolves to None -> smoke fallback."""
    import types

    from sparse_videogen_tpu.cli._common import resolve_model_dir

    ns = lambda **kw: types.SimpleNamespace(model_dir=None, smoke=False, **kw)
    assert resolve_model_dir(ns(model_id=str(tmp_path))) == str(tmp_path)
    assert resolve_model_dir(ns(model_id="Wan-AI/Wan2.1-T2V-14B-Diffusers")) is None
    explicit = types.SimpleNamespace(model_dir="/x", model_id=str(tmp_path), smoke=False)
    assert resolve_model_dir(explicit) == "/x"

    for mod, flags in [
        ("wan_t2v", ["--model_id", "Wan-AI/Wan2.1-T2V-14B-Diffusers"]),
        ("wan_i2v", ["--model_id", "Wan-AI/Wan2.1-I2V-14B-720P-Diffusers",
                     "--attention_backend", "flashinfer"]),
        ("hyvideo_t2v", ["--model_id", "tencent/HunyuanVideo", "--data_path", "/d"]),
        ("hyvideo_i2v", ["--model_id", "hunyuanvideo-community/HunyuanVideo-I2V"]),
        ("cog_i2v", ["--model_id", "THUDM/CogVideoX1.5-5B-I2V"]),
        ("cosmos_t2v", ["--model_id", "nvidia/Cosmos-1.0-Diffusion-14B-Text2World"]),
    ]:
        cli = __import__(f"sparse_videogen_tpu.cli.{mod}", fromlist=["build_parser"])
        args = cli.build_parser().parse_args(flags)
        assert args.model_id == flags[1]


def test_lpips_rf_perceptual_properties():
    """The self-contained perceptual metric (LPIPS stand-in): zero on
    identity, monotone in perturbation size, and distinguishes equal-MSE
    blur (perceptually close) from i.i.d. noise (perceptually far)."""
    from scipy.ndimage import gaussian_filter

    from sparse_videogen_tpu.utils.perceptual import lpips_rf

    rng = np.random.default_rng(0)
    base = gaussian_filter(rng.random((2, 64, 64, 3)), sigma=(0, 2, 2, 0))
    base = (base - base.min()) / (base.max() - base.min())

    assert lpips_rf(base, base) == 0.0
    d_small = lpips_rf(base, np.clip(base + 0.02 * rng.standard_normal(base.shape), 0, 1))
    d_big = lpips_rf(base, np.clip(base + 0.2 * rng.standard_normal(base.shape), 0, 1))
    assert 0 < d_small < d_big

    blurred = gaussian_filter(base, sigma=(0, 1.2, 1.2, 0))
    mse_blur = float(np.mean((blurred - base) ** 2))
    noise = np.clip(base + np.sqrt(mse_blur) * rng.standard_normal(base.shape), 0, 1)
    d_blur = lpips_rf(base, blurred)
    d_noise = lpips_rf(base, noise)
    assert d_blur < d_noise, (d_blur, d_noise, mse_blur)


def test_lpips_alex_weights_path(tmp_path, monkeypatch):
    """True-LPIPS plumbing: a local .npz with AlexNet + calibration weights
    (synthetic values, real shapes) loads via $SVT_LPIPS_WEIGHTS and the
    JAX forward satisfies the metric axioms (identity 0, monotone in
    perturbation); absent weights resolve to None (lpips_rf fallback)."""
    from sparse_videogen_tpu.utils.lpips_jax import load_lpips_weights, lpips_alex

    monkeypatch.delenv("SVT_LPIPS_WEIGHTS", raising=False)
    assert load_lpips_weights() is None  # nothing resolvable anywhere

    rng = np.random.default_rng(1)
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    w = {}
    for i, (ci, co, k) in enumerate(chans):
        w[f"conv{i}_w"] = (rng.standard_normal((co, ci, k, k)) *
                           np.sqrt(2.0 / (ci * k * k))).astype(np.float32)
        w[f"conv{i}_b"] = np.zeros(co, np.float32)
        w[f"lin{i}_w"] = rng.random((1, co, 1, 1)).astype(np.float32)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **w)
    monkeypatch.setenv("SVT_LPIPS_WEIGHTS", str(path))
    loaded = load_lpips_weights()
    assert loaded is not None and loaded["conv0_w"].shape == (64, 3, 11, 11)

    base = rng.random((2, 64, 64, 3))
    assert lpips_alex(base, base, loaded) == 0.0
    d1 = lpips_alex(base, np.clip(base + 0.02 * rng.standard_normal(base.shape), 0, 1), loaded)
    d2 = lpips_alex(base, np.clip(base + 0.2 * rng.standard_normal(base.shape), 0, 1), loaded)
    assert 0 < d1 < d2


def test_jax_qwen_prompt_expander_structure(tmp_path):
    """The transformers-free local prompt-extension backend end-to-end on a
    synthetic tiny checkpoint (the VAE structure-test pattern): convert an
    HF-layout Qwen2 state dict, save/load the pytree, tokenize with the
    chat template, greedy-decode, and return a successful PromptOutput."""
    import json

    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers

    from sparse_videogen_tpu.io.checkpoint import convert_qwen_lm, save_pytree
    from sparse_videogen_tpu.models.common.llama import LlamaConfig
    from sparse_videogen_tpu.utils.prompt_extend import JaxQwenPromptExpander

    d = str(tmp_path / "qwen_tiny")
    os.makedirs(d)
    words = ["a", "cat", "rides", "bicycle", "the", "sunny", "street",
             "<|im_start|>", "<|im_end|>", "system", "user", "assistant"]
    vocab = {"<pad>": 0, "<unk>": 1, "<eos>": 2}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"pad_token": "<pad>", "eos_token": "<eos>"}, f)

    cfg = LlamaConfig(vocab_size=len(vocab), dim=32, ffn_dim=64, num_layers=2,
                      num_heads=2, num_kv_heads=1, rope_theta=1e4)
    gen = torch.Generator().manual_seed(0)
    sd = {"model.embed_tokens.weight": torch.randn(cfg.vocab_size, cfg.dim, generator=gen) * 0.2,
          "model.norm.weight": torch.ones(cfg.dim),
          "lm_head.weight": torch.randn(cfg.vocab_size, cfg.dim, generator=gen) * 0.2}
    for i in range(cfg.num_layers):
        b = f"model.layers.{i}"
        hd, kv = cfg.head_dim, cfg.num_kv_heads
        sd[f"{b}.input_layernorm.weight"] = torch.ones(cfg.dim)
        sd[f"{b}.post_attention_layernorm.weight"] = torch.ones(cfg.dim)
        sd[f"{b}.self_attn.q_proj.weight"] = torch.randn(cfg.dim, cfg.dim, generator=gen) * 0.1
        sd[f"{b}.self_attn.q_proj.bias"] = torch.zeros(cfg.dim)  # Qwen2 qkv biases
        sd[f"{b}.self_attn.k_proj.weight"] = torch.randn(kv * hd, cfg.dim, generator=gen) * 0.1
        sd[f"{b}.self_attn.k_proj.bias"] = torch.zeros(kv * hd)
        sd[f"{b}.self_attn.v_proj.weight"] = torch.randn(kv * hd, cfg.dim, generator=gen) * 0.1
        sd[f"{b}.self_attn.v_proj.bias"] = torch.zeros(kv * hd)
        sd[f"{b}.self_attn.o_proj.weight"] = torch.randn(cfg.dim, cfg.dim, generator=gen) * 0.1
        sd[f"{b}.mlp.gate_proj.weight"] = torch.randn(cfg.ffn_dim, cfg.dim, generator=gen) * 0.1
        sd[f"{b}.mlp.up_proj.weight"] = torch.randn(cfg.ffn_dim, cfg.dim, generator=gen) * 0.1
        sd[f"{b}.mlp.down_proj.weight"] = torch.randn(cfg.dim, cfg.ffn_dim, generator=gen) * 0.1
    sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_qwen_lm(sd, cfg, dtype=jnp.float32)
    save_pytree(os.path.join(d, "params.safetensors"), params)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"vocab_size": cfg.vocab_size, "dim": cfg.dim, "ffn_dim": cfg.ffn_dim,
                   "num_layers": cfg.num_layers, "num_heads": cfg.num_heads,
                   "num_kv_heads": cfg.num_kv_heads, "rope_theta": cfg.rope_theta,
                   "eos_token_id": 2}, f)

    exp = JaxQwenPromptExpander(d, max_new_tokens=8)
    out = exp("a cat rides the bicycle", tar_lang="en")
    assert out.status, out.message
    assert isinstance(out.prompt, str)
    # deterministic greedy decode: same input -> same output
    out2 = exp("a cat rides the bicycle", tar_lang="en")
    assert out2.prompt == out.prompt


def test_organic_surgery_and_smooth_latents():
    """utils/organic: K:=Q surgery on both layouts + smooth latent field."""
    from sparse_videogen_tpu.utils.organic import (
        align_fused_qkv, align_self_attn_qk, smooth_latents)

    # wan-style separate q/k dicts (stacked over layers)
    rng = jax.random.PRNGKey(0)
    blk = {"self_attn": {"q": {"w": jax.random.normal(rng, (3, 8, 8)), "b": jnp.zeros((3, 8))},
                         "k": {"w": jnp.ones((3, 8, 8)), "b": jnp.ones((3, 8))},
                         "norm_q": jnp.ones((8,)), "norm_k": jnp.ones((8,))},
           "cross_attn": {"q": {"w": jnp.zeros((3, 8, 8))}, "k": {"w": jnp.ones((3, 8, 8))}}}
    out = align_self_attn_qk({"blocks": blk}, gain=2.0)
    sa = out["blocks"]["self_attn"]
    np.testing.assert_array_equal(np.asarray(sa["k"]["w"]), np.asarray(sa["q"]["w"]))
    np.testing.assert_array_equal(np.asarray(sa["k"]["b"]), np.asarray(sa["q"]["b"]))
    np.testing.assert_allclose(np.asarray(sa["norm_q"]), 2.0)
    # cross_attn untouched (only the self_attn key is aligned)
    assert float(jnp.sum(out["blocks"]["cross_attn"]["k"]["w"])) == 3 * 8 * 8

    # hyvideo-style fused [q|k|v] layouts
    h = 4
    fused = {"img_qkv": {"w": jax.random.normal(rng, (2, 6, 3 * h)), "b": jnp.arange(3 * h, dtype=jnp.float32)[None].repeat(2, 0)},
             "linear1": {"w": jax.random.normal(rng, (2, 6, 3 * h + 5))},
             "img_q_norm": jnp.ones((2,))}
    out = align_fused_qkv({"b0": fused}, hidden=h, gain=3.0)["b0"]
    np.testing.assert_array_equal(np.asarray(out["img_qkv"]["w"][..., h:2 * h]),
                                  np.asarray(out["img_qkv"]["w"][..., :h]))
    np.testing.assert_array_equal(np.asarray(out["linear1"]["w"][..., h:2 * h]),
                                  np.asarray(out["linear1"]["w"][..., :h]))
    # mlp tail of linear1 untouched
    np.testing.assert_array_equal(np.asarray(out["linear1"]["w"][..., 3 * h:]),
                                  np.asarray(fused["linear1"]["w"][..., 3 * h:]))
    np.testing.assert_allclose(np.asarray(out["img_q_norm"]), 3.0)

    # smooth latents: unit variance, finite, and smoother than iid noise
    x = np.asarray(smooth_latents(rng, (1, 4, 8, 16, 16), (2, 4, 4), jnp.float32))
    assert np.isfinite(x).all() and abs(x.std() - 1.0) < 0.05
    d_smooth = np.mean(np.abs(np.diff(x, axis=-1)))
    iid = jax.random.normal(rng, x.shape)
    d_iid = float(jnp.mean(jnp.abs(jnp.diff(iid, axis=-1))))
    assert d_smooth < 0.5 * d_iid, (d_smooth, d_iid)
