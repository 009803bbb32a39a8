"""LLaMA / CLIP-L text encoders vs HuggingFace transformers (tiny configs).

Validates models/common/llama.py (incl. the hidden_state_skip_layer
semantics) and models/common/clip.py (incl. argmax pooling) plus their
checkpoint converters on real HF state-dict naming."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.io import checkpoint as CK
from sparse_videogen_tpu.models.common import clip as C
from sparse_videogen_tpu.models.common import llama as LM


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow
def test_llama_skip_layer_parity():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaModel

    hf_cfg = HFLlamaConfig(
        vocab_size=120, hidden_size=32, intermediate_size=56, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, rope_theta=500000.0,
        rms_norm_eps=1e-5, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = LM.LlamaConfig(vocab_size=120, dim=32, ffn_dim=56, num_layers=4,
                         num_heads=4, num_kv_heads=2)
    skip = 2
    params = CK.convert_llama(sd, cfg, skip_layers=skip, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (2, 11)).astype(np.int64)
    mask = np.ones((2, 11), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 output_hidden_states=True)
    ref = out.hidden_states[-(skip + 1)].numpy()

    got = np.asarray(LM.llama_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                                     jnp.asarray(mask, jnp.int32)))
    # padded positions diverge (HF leaves them unmasked as queries); compare
    # only real tokens
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :7], ref[1, :7], rtol=2e-4, atol=2e-4)


def test_clip_text_pooled_parity():
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    hf_cfg = HFCLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=98, bos_token_id=97, attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = C.CLIPTextConfig(vocab_size=99, dim=32, ffn_dim=64, num_layers=3,
                           num_heads=4, max_positions=16)
    params = CK.convert_clip_text(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    B, Lq = 2, 10
    ids = rng.integers(1, 97, (B, Lq)).astype(np.int64)
    ids[:, 0] = 97
    ids[0, 6] = 98  # eot mid-sequence
    ids[1, 9] = 98

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    last, pooled = C.clip_text_encode(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-4)


def test_clip_vision_penultimate_parity():
    """Vision tower vs HF CLIPVisionModel: hidden_states[-2] is the Wan I2V
    clip_fea (wan_i2v_inference.py:78, WanImageToVideoPipeline.encode_image)."""
    import torch
    from transformers import CLIPVisionConfig as HFVisCfg
    from transformers import CLIPVisionModel

    from sparse_videogen_tpu.io.checkpoint import convert_clip_vision
    from sparse_videogen_tpu.models.common import clip as C

    hf_cfg = HFVisCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                      num_attention_heads=4, image_size=28, patch_size=14,
                      hidden_act="gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = C.CLIPVisionConfig(image_size=28, patch_size=14, dim=32, ffn_dim=64,
                             num_layers=3, num_heads=4, hidden_act="gelu")
    params = convert_clip_vision(sd, cfg)

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px), output_hidden_states=True).hidden_states[-2].numpy()
    got = np.asarray(C.clip_vision_forward(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

    # final-layer output (HF last_hidden_state carries no post-LN; that is
    # applied to the pooled CLS only)
    with torch.no_grad():
        ref_last = hf(torch.tensor(px)).last_hidden_state.numpy()
    got_last = np.asarray(C.clip_vision_forward(params, cfg, jnp.asarray(px), penultimate=False))
    np.testing.assert_allclose(got_last, ref_last, atol=2e-4, rtol=1e-3)


def test_clip_vision_wan_orig_naming_matches_hf_naming():
    """The fused-to_qkv wan_orig state dict converts to the same pytree."""
    import torch
    from transformers import CLIPVisionConfig as HFVisCfg
    from transformers import CLIPVisionModel

    from sparse_videogen_tpu.io.checkpoint import convert_clip_vision
    from sparse_videogen_tpu.models.common import clip as C

    hf_cfg = HFVisCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, image_size=28, patch_size=14, hidden_act="gelu")
    torch.manual_seed(1)
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = C.CLIPVisionConfig(image_size=28, patch_size=14, dim=32, ffn_dim=64,
                             num_layers=2, num_heads=4, hidden_act="gelu")
    a = convert_clip_vision(sd, cfg)

    v = "vision_model."
    sd2 = {
        "visual.patch_embedding.weight": sd[f"{v}embeddings.patch_embedding.weight"],
        "visual.cls_embedding": sd[f"{v}embeddings.class_embedding"].reshape(1, 1, -1),
        "visual.pos_embedding": sd[f"{v}embeddings.position_embedding.weight"][None],
        "visual.pre_norm.weight": sd[f"{v}pre_layrnorm.weight"],
        "visual.pre_norm.bias": sd[f"{v}pre_layrnorm.bias"],
        "visual.post_norm.weight": sd[f"{v}post_layernorm.weight"],
        "visual.post_norm.bias": sd[f"{v}post_layernorm.bias"],
    }
    for i in range(2):
        b, hb = f"visual.transformer.{i}", f"{v}encoder.layers.{i}"
        sd2[f"{b}.attn.to_qkv.weight"] = np.concatenate(
            [sd[f"{hb}.self_attn.{n}_proj.weight"] for n in "qkv"], 0)
        sd2[f"{b}.attn.to_qkv.bias"] = np.concatenate(
            [sd[f"{hb}.self_attn.{n}_proj.bias"] for n in "qkv"], 0)
        sd2[f"{b}.attn.proj.weight"] = sd[f"{hb}.self_attn.out_proj.weight"]
        sd2[f"{b}.attn.proj.bias"] = sd[f"{hb}.self_attn.out_proj.bias"]
        for ours, hf_n in (("norm1", "layer_norm1"), ("norm2", "layer_norm2")):
            sd2[f"{b}.{ours}.weight"] = sd[f"{hb}.{hf_n}.weight"]
            sd2[f"{b}.{ours}.bias"] = sd[f"{hb}.{hf_n}.bias"]
        sd2[f"{b}.mlp.0.weight"] = sd[f"{hb}.mlp.fc1.weight"]
        sd2[f"{b}.mlp.0.bias"] = sd[f"{hb}.mlp.fc1.bias"]
        sd2[f"{b}.mlp.2.weight"] = sd[f"{hb}.mlp.fc2.weight"]
        sd2[f"{b}.mlp.2.bias"] = sd[f"{hb}.mlp.fc2.bias"]
    b_ = convert_clip_vision(sd2, cfg)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)), a, b_)


def test_llava_image_splice_parity():
    """Llava prompt+image encoding (the HunyuanVideo-I2V text conditioner)
    vs HF LlavaForConditionalGeneration: penultimate-layer image features,
    CLS dropped, 2-linear projector, embeddings spliced at the image token,
    hidden_states[-(skip+1)] of the language model."""
    import torch
    from transformers import CLIPVisionConfig as HFV
    from transformers import LlamaConfig as HFL
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    from sparse_videogen_tpu.io.checkpoint import convert_llava
    from sparse_videogen_tpu.models.common import clip as C
    from sparse_videogen_tpu.models.common.llama import LlamaConfig
    from sparse_videogen_tpu.models.common.llava import llava_encode

    hf_cfg = LlavaConfig(
        vision_config=HFV(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                          num_attention_heads=4, image_size=28, patch_size=14,
                          hidden_act="gelu").to_dict(),
        text_config=HFL(hidden_size=48, intermediate_size=96, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2, vocab_size=99,
                        max_position_embeddings=64, rope_theta=500000.0,
                        rms_norm_eps=1e-5).to_dict(),
        image_token_index=98, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    llama_cfg = LlamaConfig(vocab_size=99, dim=48, ffn_dim=96, num_layers=4,
                            num_heads=4, num_kv_heads=2)
    vision_cfg = C.CLIPVisionConfig(image_size=28, patch_size=14, dim=32, ffn_dim=64,
                                    num_layers=3, num_heads=4, hidden_act="gelu")
    skip = 2
    params = convert_llava(sd, llama_cfg, vision_cfg, skip_layers=skip, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    n_img = (28 // 14) ** 2  # 4 patches
    IMG = 98
    # ours: ONE placeholder at position 2; HF: n_img copies (the processor's
    # pre-expanded form the model expects)
    ours_ids = np.array([[5, 7, IMG, 9, 11, 3]], np.int32)
    ours_mask = np.array([[1, 1, 1, 1, 1, 0]], np.int32)
    hf_ids = np.array([[5, 7] + [IMG] * n_img + [9, 11, 3]], np.int64)
    hf_mask = np.array([[1, 1] + [1] * n_img + [1, 1, 0]], np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(hf_ids), pixel_values=torch.tensor(px),
                 attention_mask=torch.tensor(hf_mask), output_hidden_states=True)
    ref = out.hidden_states[-(skip + 1)].numpy()

    got, mask2 = llava_encode(params, llama_cfg, vision_cfg,
                              jnp.asarray(ours_ids), jnp.asarray(ours_mask),
                              jnp.asarray(px), image_pos=2)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(mask2), hf_mask.astype(np.int32))
    # compare only attended positions (padded tails may differ). Projected
    # image embeddings are ~100x larger than token embeddings, so absolute
    # f32 reassociation noise scales up — check relative error.
    live = hf_mask[0].astype(bool)
    g, r = np.asarray(got)[0][live], ref[0][live]
    rel = np.linalg.norm(g - r) / np.linalg.norm(r)
    assert rel < 1e-3, rel
    np.testing.assert_allclose(g, r, atol=5e-3, rtol=2e-2)


def test_llava_image_text_encoder_end_to_end(tmp_path):
    """LlavaImageTextEncoder: template splice, crop, mask, pooled — driven
    with tiny random params and a word-level tokenizer."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers

    from sparse_videogen_tpu.io.encoders import LlavaImageTextEncoder
    from sparse_videogen_tpu.io.tokenizer import HFTokenizerLite
    from sparse_videogen_tpu.models.common.clip import CLIPVisionConfig
    from sparse_videogen_tpu.models.common.clip import init_clip_text_params, CLIPTextConfig
    from sparse_videogen_tpu.models.common.clip import init_clip_vision_params
    from sparse_videogen_tpu.models.common.llama import LlamaConfig, init_llama_params
    from sparse_videogen_tpu.models.common import layers as L

    words = ["describe", "the", "video", "a", "cat", "walks"]
    vocab = {"<pad>": 0}
    for i, w in enumerate(words):
        vocab[w] = i + 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<pad>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    ltok = HFTokenizerLite(tok, pad_id=0)

    llama_cfg = LlamaConfig(vocab_size=16, dim=32, ffn_dim=64, num_layers=2,
                            num_heads=4, num_kv_heads=2)
    vision_cfg = CLIPVisionConfig(image_size=28, patch_size=14, dim=32, ffn_dim=64,
                                  num_layers=2, num_heads=4, hidden_act="gelu")
    clip_cfg = CLIPTextConfig(vocab_size=16, dim=24, ffn_dim=48, num_layers=2,
                              num_heads=4, max_positions=77)
    key = jax.random.PRNGKey(0)
    params = {
        "vision": init_clip_vision_params(key, vision_cfg),
        "projector": {"fc1": L.init_linear(key, 32, 32), "fc2": L.init_linear(key, 32, 32)},
        "llama": init_llama_params(key, llama_cfg, dtype=jnp.float32),
    }
    enc = LlavaImageTextEncoder(
        params, llama_cfg, vision_cfg, ltok,
        init_clip_text_params(key, clip_cfg), clip_cfg, ltok,
        text_len=12, crop_start=2, template="describe the video <image> {}",
    )
    img = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 20, 24)), jnp.float32)
    states, mask, pooled = enc(["a cat walks"], img)
    assert states.shape == (1, 12, 32) and pooled.shape == (1, 24)
    assert np.isfinite(np.asarray(states)).all()
    # the image must influence the states (spliced before the prompt)
    states2, _, _ = enc(["a cat walks"], img * -1.0)
    assert np.abs(np.asarray(states) - np.asarray(states2)).max() > 1e-6
    # masked tail is zeroed
    m = np.asarray(mask)[0]
    assert m.sum() < 12 and np.abs(np.asarray(states)[0][m == 0]).max() == 0.0
