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
