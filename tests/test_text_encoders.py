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
