"""Llava text+image encoder (HunyuanVideo-I2V prompt conditioning).

The community HunyuanVideo-I2V encodes the prompt with a Llava model: the
prompt template contains an <image> placeholder whose single token is
replaced by the projected CLIP vision-patch embeddings before the LLaMA
blocks run (reference entry hyvideo_i2v_inference.py loads this through the
diffusers I2V pipeline; the text-only template path is
hyvideo_orig/text_encoder/__init__.py).

Pieces (HF LlavaForConditionalGeneration):
  vision tower  = CLIPVisionModel, feature layer -2 (penultimate), select
                  strategy "default" (drop the CLS token)
  projector     = linear -> gelu -> linear into the LLaMA hidden size
  language model= LlamaModel over the spliced embedding sequence

The image position is static (template-driven), so the splice is a
trace-time concatenation — no dynamic scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.models.common.clip import CLIPVisionConfig, clip_vision_forward
from sparse_videogen_tpu.models.common.llama import LlamaConfig, llama_encode
from sparse_videogen_tpu.models.common import layers as L


def project_image_features(params, vision_cfg: CLIPVisionConfig, pixel_values,
                           *, interleave: int = 1):
    """pixel_values (B, 3, H, W) CLIP-normalized -> (B, n_patches/interleave,
    text_dim) projected patch embeddings (CLS dropped; optional interleave
    subsampling = diffusers image_embed_interleave)."""
    feats = clip_vision_forward(params["vision"], vision_cfg, pixel_values,
                                penultimate=True)[:, 1:]  # drop CLS
    if interleave > 1:
        feats = feats[:, ::interleave]
    h = L.linear(params["projector"]["fc1"], feats)
    h = jax.nn.gelu(h, approximate=False)
    return L.linear(params["projector"]["fc2"], h)


def llava_encode(params, llama_cfg: LlamaConfig, vision_cfg: CLIPVisionConfig,
                 ids, mask, pixel_values, image_pos: int, *, interleave: int = 1):
    """Encode [ids[:image_pos], <image patches>, ids[image_pos+1:]].

    ids/mask: (B, L) with ONE image placeholder token at static position
    `image_pos` (template-driven, so known at trace time). Returns
    (hidden_states (B, L-1+n_img, dim), spliced_mask)."""
    img_embeds = project_image_features(params, vision_cfg, pixel_values,
                                        interleave=interleave)
    B, n_img, _ = img_embeds.shape
    tok = params["llama"]["embed"][ids]
    embeds = jnp.concatenate(
        [tok[:, :image_pos], img_embeds.astype(tok.dtype), tok[:, image_pos + 1:]],
        axis=1,
    )
    img_mask = jnp.ones((B, n_img), mask.dtype)
    mask2 = jnp.concatenate(
        [mask[:, :image_pos], img_mask, mask[:, image_pos + 1:]], axis=1
    )
    ids2 = jnp.zeros(mask2.shape, ids.dtype)  # unused (embeds supplied)
    out = llama_encode(params["llama"], llama_cfg, ids2, mask2, inputs_embeds=embeds)
    return out, mask2
