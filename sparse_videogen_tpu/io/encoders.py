"""Prompt -> conditioning encoders loaded from local checkpoint dirs.

Mirrors the reference's T5EncoderModel wrapper
(/root/reference/svg/models/wan_orig/modules/t5.py:469-506): tokenize with
whitespace cleaning, run the UMT5-XXL encoder, zero everything past each
prompt's real length, and hand the DiT a fixed (B, text_len, dim) tensor
(the reference trims to seq_len then zero-pads back when batching,
wan_orig/text2video.py).

Checkpoint layout expected under `model_dir` (local-only environment; the
reference's .pth must be pre-converted to safetensors):
  umt5/ or text_encoder/   safetensors with reference names (convert_umt5)
  tokenizer files          tokenizer.json or spiece.model (searched in
                           model_dir and one subdir level)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.io.tokenizer import T5TokenizerLite
from sparse_videogen_tpu.models.common.t5 import UMT5_XXL, T5Config, t5_encode


def _find_subdir(model_dir: str, names) -> str | None:
    for n in names:
        d = os.path.join(model_dir, n)
        if os.path.isdir(d):
            return d
    return None


class UMT5Encoder:
    """texts -> (B, text_len, dim) encoder states (zero-padded)."""

    def __init__(self, params, cfg: T5Config, tokenizer: T5TokenizerLite, text_len: int = 512):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.text_len = text_len
        self._encode = jax.jit(lambda p, ids, mask: t5_encode(p, cfg, ids, mask))

    @classmethod
    def from_dir(cls, model_dir: str, *, text_len: int = 512, dtype=jnp.bfloat16, cfg: T5Config | None = None):
        from sparse_videogen_tpu.io.checkpoint import (
            convert_umt5,
            dataclass_from_json,
            load_safetensors_dir,
        )

        enc_dir = _find_subdir(model_dir, ["umt5", "text_encoder", "umt5-xxl"]) or model_dir
        if cfg is None:
            cfg = dataclass_from_json(enc_dir, T5Config) or UMT5_XXL
        sd = load_safetensors_dir(enc_dir)
        params = convert_umt5(sd, cfg, dtype=dtype)
        tok_dir = _find_subdir(model_dir, ["tokenizer", "google/umt5-xxl", "google"]) or model_dir
        tokenizer = T5TokenizerLite.from_dir(tok_dir)
        return cls(params, cfg, tokenizer, text_len=text_len)

    def __call__(self, texts) -> jnp.ndarray:
        ids, mask = self.tokenizer(texts, seq_len=self.text_len)
        ctx = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
        # zero out positions past each prompt's real length (reference trims
        # then zero-pads when stacking the batch)
        return ctx * jnp.asarray(mask, ctx.dtype)[..., None]


# ---------------------------------------------------------------------------
# HunyuanVideo: LLaMA (template + crop_start) + CLIP-L pooled
# ---------------------------------------------------------------------------

# reference hyvideo_orig/constants.py:38-47 (dit-llm-encode-video)
PROMPT_TEMPLATE_ENCODE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)
CROP_START_VIDEO = 95
HYVIDEO_NEGATIVE_PROMPT = (
    "Aerial view, aerial view, overexposed, low quality, deformation, a poor "
    "composition, bad hands, bad teeth, bad eyes, bad limbs, distortion"
)


class HyVideoTextEncoders:
    """prompts -> (states (B, text_len, 4096), mask (B, text_len),
    pooled (B, 768)).

    Reference flow (hyvideo_orig/text_encoder/__init__.py):
      1. format each prompt into the video template, tokenize to
         crop_start + text_len tokens (LLaMA-3 tokenizer);
      2. LLaMA forward, take hidden_states[-(skip+1)] (skip=2, no final
         norm), crop the first crop_start instruction tokens;
      3. CLIP-L on the raw prompt (77 tokens), pooled output.
    """

    def __init__(self, llama_params, llama_cfg, llama_tok, clip_params, clip_cfg,
                 clip_tok, *, text_len=256, crop_start=CROP_START_VIDEO,
                 template=PROMPT_TEMPLATE_ENCODE_VIDEO):
        from sparse_videogen_tpu.models.common.clip import clip_text_encode
        from sparse_videogen_tpu.models.common.llama import llama_encode

        self.llama_params = llama_params
        self.llama_tok = llama_tok
        self.clip_params = clip_params
        self.clip_tok = clip_tok
        self.text_len = text_len
        self.crop_start = crop_start
        self.template = template
        self._llama = jax.jit(lambda p, i, m: llama_encode(p, llama_cfg, i, m))
        self._clip = jax.jit(lambda p, i, m: clip_text_encode(p, clip_cfg, i, m)[1])

    @classmethod
    def from_dir(cls, model_dir: str, *, dtype=jnp.bfloat16, skip_layers: int = 2, **kw):
        from sparse_videogen_tpu.io.checkpoint import (
            convert_clip_text,
            convert_llama,
            dataclass_from_json,
            load_safetensors_dir,
        )
        from sparse_videogen_tpu.io.tokenizer import HFTokenizerLite
        from sparse_videogen_tpu.models.common.clip import CLIP_L_TEXT, CLIPTextConfig
        from sparse_videogen_tpu.models.common.llama import LLAMA3_8B, LlamaConfig

        ldir = _find_subdir(model_dir, ["text_encoder", "llm", "llava-llama-3-8b"]) or model_dir
        lcfg = dataclass_from_json(ldir, LlamaConfig) or LLAMA3_8B
        lparams = convert_llama(load_safetensors_dir(ldir), lcfg, skip_layers=skip_layers, dtype=dtype)
        ltok = HFTokenizerLite.from_dir(ldir)

        cdir = _find_subdir(model_dir, ["text_encoder_2", "clip", "clipL"]) or model_dir
        ccfg = dataclass_from_json(cdir, CLIPTextConfig) or CLIP_L_TEXT
        cparams = convert_clip_text(load_safetensors_dir(cdir), ccfg, dtype=dtype)
        ctok = HFTokenizerLite.from_dir(cdir)
        return cls(lparams, lcfg, ltok, cparams, ccfg, ctok, **kw)

    def __call__(self, prompts):
        texts = [self.template.format(p) for p in prompts]
        ids, mask = self.llama_tok(texts, seq_len=self.crop_start + self.text_len)
        hidden = self._llama(self.llama_params, jnp.asarray(ids), jnp.asarray(mask))
        states = hidden[:, self.crop_start :]
        out_mask = jnp.asarray(mask[:, self.crop_start :])
        states = states * out_mask[..., None].astype(states.dtype)

        cids, cmask = self.clip_tok(list(prompts), seq_len=77)
        pooled = self._clip(self.clip_params, jnp.asarray(cids), jnp.asarray(cmask))
        return states, out_mask, pooled


class CLIPImageEncoder:
    """Wan I2V image encoder (reference: wan_i2v_inference.py:78 loads HF
    CLIPVisionModel from image_encoder/; clip_fea = hidden_states[-2]).

    __call__ takes (B, 3, H, W) pixels in [-1, 1] and returns the
    penultimate ViT-H/14 hidden states (B, 257, 1280)."""

    def __init__(self, params, cfg):
        from sparse_videogen_tpu.models.common.clip import clip_preprocess, clip_vision_forward

        self.cfg = cfg
        self._fwd = jax.jit(
            lambda p, px: clip_vision_forward(
                p, cfg, clip_preprocess(px, cfg.image_size), penultimate=True
            )
        )
        self.params = params

    @classmethod
    def from_dir(cls, model_dir: str, *, dtype=jnp.float32):
        import json

        from sparse_videogen_tpu.io.checkpoint import convert_clip_vision, load_safetensors_dir
        from sparse_videogen_tpu.models.common.clip import CLIP_VIT_H_14, CLIPVisionConfig

        d = _find_subdir(model_dir, ["image_encoder", "clip"]) or model_dir
        cfg = CLIP_VIT_H_14
        cj = os.path.join(d, "config.json")
        if os.path.isfile(cj):
            with open(cj) as f:
                c = json.load(f)
            c = c.get("vision_config", c)
            cfg = CLIPVisionConfig(
                image_size=c.get("image_size", 224),
                patch_size=c.get("patch_size", 14),
                dim=c.get("hidden_size", 1280),
                ffn_dim=c.get("intermediate_size", 5120),
                num_layers=c.get("num_hidden_layers", 32),
                num_heads=c.get("num_attention_heads", 16),
                hidden_act=c.get("hidden_act", "gelu"),
            )
        params = convert_clip_vision(load_safetensors_dir(d), cfg, dtype=dtype)
        return cls(params, cfg)

    def __call__(self, pixels) -> jnp.ndarray:
        return self._fwd(self.params, jnp.asarray(pixels, jnp.float32))


class LlavaImageTextEncoder:
    """HunyuanVideo-I2V prompt conditioner: Llava (CLIP vision + projector +
    LLaMA) with the image spliced into the prompt template at the <image>
    placeholder (models/common/llava.py, HF-parity-tested).

    The community I2V checkpoint's exact template/crop constants live in its
    HF pipeline config (unavailable offline), so they are explicit knobs
    here: `template` must contain "<image>"; `crop_start` drops that many
    leading positions of the SPLICED sequence (instruction prefix);
    `interleave` keeps every k-th image patch embedding
    (image_embed_interleave). Returns (states, mask, pooled) like
    HyVideoTextEncoders.
    """

    def __init__(self, llava_params, llama_cfg, vision_cfg, llama_tok,
                 clip_params, clip_cfg, clip_tok, *, text_len=256,
                 crop_start=0, template="<image>\n{}", interleave=1):
        from sparse_videogen_tpu.models.common.clip import clip_text_encode
        from sparse_videogen_tpu.models.common.llava import llava_encode

        assert "<image>" in template
        self.params = llava_params
        self.llama_cfg = llama_cfg
        self.vision_cfg = vision_cfg
        self.llama_tok = llama_tok
        self.clip_params = clip_params
        self.clip_tok = clip_tok
        self.text_len = text_len
        self.crop_start = crop_start
        self.template = template
        self.interleave = interleave
        self._llava = jax.jit(
            lambda p, i, m, px, pos: llava_encode(
                p, llama_cfg, vision_cfg, i, m, px, pos, interleave=interleave
            ),
            static_argnames=("pos",),
        )
        self._clip = jax.jit(lambda p, i, m: clip_text_encode(p, clip_cfg, i, m)[1])

    @classmethod
    def from_dir(cls, model_dir: str, *, dtype=jnp.bfloat16, skip_layers: int = 2, **kw):
        import json

        from sparse_videogen_tpu.io.checkpoint import (
            convert_clip_text,
            convert_llava,
            dataclass_from_json,
            load_safetensors_dir,
        )
        from sparse_videogen_tpu.io.tokenizer import HFTokenizerLite
        from sparse_videogen_tpu.models.common.clip import (
            CLIP_L_TEXT,
            CLIPTextConfig,
            CLIPVisionConfig,
        )
        from sparse_videogen_tpu.models.common.llama import LLAMA3_8B, LlamaConfig

        ldir = _find_subdir(model_dir, ["text_encoder", "llava", "llm"]) or model_dir
        lcfg = dataclass_from_json(ldir, LlamaConfig) or LLAMA3_8B
        vcfg = CLIPVisionConfig(image_size=336, dim=1024, ffn_dim=4096,
                                num_layers=24, num_heads=16, hidden_act="quick_gelu")
        cj = os.path.join(ldir, "config.json")
        if os.path.isfile(cj):
            with open(cj) as f:
                c = json.load(f)
            tc = c.get("text_config", {})
            if tc:
                lcfg = LlamaConfig(
                    vocab_size=tc.get("vocab_size", lcfg.vocab_size),
                    dim=tc.get("hidden_size", lcfg.dim),
                    ffn_dim=tc.get("intermediate_size", lcfg.ffn_dim),
                    num_layers=tc.get("num_hidden_layers", lcfg.num_layers),
                    num_heads=tc.get("num_attention_heads", lcfg.num_heads),
                    num_kv_heads=tc.get("num_key_value_heads", lcfg.num_kv_heads),
                    rope_theta=tc.get("rope_theta", lcfg.rope_theta),
                    eps=tc.get("rms_norm_eps", lcfg.eps),
                )
            vc = c.get("vision_config", {})
            if vc:
                vcfg = CLIPVisionConfig(
                    image_size=vc.get("image_size", 336),
                    patch_size=vc.get("patch_size", 14),
                    dim=vc.get("hidden_size", 1024),
                    ffn_dim=vc.get("intermediate_size", 4096),
                    num_layers=vc.get("num_hidden_layers", 24),
                    num_heads=vc.get("num_attention_heads", 16),
                    hidden_act=vc.get("hidden_act", "quick_gelu"),
                )
        params = convert_llava(load_safetensors_dir(ldir), lcfg, vcfg,
                               skip_layers=skip_layers, dtype=dtype)
        ltok = HFTokenizerLite.from_dir(ldir)

        cdir = _find_subdir(model_dir, ["text_encoder_2", "clip", "clipL"]) or model_dir
        ccfg = dataclass_from_json(cdir, CLIPTextConfig) or CLIP_L_TEXT
        cparams = convert_clip_text(load_safetensors_dir(cdir), ccfg, dtype=dtype)
        ctok = HFTokenizerLite.from_dir(cdir)
        return cls(params, lcfg, vcfg, ltok, cparams, ccfg, ctok, **kw)

    def _tokenize_unpadded(self, text, cap=512):
        ids, mask = self.llama_tok([text], seq_len=cap)
        n = int(np.asarray(mask)[0].sum())
        return np.asarray(ids)[0, :n]

    def __call__(self, prompts, image):
        """prompts: list[str]; image: (1, 3, H, W) in [-1, 1]."""
        from sparse_videogen_tpu.models.common.clip import clip_preprocess

        assert len(prompts) == 1, "one prompt per call (static image splice)"
        pre, post = self.template.split("<image>")
        suffix = post.format(prompts[0]) if "{}" in post else post + prompts[0]
        pre_ids = self._tokenize_unpadded(pre) if pre else np.zeros((0,), np.int32)
        suf_ids = self._tokenize_unpadded(suffix)

        # target length of the SPLICED sequence is crop_start + text_len;
        # the ids sequence is that minus the image expansion (+1 placeholder)
        n_img = -(-self.vision_cfg.grid ** 2 // self.interleave)
        L_ids = self.crop_start + self.text_len - n_img + 1
        pre_len = len(pre_ids)
        body = np.concatenate([pre_ids, np.zeros((1,), pre_ids.dtype), suf_ids])
        n_real = min(len(body), L_ids)
        ids = np.zeros((1, L_ids), np.int32)
        ids[0, :n_real] = body[:n_real]
        mask = np.zeros((1, L_ids), np.int32)
        mask[0, :n_real] = 1

        px = clip_preprocess(jnp.asarray(image), self.vision_cfg.image_size)
        hidden, mask2 = self._llava(
            self.params, jnp.asarray(ids), jnp.asarray(mask), px, pre_len
        )
        states = hidden[:, self.crop_start:self.crop_start + self.text_len]
        out_mask = mask2[:, self.crop_start:self.crop_start + self.text_len]
        states = states * out_mask[..., None].astype(states.dtype)

        cids, cmask = self.clip_tok(list(prompts), seq_len=77)
        pooled = self._clip(self.clip_params, jnp.asarray(cids), jnp.asarray(cmask))
        return states, out_mask, pooled
