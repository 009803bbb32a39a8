"""Convert reference checkpoints to sparse_videogen_tpu param pytrees.

Supported sources:
  - Wan DiT:  diffusers WanTransformer3DModel safetensors (the live path the
    reference scripts load via WanPipeline.from_pretrained) and the wan_orig
    naming (wan_orig/modules/model.py).
  - Wan VAE:  wan_orig WanVAE_ state dict (vae.py layer names).
  - UMT5:     wan_orig T5Encoder state dict (t5.py layer names).

All torch conv/linear weights are transposed to this package's layouts:
  linear  (out, in)            -> (in, out)
  conv3d  (co, ci, kt, kh, kw) -> (kt, kh, kw, ci, co)
  conv2d  (co, ci, kh, kw)     -> (kh, kw, ci, co)
"""

from __future__ import annotations

import json
import os
import re

import jax.numpy as jnp
import numpy as np


def load_safetensors_dir(path: str) -> dict:
    """Load all *.safetensors under `path` into one flat numpy dict."""
    from safetensors import safe_open

    out = {}
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
    )
    assert files, f"no safetensors in {path}"
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


def _lin(sd, key, dtype):
    p = {"w": jnp.asarray(sd[f"{key}.weight"].T, dtype)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{key}.bias"], dtype)
    return p


def _conv3d(sd, key, dtype):
    w = sd[f"{key}.weight"].transpose(2, 3, 4, 1, 0)
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(sd[f"{key}.bias"], dtype)}


def _conv2d(sd, key, dtype):
    w = sd[f"{key}.weight"].transpose(2, 3, 1, 0)
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(sd[f"{key}.bias"], dtype)}


def _stack(dicts):
    """List of identical pytrees -> one pytree with stacked leaves."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# Wan DiT
# ---------------------------------------------------------------------------


def dataclass_from_json(path: str, cls):
    """Build `cls` from config.json in dir `path` (None if absent).

    Unknown keys are ignored; list values become tuples (patch_size etc.).
    """
    import dataclasses

    cj = os.path.join(path, "config.json")
    if not os.path.isfile(cj):
        return None
    with open(cj) as f:
        c = json.load(f)
    fields = {f.name for f in dataclasses.fields(cls)}
    kw = {k: (tuple(v) if isinstance(v, list) else v) for k, v in c.items() if k in fields}
    return cls(**kw)


def wan_config_from_json(path: str):
    """Build a WanConfig from a checkpoint dir's config.json.

    Understands both the wan_orig flat naming (dim/ffn_dim/num_heads, see
    wan_orig/configs) and the diffusers WanTransformer3DModel naming
    (attention_head_dim/num_attention_heads/...). Returns None if absent.
    """
    from sparse_videogen_tpu.models.wan.model import WanConfig

    cj = os.path.join(path, "config.json")
    if not os.path.isfile(cj):
        return None
    with open(cj) as f:
        c = json.load(f)
    if "num_attention_heads" in c:  # diffusers naming
        heads = c["num_attention_heads"]
        dim = heads * c["attention_head_dim"]
        return WanConfig(
            model_type="i2v" if c.get("image_dim") else "t2v",
            patch_size=tuple(c.get("patch_size", (1, 2, 2))),
            text_len=c.get("text_len", 512),
            in_dim=c.get("in_channels", 16),
            dim=dim,
            ffn_dim=c.get("ffn_dim", dim * 4),
            freq_dim=c.get("freq_dim", 256),
            text_dim=c.get("text_dim", 4096),
            out_dim=c.get("out_channels", 16),
            num_heads=heads,
            num_layers=c.get("num_layers", 30),
            qk_norm=bool(c.get("qk_norm", True)),
            cross_attn_norm=bool(c.get("cross_attn_norm", True)),
            eps=c.get("eps", 1e-6),
            image_dim=c.get("image_dim") or 1280,
        )
    return dataclass_from_json(path, WanConfig)


def convert_wan_dit(sd: dict, cfg, dtype=jnp.bfloat16):
    """diffusers WanTransformer3DModel state dict -> models/wan/model.py pytree."""
    f32 = jnp.float32
    is_diffusers = any(k.startswith("condition_embedder") for k in sd)
    if not is_diffusers:
        return _convert_wan_dit_orig(sd, cfg, dtype)

    def block(i):
        b = f"blocks.{i}"
        p = {
            "modulation": jnp.asarray(sd[f"{b}.scale_shift_table"].reshape(6, -1), f32),
            "self_attn": {
                "q": _lin(sd, f"{b}.attn1.to_q", dtype),
                "k": _lin(sd, f"{b}.attn1.to_k", dtype),
                "v": _lin(sd, f"{b}.attn1.to_v", dtype),
                "o": _lin(sd, f"{b}.attn1.to_out.0", dtype),
                "norm_q": jnp.asarray(sd[f"{b}.attn1.norm_q.weight"], f32),
                "norm_k": jnp.asarray(sd[f"{b}.attn1.norm_k.weight"], f32),
            },
            "cross_attn": {
                "q": _lin(sd, f"{b}.attn2.to_q", dtype),
                "k": _lin(sd, f"{b}.attn2.to_k", dtype),
                "v": _lin(sd, f"{b}.attn2.to_v", dtype),
                "o": _lin(sd, f"{b}.attn2.to_out.0", dtype),
                "norm_q": jnp.asarray(sd[f"{b}.attn2.norm_q.weight"], f32),
                "norm_k": jnp.asarray(sd[f"{b}.attn2.norm_k.weight"], f32),
            },
            "norm3": {
                "w": jnp.asarray(sd[f"{b}.norm2.weight"], f32),
                "b": jnp.asarray(sd[f"{b}.norm2.bias"], f32),
            },
            "ffn": {
                "fc1": _lin(sd, f"{b}.ffn.net.0.proj", dtype),
                "fc2": _lin(sd, f"{b}.ffn.net.2", dtype),
            },
        }
        if f"{b}.attn2.add_k_proj.weight" in sd:
            p["cross_attn"]["k_img"] = _lin(sd, f"{b}.attn2.add_k_proj", dtype)
            p["cross_attn"]["v_img"] = _lin(sd, f"{b}.attn2.add_v_proj", dtype)
            p["cross_attn"]["norm_k_img"] = jnp.asarray(
                sd[f"{b}.attn2.norm_added_k.weight"], f32
            )
        return p

    pe_w = sd["patch_embedding.weight"]  # (dim, in, pt, ph, pw)
    d = pe_w.shape[0]
    params = {
        "patch_embedding": {
            # conv kernel == stride: flatten to a matmul over (ci*pt*ph*pw)
            # matching models/wan/model.py _patchify token layout
            "w": jnp.asarray(pe_w.reshape(d, -1).T, dtype),
            "b": jnp.asarray(sd["patch_embedding.bias"], dtype),
        },
        "text_embedding": {
            "fc1": _lin(sd, "condition_embedder.text_embedder.linear_1", dtype),
            "fc2": _lin(sd, "condition_embedder.text_embedder.linear_2", dtype),
        },
        "time_embedding": {
            "fc1": _lin(sd, "condition_embedder.time_embedder.linear_1", f32),
            "fc2": _lin(sd, "condition_embedder.time_embedder.linear_2", f32),
        },
        "time_projection": _lin(sd, "condition_embedder.time_proj", f32),
        "head": {
            "modulation": jnp.asarray(sd["scale_shift_table"].reshape(2, -1), f32),
            "out": _lin(sd, "proj_out", dtype),
        },
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
    }
    if "condition_embedder.image_embedder.ff.net.0.proj.weight" in sd:
        params["img_emb"] = {
            "norm1": {
                "w": jnp.asarray(sd["condition_embedder.image_embedder.norm1.weight"], f32),
                "b": jnp.asarray(sd["condition_embedder.image_embedder.norm1.bias"], f32),
            },
            "fc1": _lin(sd, "condition_embedder.image_embedder.ff.net.0.proj", dtype),
            "fc2": _lin(sd, "condition_embedder.image_embedder.ff.net.2", dtype),
            "norm2": {
                "w": jnp.asarray(sd["condition_embedder.image_embedder.norm2.weight"], f32),
                "b": jnp.asarray(sd["condition_embedder.image_embedder.norm2.bias"], f32),
            },
        }
    return params


def _convert_wan_dit_orig(sd: dict, cfg, dtype=jnp.bfloat16):
    """wan_orig WanModel naming (model.py:339-446)."""
    f32 = jnp.float32

    def block(i):
        b = f"blocks.{i}"
        p = {
            "modulation": jnp.asarray(sd[f"{b}.modulation"].reshape(6, -1), f32),
            "self_attn": {
                "q": _lin(sd, f"{b}.self_attn.q", dtype),
                "k": _lin(sd, f"{b}.self_attn.k", dtype),
                "v": _lin(sd, f"{b}.self_attn.v", dtype),
                "o": _lin(sd, f"{b}.self_attn.o", dtype),
                "norm_q": jnp.asarray(sd[f"{b}.self_attn.norm_q.weight"], f32),
                "norm_k": jnp.asarray(sd[f"{b}.self_attn.norm_k.weight"], f32),
            },
            "cross_attn": {
                "q": _lin(sd, f"{b}.cross_attn.q", dtype),
                "k": _lin(sd, f"{b}.cross_attn.k", dtype),
                "v": _lin(sd, f"{b}.cross_attn.v", dtype),
                "o": _lin(sd, f"{b}.cross_attn.o", dtype),
                "norm_q": jnp.asarray(sd[f"{b}.cross_attn.norm_q.weight"], f32),
                "norm_k": jnp.asarray(sd[f"{b}.cross_attn.norm_k.weight"], f32),
            },
            "norm3": {
                "w": jnp.asarray(sd[f"{b}.norm3.weight"], f32),
                "b": jnp.asarray(sd[f"{b}.norm3.bias"], f32),
            },
            "ffn": {
                "fc1": _lin(sd, f"{b}.ffn.0", dtype),
                "fc2": _lin(sd, f"{b}.ffn.2", dtype),
            },
        }
        if f"{b}.cross_attn.k_img.weight" in sd:
            p["cross_attn"]["k_img"] = _lin(sd, f"{b}.cross_attn.k_img", dtype)
            p["cross_attn"]["v_img"] = _lin(sd, f"{b}.cross_attn.v_img", dtype)
            p["cross_attn"]["norm_k_img"] = jnp.asarray(
                sd[f"{b}.cross_attn.norm_k_img.weight"], f32
            )
        return p

    pe_w = sd["patch_embedding.weight"]
    d = pe_w.shape[0]
    params = {
        "patch_embedding": {
            "w": jnp.asarray(pe_w.reshape(d, -1).T, dtype),
            "b": jnp.asarray(sd["patch_embedding.bias"], dtype),
        },
        "text_embedding": {
            "fc1": _lin(sd, "text_embedding.0", dtype),
            "fc2": _lin(sd, "text_embedding.2", dtype),
        },
        "time_embedding": {
            "fc1": _lin(sd, "time_embedding.0", f32),
            "fc2": _lin(sd, "time_embedding.2", f32),
        },
        "time_projection": _lin(sd, "time_projection.1", f32),
        "head": {
            "modulation": jnp.asarray(sd["head.modulation"].reshape(2, -1), f32),
            "out": _lin(sd, "head.head", dtype),
        },
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
    }
    if "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "norm1": {
                "w": jnp.asarray(sd["img_emb.proj.0.weight"], f32),
                "b": jnp.asarray(sd["img_emb.proj.0.bias"], f32),
            },
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm2": {
                "w": jnp.asarray(sd["img_emb.proj.4.weight"], f32),
                "b": jnp.asarray(sd["img_emb.proj.4.bias"], f32),
            },
        }
    return params


# ---------------------------------------------------------------------------
# Wan VAE (wan_orig naming)
# ---------------------------------------------------------------------------


def convert_wan_vae(sd: dict, cfg, dtype=jnp.float32):
    f32 = jnp.float32

    def res(prefix):
        p = {
            "norm1": jnp.asarray(sd[f"{prefix}.residual.0.gamma"].reshape(-1), f32),
            "conv1": _conv3d(sd, f"{prefix}.residual.2", dtype),
            "norm2": jnp.asarray(sd[f"{prefix}.residual.3.gamma"].reshape(-1), f32),
            "conv2": _conv3d(sd, f"{prefix}.residual.6", dtype),
        }
        if f"{prefix}.shortcut.weight" in sd:
            p["shortcut"] = _conv3d(sd, f"{prefix}.shortcut", dtype)
        return p

    def attn(prefix):
        return {
            "norm": jnp.asarray(sd[f"{prefix}.norm.gamma"].reshape(-1), f32),
            "to_qkv": _conv2d(sd, f"{prefix}.to_qkv", dtype),
            "proj": _conv2d(sd, f"{prefix}.proj", dtype),
        }

    def tower(side):  # "encoder.downsamples" / "decoder.upsamples"
        prefix = f"{side}.downsamples" if side == "encoder" else f"{side}.upsamples"
        idxs = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"{prefix}\.(\d+)\.", k))}
        )
        stages, stage = [], {"blocks": []}
        for i in idxs:
            kr = f"{prefix}.{i}"
            if f"{kr}.residual.0.gamma" in sd:
                stage["blocks"].append(res(kr))
            elif f"{kr}.norm.gamma" in sd:
                stage["blocks"].append(attn(kr))
            else:  # resample ends the stage
                rs = {}
                if f"{kr}.resample.1.weight" in sd:
                    rs["conv"] = _conv2d(sd, f"{kr}.resample.1", dtype)
                if f"{kr}.time_conv.weight" in sd:
                    rs["time_conv"] = _conv3d(sd, f"{kr}.time_conv", dtype)
                stage["resample"] = rs
                stages.append(stage)
                stage = {"blocks": []}
        stages.append(stage)
        return stages

    def middle(side):
        return [
            res(f"{side}.middle.0"),
            attn(f"{side}.middle.1"),
            res(f"{side}.middle.2"),
        ]

    return {
        "encoder": {
            "conv1": _conv3d(sd, "encoder.conv1", dtype),
            "down": tower("encoder"),
            "middle": middle("encoder"),
            "head_norm": jnp.asarray(sd["encoder.head.0.gamma"].reshape(-1), f32),
            "head_conv": _conv3d(sd, "encoder.head.2", dtype),
        },
        "decoder": {
            "conv1": _conv3d(sd, "decoder.conv1", dtype),
            "up": tower("decoder"),
            "middle": middle("decoder"),
            "head_norm": jnp.asarray(sd["decoder.head.0.gamma"].reshape(-1), f32),
            "head_conv": _conv3d(sd, "decoder.head.2", dtype),
        },
        "conv1": _conv3d(sd, "conv1", dtype),
        "conv2": _conv3d(sd, "conv2", dtype),
    }


# ---------------------------------------------------------------------------
# UMT5 (wan_orig t5.py naming)
# ---------------------------------------------------------------------------


def convert_umt5(sd: dict, cfg, dtype=jnp.bfloat16):
    f32 = jnp.float32

    def block(i):
        b = f"blocks.{i}"
        return {
            "norm1": jnp.asarray(sd[f"{b}.norm1.weight"], f32),
            "q": _lin(sd, f"{b}.attn.q", dtype),
            "k": _lin(sd, f"{b}.attn.k", dtype),
            "v": _lin(sd, f"{b}.attn.v", dtype),
            "o": _lin(sd, f"{b}.attn.o", dtype),
            "rel_embedding": jnp.asarray(sd[f"{b}.pos_embedding.embedding.weight"], f32),
            "norm2": jnp.asarray(sd[f"{b}.norm2.weight"], f32),
            "gate": _lin(sd, f"{b}.ffn.gate.0", dtype),
            "fc1": _lin(sd, f"{b}.ffn.fc1", dtype),
            "fc2": _lin(sd, f"{b}.ffn.fc2", dtype),
        }

    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"], dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "norm": jnp.asarray(sd["norm.weight"], f32),
    }


# ---------------------------------------------------------------------------
# HunyuanVideo VAE (884-16c-hy)
# ---------------------------------------------------------------------------


def convert_hyvideo_vae(sd: dict, cfg, dtype=jnp.float32):
    """AutoencoderKLCausal3D state dict -> models/hyvideo/vae.py pytree.

    Reference names (hyvideo_orig/vae/vae.py modules; CausalConv3d wraps a
    plain Conv3d as `.conv`; diffusers Attention names to_q/to_k/to_v/
    to_out.0/group_norm)."""

    def cconv(key):
        return _conv3d(sd, f"{key}.conv", dtype)

    def norm(key):
        return {"g": jnp.asarray(sd[f"{key}.weight"], dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def res(prefix):
        p = {"norm1": norm(f"{prefix}.norm1"), "conv1": cconv(f"{prefix}.conv1"),
             "norm2": norm(f"{prefix}.norm2"), "conv2": cconv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.conv.weight" in sd:
            p["shortcut"] = cconv(f"{prefix}.conv_shortcut")
        return p

    def lin(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"].T, dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def mid(prefix):
        return {
            "res0": res(f"{prefix}.resnets.0"),
            "attn": {
                "norm": norm(f"{prefix}.attentions.0.group_norm"),
                "q": lin(f"{prefix}.attentions.0.to_q"),
                "k": lin(f"{prefix}.attentions.0.to_k"),
                "v": lin(f"{prefix}.attentions.0.to_v"),
                "o": lin(f"{prefix}.attentions.0.to_out.0"),
            },
            "res1": res(f"{prefix}.resnets.1"),
        }

    down = []
    for i in range(cfg.num_blocks):
        blk = {"res": [res(f"encoder.down_blocks.{i}.resnets.{j}")
                       for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.conv.weight" in sd:
            blk["ds"] = cconv(f"encoder.down_blocks.{i}.downsamplers.0.conv")
        down.append(blk)
    up = []
    for i in range(cfg.num_blocks):
        blk = {"res": [res(f"decoder.up_blocks.{i}.resnets.{j}")
                       for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.conv.weight" in sd:
            blk["us"] = cconv(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        up.append(blk)

    def plain1x1(key):
        w = sd[f"{key}.weight"].transpose(2, 3, 4, 1, 0)
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    return {
        "encoder": {
            "conv_in": cconv("encoder.conv_in"),
            "down": down,
            "mid": mid("encoder.mid_block"),
            "norm_out": norm("encoder.conv_norm_out"),
            "conv_out": cconv("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": cconv("decoder.conv_in"),
            "mid": mid("decoder.mid_block"),
            "up": up,
            "norm_out": norm("decoder.conv_norm_out"),
            "conv_out": cconv("decoder.conv_out"),
        },
        "quant_conv": plain1x1("quant_conv"),
        "post_quant_conv": plain1x1("post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# HunyuanVideo text encoders: LLaMA-3 (llm) + CLIP-L
# ---------------------------------------------------------------------------


def convert_llama(sd: dict, cfg, *, skip_layers: int = 2, dtype=jnp.bfloat16):
    """HF LlamaModel / LlamaForCausalLM state dict -> models/common/llama.py.

    Only layers 0..num_layers-1-skip_layers are materialized: hyvideo uses
    hidden_states[-(skip+1)] (text_encoder/__init__.py:277-283), so the last
    `skip_layers` layers and the final norm are never needed.
    """
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    f32 = jnp.float32

    def block(i):
        b = f"{pre}layers.{i}"
        return {
            "ln1": jnp.asarray(sd[f"{b}.input_layernorm.weight"], f32),
            "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
            "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
            "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
            "o": _lin(sd, f"{b}.self_attn.o_proj", dtype),
            "ln2": jnp.asarray(sd[f"{b}.post_attention_layernorm.weight"], f32),
            "gate": _lin(sd, f"{b}.mlp.gate_proj", dtype),
            "up": _lin(sd, f"{b}.mlp.up_proj", dtype),
            "down": _lin(sd, f"{b}.mlp.down_proj", dtype),
        }

    n_active = cfg.num_layers - skip_layers
    return {
        "embed": jnp.asarray(sd[f"{pre}embed_tokens.weight"], dtype),
        "blocks": _stack([block(i) for i in range(n_active)]),
    }


def convert_qwen_lm(sd: dict, cfg, dtype=jnp.bfloat16):
    """HF Qwen2ForCausalLM / LlamaForCausalLM state dict -> full-depth
    causal-LM pytree for models/common/llama.py llama_lm_logits (the
    transformers-free local prompt-extension backend,
    utils/prompt_extend.JaxQwenPromptExpander; reference backend:
    wan_orig/utils/prompt_extend.py:289-440).

    Same block mapping as convert_llama (Qwen2 differs only in q/k/v biases,
    which _lin picks up automatically) plus the final norm and the LM head
    (omitted when weight-tied to the embedding)."""
    out = convert_llama(sd, cfg, skip_layers=0, dtype=dtype)
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    out["final_norm"] = jnp.asarray(sd[f"{pre}norm.weight"], jnp.float32)
    if "lm_head.weight" in sd:
        out["lm_head"] = jnp.asarray(sd["lm_head.weight"].T, dtype)
    return out


def convert_clip_text(sd: dict, cfg, dtype=jnp.float32):
    """HF CLIPTextModel state dict -> models/common/clip.py pytree."""
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""

    def ln(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], jnp.float32),
                "b": jnp.asarray(sd[f"{key}.bias"], jnp.float32)}

    def block(i):
        b = f"{pre}encoder.layers.{i}"
        return {
            "ln1": ln(f"{b}.layer_norm1"),
            "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
            "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
            "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
            "o": _lin(sd, f"{b}.self_attn.out_proj", dtype),
            "ln2": ln(f"{b}.layer_norm2"),
            "fc1": _lin(sd, f"{b}.mlp.fc1", dtype),
            "fc2": _lin(sd, f"{b}.mlp.fc2", dtype),
        }

    return {
        "token_embedding": jnp.asarray(sd[f"{pre}embeddings.token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(sd[f"{pre}embeddings.position_embedding.weight"], dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "final_ln": ln(f"{pre}final_layer_norm"),
    }


# ---------------------------------------------------------------------------
# HunyuanVideo DiT
# ---------------------------------------------------------------------------


def convert_hyvideo_dit(sd: dict, cfg, dtype=jnp.bfloat16):
    """HYVideoDiffusionTransformer state dict -> models/hyvideo/model.py.

    Reference names: hyvideo_orig/modules/models.py (double/single blocks),
    token_refiner.py (txt_in), embed_layers.py / mlp_layers.py /
    modulate_layers.py (sub-modules). QKV is fused (q|k|v) in both.
    """
    f32 = jnp.float32

    def ln(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], f32),
                "b": jnp.asarray(sd[f"{key}.bias"], f32)}

    def mlp2_t(key):  # TimestepEmbedder .mlp Sequential(0, act, 2)
        return {"fc1": _lin(sd, f"{key}.mlp.0", f32), "fc2": _lin(sd, f"{key}.mlp.2", f32)}

    def dblock(i):
        b = f"double_blocks.{i}"
        side = lambda s: {
            f"{s}_mod": _lin(sd, f"{b}.{s}_mod.linear", dtype),
            f"{s}_qkv": _lin(sd, f"{b}.{s}_attn_qkv", dtype),
            f"{s}_q_norm": jnp.asarray(sd[f"{b}.{s}_attn_q_norm.weight"], f32),
            f"{s}_k_norm": jnp.asarray(sd[f"{b}.{s}_attn_k_norm.weight"], f32),
            f"{s}_proj": _lin(sd, f"{b}.{s}_attn_proj", dtype),
            f"{s}_mlp": {"fc1": _lin(sd, f"{b}.{s}_mlp.fc1", dtype),
                         "fc2": _lin(sd, f"{b}.{s}_mlp.fc2", dtype)},
        }
        return {**side("img"), **side("txt")}

    def sblock(i):
        b = f"single_blocks.{i}"
        return {
            "modulation": _lin(sd, f"{b}.modulation.linear", dtype),
            "linear1": _lin(sd, f"{b}.linear1", dtype),
            "linear2": _lin(sd, f"{b}.linear2", dtype),
            "q_norm": jnp.asarray(sd[f"{b}.q_norm.weight"], f32),
            "k_norm": jnp.asarray(sd[f"{b}.k_norm.weight"], f32),
        }

    def refiner(i):
        b = f"txt_in.individual_token_refiner.blocks.{i}"
        return {
            "norm1": ln(f"{b}.norm1"),
            "qkv": _lin(sd, f"{b}.self_attn_qkv", dtype),
            "proj": _lin(sd, f"{b}.self_attn_proj", dtype),
            "norm2": ln(f"{b}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc2": _lin(sd, f"{b}.mlp.fc2", dtype)},
            "adaln": _lin(sd, f"{b}.adaLN_modulation.1", dtype),
        }

    pe_w = sd["img_in.proj.weight"]  # (h, C, pt, ph, pw)
    h = pe_w.shape[0]
    params = {
        "img_in": {"w": jnp.asarray(pe_w.reshape(h, -1).T, dtype),
                   "b": jnp.asarray(sd["img_in.proj.bias"], dtype)},
        "time_in": mlp2_t("time_in"),
        "vector_in": {"fc1": _lin(sd, "vector_in.in_layer", dtype),
                      "fc2": _lin(sd, "vector_in.out_layer", dtype)},
        "txt_in": {
            "input_embedder": _lin(sd, "txt_in.input_embedder", dtype),
            "t_embedder": mlp2_t("txt_in.t_embedder"),
            "c_embedder": {"fc1": _lin(sd, "txt_in.c_embedder.linear_1", dtype),
                           "fc2": _lin(sd, "txt_in.c_embedder.linear_2", dtype)},
            "blocks": _stack([refiner(i) for i in range(cfg.refiner_depth)]),
        },
        "double_blocks": _stack([dblock(i) for i in range(cfg.mm_double_blocks_depth)]),
        "single_blocks": _stack([sblock(i) for i in range(cfg.mm_single_blocks_depth)]),
        "final_adaln": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        "final_linear": _lin(sd, "final_layer.linear", dtype),
    }
    if "guidance_in.mlp.0.weight" in sd:
        params["guidance_in"] = mlp2_t("guidance_in")
    return params


# ---------------------------------------------------------------------------
# Cosmos DiT
# ---------------------------------------------------------------------------


def convert_cosmos_dit(sd: dict, cfg, dtype=jnp.bfloat16):
    """diffusers CosmosTransformer3DModel state dict -> models/cosmos/model.py.

    Names per diffusers transformer_cosmos.py (the reference's live model,
    svg/models/cosmos/custom_models.py subclasses it)."""
    f32 = jnp.float32

    def norm(key):
        return {"fc1": _lin(sd, f"{key}.linear_1", f32), "fc2": _lin(sd, f"{key}.linear_2", f32)}

    def attn(key):
        return {
            "q": _lin(sd, f"{key}.to_q", dtype),
            "k": _lin(sd, f"{key}.to_k", dtype),
            "v": _lin(sd, f"{key}.to_v", dtype),
            "o": _lin(sd, f"{key}.to_out.0", dtype),
            "norm_q": jnp.asarray(sd[f"{key}.norm_q.weight"], f32),
            "norm_k": jnp.asarray(sd[f"{key}.norm_k.weight"], f32),
        }

    def block(i):
        b = f"transformer_blocks.{i}"
        return {
            "norm1": norm(f"{b}.norm1"),
            "attn1": attn(f"{b}.attn1"),
            "norm2": norm(f"{b}.norm2"),
            "attn2": attn(f"{b}.attn2"),
            "norm3": norm(f"{b}.norm3"),
            "ff1": _lin(sd, f"{b}.ff.net.0.proj", dtype),
            "ff2": _lin(sd, f"{b}.ff.net.2", dtype),
        }

    params = {
        "patch_embed": _lin(sd, "patch_embed.proj", dtype),
        "time_embed": {
            "t_fc1": _lin(sd, "time_embed.t_embedder.linear_1", f32),
            "t_fc2": _lin(sd, "time_embed.t_embedder.linear_2", f32),
            "norm": jnp.asarray(sd["time_embed.norm.weight"], f32),
        },
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "norm_out": norm("norm_out"),
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    if "learnable_pos_embed.pos_emb_t" in sd:
        params["pos_embed"] = {
            "t": jnp.asarray(sd["learnable_pos_embed.pos_emb_t"], dtype),
            "h": jnp.asarray(sd["learnable_pos_embed.pos_emb_h"], dtype),
            "w": jnp.asarray(sd["learnable_pos_embed.pos_emb_w"], dtype),
        }
    return params


def convert_t5_hf(sd: dict, cfg, dtype=jnp.bfloat16):
    """HF T5EncoderModel state dict -> models/common/t5.py pytree.

    Handles both T5 v1.0 (DenseReluDense.wi, shared relative bias — the
    Cosmos text encoder t5-11b) and v1.1/UMT5 (wi_0/wi_1 gated, per-layer
    bias when present)."""
    f32 = jnp.float32
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""

    def block(i):
        b = f"{pre}block.{i}"
        a = f"{b}.layer.0.SelfAttention"
        ff = f"{b}.layer.1.DenseReluDense"
        p = {
            "norm1": jnp.asarray(sd[f"{b}.layer.0.layer_norm.weight"], f32),
            "q": _lin(sd, f"{a}.q", dtype),
            "k": _lin(sd, f"{a}.k", dtype),
            "v": _lin(sd, f"{a}.v", dtype),
            "o": _lin(sd, f"{a}.o", dtype),
            "norm2": jnp.asarray(sd[f"{b}.layer.1.layer_norm.weight"], f32),
        }
        p["fc2"] = _lin(sd, f"{ff}.wo", dtype)
        if f"{ff}.wi.weight" in sd:
            p["fc1"] = _lin(sd, f"{ff}.wi", dtype)
        else:
            p["gate"] = _lin(sd, f"{ff}.wi_0", dtype)
            p["fc1"] = _lin(sd, f"{ff}.wi_1", dtype)
        if not cfg.shared_rel_bias:
            p["rel_embedding"] = jnp.asarray(
                sd[f"{a}.relative_attention_bias.weight"], f32
            )
        return p

    embed_key = "shared.weight" if "shared.weight" in sd else f"{pre}embed_tokens.weight"
    params = {
        "token_embedding": jnp.asarray(sd[embed_key], dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "norm": jnp.asarray(sd[f"{pre}final_layer_norm.weight"], f32),
    }
    if cfg.shared_rel_bias:
        params["rel_embedding"] = jnp.asarray(
            sd[f"{pre}block.0.layer.0.SelfAttention.relative_attention_bias.weight"], f32
        )
    return params


def convert_cog_dit(sd: dict, cfg, dtype=jnp.bfloat16):
    """diffusers CogVideoXTransformer3DModel state dict -> models/cog/model.py.

    The reference's live model (svg/models/cog/custom_models.py subclasses
    it). v1.5 checkpoints use a Linear patch_embed.proj (patch_size_t=2);
    v1.0's Conv2d kernel==stride is flattened to the same matmul layout."""
    f32 = jnp.float32

    def ln(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], f32),
                "b": jnp.asarray(sd[f"{key}.bias"], f32)}

    def block(i):
        b = f"transformer_blocks.{i}"
        return {
            "norm1": {"lin": _lin(sd, f"{b}.norm1.linear", f32), "norm": ln(f"{b}.norm1.norm")},
            "attn": {
                "q": _lin(sd, f"{b}.attn1.to_q", dtype),
                "k": _lin(sd, f"{b}.attn1.to_k", dtype),
                "v": _lin(sd, f"{b}.attn1.to_v", dtype),
                "o": _lin(sd, f"{b}.attn1.to_out.0", dtype),
                "norm_q": ln(f"{b}.attn1.norm_q"),
                "norm_k": ln(f"{b}.attn1.norm_k"),
            },
            "norm2": {"lin": _lin(sd, f"{b}.norm2.linear", f32), "norm": ln(f"{b}.norm2.norm")},
            "ffn": {"fc1": _lin(sd, f"{b}.ff.net.0.proj", dtype),
                    "fc2": _lin(sd, f"{b}.ff.net.2", dtype)},
        }

    pw = sd["patch_embed.proj.weight"]
    if pw.ndim == 4:  # v1.0 Conv2d (h, in, p, p)
        pp = {"w": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype),
              "b": jnp.asarray(sd["patch_embed.proj.bias"], dtype)}
    else:
        pp = _lin(sd, "patch_embed.proj", dtype)

    params = {
        "time_emb": {"fc1": _lin(sd, "time_embedding.linear_1", f32),
                     "fc2": _lin(sd, "time_embedding.linear_2", f32)},
        "patch_proj": pp,
        "text_proj": _lin(sd, "patch_embed.text_proj", dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "norm_final": ln("norm_final"),
        "norm_out": ln("norm_out.norm"),
        "norm_out_lin": _lin(sd, "norm_out.linear", f32),
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    if "ofs_embedding.linear_1.weight" in sd:
        params["ofs_emb"] = {"fc1": _lin(sd, "ofs_embedding.linear_1", f32),
                             "fc2": _lin(sd, "ofs_embedding.linear_2", f32)}
    return params


def cog_config_from_json(path: str):
    """CogConfig from a diffusers CogVideoXTransformer3DModel config.json
    (num_attention_heads/attention_head_dim/ofs_embed_dim naming)."""
    from sparse_videogen_tpu.models.cog.model import CogConfig

    cj = os.path.join(path, "config.json")
    if not os.path.isfile(cj):
        return None
    with open(cj) as f:
        c = json.load(f)
    heads = c.get("num_attention_heads", 48)
    hd = c.get("attention_head_dim", 64)
    return CogConfig(
        num_layers=c.get("num_layers", 42),
        hidden_size=heads * hd,
        heads_num=heads,
        head_dim=hd,
        text_len=c.get("max_text_seq_length", 226),
        text_dim=c.get("text_embed_dim", 4096),
        in_channels=c.get("in_channels", 16),
        out_channels=c.get("out_channels", 16),
        patch_size=c.get("patch_size", 2),
        patch_size_t=c.get("patch_size_t") or 2,
        time_embed_dim=c.get("time_embed_dim", 512),
        ofs_embed=c.get("ofs_embed_dim") is not None,
        eps=c.get("norm_eps", 1e-5),
    )


def convert_clip_vision(sd: dict, cfg, dtype=jnp.float32):
    """CLIP ViT vision tower -> models/common/clip.py vision pytree.

    Accepts both the HF CLIPVisionModel naming (the Wan I2V repo's
    image_encoder/, wan_i2v_inference.py:78) and the wan_orig vendored
    XLMRobertaCLIP naming (visual.* with fused to_qkv, clip.py:215-316)."""
    f32 = jnp.float32

    def ln(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], f32),
                "b": jnp.asarray(sd[f"{key}.bias"], f32)}

    if any(k.startswith("vision_model.") for k in sd):
        pre = "vision_model."

        def block(i):
            b = f"{pre}encoder.layers.{i}"
            return {
                "ln1": ln(f"{b}.layer_norm1"),
                "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{b}.self_attn.out_proj", dtype),
                "ln2": ln(f"{b}.layer_norm2"),
                "fc1": _lin(sd, f"{b}.mlp.fc1", dtype),
                "fc2": _lin(sd, f"{b}.mlp.fc2", dtype),
            }

        pw = sd[f"{pre}embeddings.patch_embedding.weight"]
        return {
            "patch_proj": {"w": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype)},
            "cls": jnp.asarray(sd[f"{pre}embeddings.class_embedding"].reshape(1, -1), dtype),
            "pos": jnp.asarray(sd[f"{pre}embeddings.position_embedding.weight"], dtype),
            "pre_ln": ln(f"{pre}pre_layrnorm"),  # (sic) HF attribute name
            "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
            "post_ln": ln(f"{pre}post_layernorm"),
        }

    # wan_orig naming: fused to_qkv split into q/k/v
    def block(i):
        b = f"visual.transformer.{i}"
        qkv_w = sd[f"{b}.attn.to_qkv.weight"]  # (3*dim, dim)
        qkv_b = sd[f"{b}.attn.to_qkv.bias"]
        d = qkv_w.shape[1]
        p = {
            "ln1": ln(f"{b}.norm1"),
            "ln2": ln(f"{b}.norm2"),
            "o": _lin(sd, f"{b}.attn.proj", dtype),
            "fc1": _lin(sd, f"{b}.mlp.0", dtype),
            "fc2": _lin(sd, f"{b}.mlp.2", dtype),
        }
        for j, n in enumerate("qkv"):
            p[n] = {"w": jnp.asarray(qkv_w[j * d:(j + 1) * d].T, dtype),
                    "b": jnp.asarray(qkv_b[j * d:(j + 1) * d], dtype)}
        return p

    pw = sd["visual.patch_embedding.weight"]
    return {
        "patch_proj": {"w": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype)},
        "cls": jnp.asarray(sd["visual.cls_embedding"].reshape(1, -1), dtype),
        "pos": jnp.asarray(sd["visual.pos_embedding"].reshape(-1, pw.shape[0]), dtype),
        "pre_ln": ln("visual.pre_norm"),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "post_ln": ln("visual.post_norm"),
    }


def convert_llava(sd: dict, llama_cfg, vision_cfg, *, skip_layers: int = 2, dtype=jnp.bfloat16):
    """HF LlavaForConditionalGeneration state dict -> models/common/llava.py
    pytree {vision, projector, llama}.

    Handles both naming generations: "model.vision_tower…/
    model.language_model…" (transformers >= 4.52 refactor) and the legacy
    "vision_tower…/language_model.model…"."""
    new_style = any(k.startswith("model.vision_tower.") for k in sd)
    vt = "model.vision_tower." if new_style else "vision_tower."
    lm = "model.language_model." if new_style else "language_model.model."
    proj = "model.multi_modal_projector." if new_style else "multi_modal_projector."

    vis_sd = {k[len(vt):]: v for k, v in sd.items() if k.startswith(vt)}
    lm_sd = {k[len(lm):]: v for k, v in sd.items() if k.startswith(lm)}
    return {
        "vision": convert_clip_vision(vis_sd, vision_cfg, dtype=jnp.float32),
        "projector": {
            "fc1": _lin(sd, f"{proj}linear_1", dtype),
            "fc2": _lin(sd, f"{proj}linear_2", dtype),
        },
        "llama": convert_llama(lm_sd, llama_cfg, skip_layers=skip_layers, dtype=dtype),
    }


def cog_vae_config_from_json(path: str):
    """CogVAEConfig from a diffusers AutoencoderKLCogVideoX config.json."""
    from sparse_videogen_tpu.models.cog.vae import CogVAEConfig

    cj = os.path.join(path, "config.json")
    if not os.path.isfile(cj):
        return None
    with open(cj) as f:
        c = json.load(f)
    return CogVAEConfig(
        in_channels=c.get("in_channels", 3),
        out_channels=c.get("out_channels", 3),
        block_out_channels=tuple(c.get("block_out_channels", (128, 256, 256, 512))),
        layers_per_block=c.get("layers_per_block", 3),
        latent_channels=c.get("latent_channels", 16),
        norm_num_groups=c.get("norm_num_groups", 32),
        scaling_factor=c.get("scaling_factor", 0.7),
        invert_scale_latents=c.get("invert_scale_latents", False),
        temporal_compression=c.get("temporal_compression_ratio", 4),
    )


def convert_cog_vae(sd: dict, cfg, dtype=jnp.float32):
    """diffusers AutoencoderKLCogVideoX state dict -> models/cog/vae.py pytree.

    Naming: CogVideoXCausalConv3d wraps its Conv3d as `.conv`; resnet
    shortcuts are plain 1x1x1 Conv3d (`conv_shortcut.weight`, no wrapper);
    decoder norms are CogVideoXSpatialNorm3D (`norm_layer` + causal 1x1x1
    `conv_y`/`conv_b`); down/upsamplers hold per-frame Conv2d weights."""

    def cconv(key):
        return _conv3d(sd, f"{key}.conv", dtype)

    def gnorm(key):
        return {"g": jnp.asarray(sd[f"{key}.weight"], dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def snorm(key):
        return {"norm": gnorm(f"{key}.norm_layer"),
                "conv_y": cconv(f"{key}.conv_y"),
                "conv_b": cconv(f"{key}.conv_b")}

    def res(prefix, spatial):
        norm = snorm if spatial else gnorm
        p = {"norm1": norm(f"{prefix}.norm1"), "conv1": cconv(f"{prefix}.conv1"),
             "norm2": norm(f"{prefix}.norm2"), "conv2": cconv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            p["shortcut"] = _conv3d(sd, f"{prefix}.conv_shortcut", dtype)
        return p

    down = []
    for i in range(cfg.num_blocks):
        blk = {"res": [res(f"encoder.down_blocks.{i}.resnets.{j}", False)
                       for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["ds"] = {"conv": _conv2d(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)}
        down.append(blk)
    up = []
    for i in range(cfg.num_blocks):
        blk = {"res": [res(f"decoder.up_blocks.{i}.resnets.{j}", True)
                       for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["us"] = {"conv": _conv2d(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)}
        up.append(blk)
    return {
        "encoder": {
            "conv_in": cconv("encoder.conv_in"),
            "down": down,
            "mid": {"res": [res(f"encoder.mid_block.resnets.{j}", False) for j in range(2)]},
            "norm_out": gnorm("encoder.norm_out"),
            "conv_out": cconv("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": cconv("decoder.conv_in"),
            "mid": {"res": [res(f"decoder.mid_block.resnets.{j}", True) for j in range(2)]},
            "up": up,
            "norm_out": snorm("decoder.norm_out"),
            "conv_out": cconv("decoder.conv_out"),
        },
    }


# ---------------------------------------------------------------------------
# Converted-checkpoint cache: save/load param pytrees as safetensors
# ---------------------------------------------------------------------------


def convert_cosmos_vae(sd: dict, cfg, dtype=jnp.float32):
    """Cosmos continuous video tokenizer (CV8x8x8) state dict ->
    models/cosmos/vae.py pytree.

    Neither diffusers nor the NVIDIA Cosmos-Tokenizer sources exist in this
    environment, so key naming follows the published Cosmos-Tokenizer module
    tree (encoder.down.{i}.block.{j}.{norm1,conv1,norm2,conv2,nin_shortcut},
    mid.block_1/attn_1/block_2, norm_out/conv_out; CausalConv3d wraps its
    conv as `.conv3d`) with diffusers-style spellings accepted as aliases.
    Unknown layouts fail with the candidate keys AND a sample of the actual
    checkpoint keys so the mapping is a one-line fix when real weights land.
    """

    def pick(*cands):
        for c in cands:
            if f"{c}.weight" in sd:
                return c
        sample = sorted(sd.keys())[:12]
        raise KeyError(f"cosmos vae: none of {cands} in checkpoint; "
                       f"have e.g. {sample}")

    def cconv(*cands):
        key = pick(*[f"{c}{s}" for c in cands for s in (".conv3d", ".conv", "")])
        return _conv3d(sd, key, dtype)

    def gnorm(*cands):
        key = pick(*cands)
        return {"g": jnp.asarray(sd[f"{key}.weight"], dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def res(p, p_alt):
        out = {"norm1": gnorm(f"{p}.norm1", f"{p_alt}.norm1"),
               "conv1": cconv(f"{p}.conv1", f"{p_alt}.conv1"),
               "norm2": gnorm(f"{p}.norm2", f"{p_alt}.norm2"),
               "conv2": cconv(f"{p}.conv2", f"{p_alt}.conv2")}
        for sc in (f"{p}.nin_shortcut", f"{p}.conv_shortcut",
                   f"{p_alt}.conv_shortcut"):
            for suf in (".conv3d", ""):
                if f"{sc}{suf}.weight" in sd:
                    w = sd[f"{sc}{suf}.weight"]
                    w = w.transpose(2, 3, 4, 1, 0)[0, 0, 0] if w.ndim == 5 else w.T
                    out["shortcut"] = {"w": jnp.asarray(w, dtype),
                                       "b": jnp.asarray(sd[f"{sc}{suf}.bias"], dtype)}
                    return out
        return out

    def lin1(key):  # attention q/k/v/proj: 1x1x1 conv or linear -> (C, C)
        w = sd[f"{key}.weight"]
        w = w.transpose(2, 3, 4, 1, 0)[0, 0, 0] if w.ndim == 5 else \
            (w[..., 0, 0].T if w.ndim == 4 else w.T)
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def attn(p):
        return {"norm": gnorm(f"{p}.norm"),
                "q": lin1(pick(f"{p}.q", f"{p}.to_q")),
                "k": lin1(pick(f"{p}.k", f"{p}.to_k")),
                "v": lin1(pick(f"{p}.v", f"{p}.to_v")),
                "o": lin1(pick(f"{p}.proj_out", f"{p}.to_out.0"))}

    def mid(p):
        # temporal attention prefix varies (attn_2 / temporal_attn_1); a
        # checkpoint with neither is an architecture variant this module
        # tree cannot represent — fail loudly, never run temporal attention
        # with the spatial weights
        tp = None
        for cand in (f"{p}.attn_2", f"{p}.temporal_attn_1"):
            if f"{cand}.norm.weight" in sd:
                tp = cand
                break
        if tp is None:
            raise KeyError(
                f"cosmos vae: no temporal attention under {p} "
                f"(tried attn_2/temporal_attn_1) — architecture variant "
                f"without temporal attention needs the module gated off")
        return {"res1": res(f"{p}.block_1", f"{p}.resnets.0"),
                "attn_s": attn(f"{p}.attn_1"),
                "attn_t": attn(tp),
                "res2": res(f"{p}.block_2", f"{p}.resnets.1")}

    n_levels = len(cfg.channels_mult)
    enc_levels = []
    for i in range(n_levels):
        level = {"res": [res(f"encoder.down.{i}.block.{j}",
                             f"encoder.down_blocks.{i}.resnets.{j}")
                         for j in range(cfg.num_res_blocks)]}
        if cfg.downsample(i):
            level["down"] = cconv(f"encoder.down.{i}.downsample",
                                  f"encoder.down_blocks.{i}.downsamplers.0")
        enc_levels.append(level)
    dec_levels = []
    for d, i in enumerate(reversed(range(n_levels))):
        level = {"res": [res(f"decoder.up.{i}.block.{j}",
                             f"decoder.up_blocks.{d}.resnets.{j}")
                         for j in range(cfg.num_res_blocks + 1)]}
        if cfg.downsample(i):
            level["up"] = cconv(f"decoder.up.{i}.upsample",
                                f"decoder.up_blocks.{d}.upsamplers.0")
        dec_levels.append(level)
    return {
        "encoder": {
            "conv_in": cconv("encoder.conv_in"),
            "levels": enc_levels,
            "mid": mid("encoder.mid"),
            "norm_out": gnorm("encoder.norm_out"),
            "conv_out": cconv("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": cconv("decoder.conv_in"),
            "mid": mid("decoder.mid"),
            "levels": dec_levels,
            "norm_out": gnorm("decoder.norm_out"),
            "conv_out": cconv("decoder.conv_out"),
        },
    }


def _flatten_pytree(tree, prefix=()):
    """Nested dict/list/tuple pytree -> {path: leaf}. Path segments join with
    '/'; list indices are plain decimal segments (structure is recorded
    separately, so no ambiguity)."""
    out = {}
    if isinstance(tree, dict):
        for k in tree:
            out.update(_flatten_pytree(tree[k], prefix + (str(k),)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_pytree(v, prefix + (str(i),)))
    else:
        out["/".join(prefix)] = tree
    return out


def _structure_of(tree):
    if isinstance(tree, dict):
        return {"d": {k: _structure_of(v) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"l": [_structure_of(v) for v in tree]}
    return None  # leaf


def save_pytree(path: str, params) -> None:
    """Write a converted param pytree to `path`/params.safetensors +
    structure.json. Conversion of a large HF checkpoint is pure host work —
    cache it once and reload through the fast path afterwards."""
    import numpy as _np

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = {k: _np.asarray(v) for k, v in _flatten_pytree(params).items()}
    save_file(flat, os.path.join(path, "params.safetensors"))
    with open(os.path.join(path, "structure.json"), "w") as f:
        json.dump(_structure_of(params), f)


def load_pytree(path: str, dtype=None):
    """Inverse of save_pytree. Leaves come back as jnp arrays (original
    dtypes, or `dtype` for floating leaves when given)."""
    from safetensors import safe_open

    with open(os.path.join(path, "structure.json")) as f:
        structure = json.load(f)
    leaves = {}
    with safe_open(os.path.join(path, "params.safetensors"), framework="np") as f:
        for k in f.keys():
            v = jnp.asarray(f.get_tensor(k))
            if dtype is not None and jnp.issubdtype(v.dtype, jnp.floating):
                v = v.astype(dtype)
            leaves[k] = v

    def rebuild(node, prefix):
        if node is None:
            return leaves["/".join(prefix)]
        if "d" in node:
            return {k: rebuild(v, prefix + (k,)) for k, v in node["d"].items()}
        return [rebuild(v, prefix + (str(i),)) for i, v in enumerate(node["l"])]

    return rebuild(structure, ())
