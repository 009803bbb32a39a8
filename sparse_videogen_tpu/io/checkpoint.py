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
