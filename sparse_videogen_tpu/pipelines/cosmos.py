"""Cosmos Text2World generation pipeline.

Mirrors the reference entry (/root/reference/cosmos_t2v_inference.py +
diffusers CosmosTextToWorldPipeline): EDM Euler sampler with Karras sigmas,
classifier-free guidance (default 7.0), T5 text conditioning, per-frame
timesteps supported by the model. Latent-level (the Cosmos CV8x8x8 video
tokenizer is a separate decode step; attach via `vae_decode`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import (
    SAPConfig,
    SparseMode,
    SVGConfig,
    VideoLayout,
    WarmupSchedule,
)
from sparse_videogen_tpu.models.cosmos import model as CM
from sparse_videogen_tpu.schedulers import EDMEuler
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.logging import logger

VAE_SPATIAL = 8
VAE_TEMPORAL = 8  # Cosmos CV8x8x8 tokenizer


def cosmos_layout(cfg: CM.CosmosConfig, height: int, width: int, num_frames: int) -> VideoLayout:
    pt, ph, pw = cfg.patch_size
    nf = (1 + (num_frames - 1) // VAE_TEMPORAL) // pt
    fs = (height // (VAE_SPATIAL * ph)) * (width // (VAE_SPATIAL * pw))
    return VideoLayout(num_frames=nf, frame_size=fs)


@dataclasses.dataclass
class CosmosPipeline:
    model_cfg: CM.CosmosConfig
    params: dict
    text_encoder: Optional[Callable] = None  # prompts -> (B, L, text_embed_dim)
    vae_decode: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16

    def generate_latents(
        self,
        context,  # (1, L, text_embed_dim)
        context_null,
        *,
        height: int = 704,
        width: int = 1280,
        num_frames: int = 121,
        num_inference_steps: int = 35,
        guidance_scale: float = 7.0,
        fps: int = 30,
        pattern: str = "dense",
        first_layers_fp: float = 0.025,
        first_times_fp: float = 0.075,
        svg: SVGConfig = SVGConfig(),
        sap: SAPConfig = SAPConfig(),
        seed: int = 0,
        mesh=None,  # dp x rp x sp device mesh (parallel/mesh.py)
        logging_file=None,  # SAP density JSONL (reference --logging_file)
    ):
        cfg = self.model_cfg
        layout = cosmos_layout(cfg, height, width, num_frames)
        sch = EDMEuler(num_inference_steps)
        warmup = WarmupSchedule.from_fractions(
            first_layers_fp, first_times_fp, cfg.num_layers, sch.timesteps
        )
        plan = make_svg1_plan(layout, svg, warmup)
        mode = SparseMode(pattern)
        if mode == SparseMode.DENSE:
            runtime = DenseRuntime(plan)
        elif mode == SparseMode.SVG:
            runtime = SVG1Runtime(plan)
        else:
            runtime = SAPRuntime(plan, sap, warmup)
        if mesh is not None:
            from sparse_videogen_tpu.parallel import parallelize_runtime

            runtime = parallelize_runtime(runtime, mesh, plan, pattern=pattern,
                                          sap=sap, warmup=warmup)

        F_lat = 1 + (num_frames - 1) // VAE_TEMPORAL
        H_lat, W_lat = height // VAE_SPATIAL, width // VAE_SPATIAL
        key = jax.random.PRNGKey(seed)
        key, nkey = jax.random.split(key)
        lat = jax.random.normal(nkey, (1, cfg.in_channels, F_lat, H_lat, W_lat), jnp.float32)
        lat = lat * sch.init_noise_sigma
        logger.info(
            f"cosmos generate: seq={layout.seq_len}, steps={num_inference_steps}, pattern={pattern}"
        )

        consts = runtime.consts()
        astates = runtime.init_state(2 * cfg.num_attention_heads, cfg.attention_head_dim, cfg.num_layers)
        ctx2 = jnp.concatenate([context, context_null], axis=0)

        @jax.jit
        def fwd(params, lat, c_in, t, ctx2, states, consts, key):
            x_in = lat * c_in  # EDM input preconditioning, fused into the jit
            x = jnp.concatenate([x_in, x_in], axis=0).astype(self.dtype)
            out, states = CM.cosmos_forward(
                params, cfg, x, jnp.full((2,), t, jnp.float32), ctx2,
                attention=runtime, attn_states=states, attn_consts=consts, rng=key,
            )
            return out[:1].astype(jnp.float32), out[1:2].astype(jnp.float32), states

        from sparse_videogen_tpu.utils.density import DensityLogger, log_sap_states

        dlog = DensityLogger(logging_file if pattern == "SAP" else None)
        sstate = sch.init_state()
        for i in range(num_inference_steps):
            t = float(sch.timesteps[i])
            sigma = float(sch.sigmas[i])
            c_in = jnp.float32(1.0 / (sigma**2 + sch.sigma_data**2) ** 0.5)
            cond, uncond, astates = fwd(
                self.params, lat, c_in, t, ctx2, astates, consts, jax.random.fold_in(key, i)
            )
            noise_pred = uncond + guidance_scale * (cond - uncond)
            lat, sstate = sch.step(i, lat, noise_pred, sstate)
            if pattern == "SAP":
                log_sap_states(dlog, t, astates)
        return lat

    def generate(self, prompt: str, negative_prompt: str = "", **kw):
        assert self.text_encoder is not None
        ctx = self.text_encoder([prompt])
        ctx_null = self.text_encoder([negative_prompt])
        lat = self.generate_latents(ctx, ctx_null, **kw)
        if self.vae_decode is not None:
            return self.vae_decode(lat)
        return lat
