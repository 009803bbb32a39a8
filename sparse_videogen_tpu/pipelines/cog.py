"""CogVideoX 1.5 I2V generation pipeline.

Mirrors the reference entry flow (/root/reference/cog_inference.py +
diffusers CogVideoXImageToVideoPipeline): T5 text conditioning (226 tokens,
text FIRST in the joint sequence), image latents concatenated channel-wise
(16 noise + 16 image), CogVideoX DDIM v-prediction sampler, CFG pair, and
the v1.5 patch_size_t frame padding (pad latent frames to a multiple of 2 at
the front, discard after denoising).

The reference supports SVG1 and dense for this model (cog_inference.py:15);
same here. v1.0 adds use_dynamic_cfg (sample_image, inference.py:19-20).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sparse_videogen_tpu.config import (
    SparseMode,
    SVGConfig,
    TextPosition,
    VideoLayout,
    WarmupSchedule,
)
from sparse_videogen_tpu.models.cog import model as CM
from sparse_videogen_tpu.schedulers.ddim_cog import CogDDIM, dynamic_cfg_scale
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.logging import logger

VAE_SPATIAL = 8
VAE_TEMPORAL = 4


def cog_layout(model_cfg: CM.CogConfig, height: int, width: int, num_frames: int) -> VideoLayout:
    """Token layout from pixel dims (replace_cog_attention: v1.5 is
    num_frame=11, frame_size=4080 at 768x1360x81f)."""
    p, pt = model_cfg.patch_size, model_cfg.patch_size_t
    f_lat = 1 + (num_frames - 1) // VAE_TEMPORAL
    f_lat += (-f_lat) % pt
    fs = (height // (VAE_SPATIAL * p)) * (width // (VAE_SPATIAL * p))
    return VideoLayout(
        num_frames=f_lat // pt,
        frame_size=fs,
        context_length=model_cfg.text_len,
        text_position=TextPosition.FIRST,
    )


@dataclasses.dataclass
class CogPipeline:
    model_cfg: CM.CogConfig
    params: dict
    text_encoder: Optional[Callable] = None  # (prompts) -> (B, 226, 4096)
    vae_encode: Optional[Callable] = None  # (1, 3, 1, H, W) image -> (1, 16, 1, h, w)
    vae_decode: Optional[Callable] = None  # latents -> pixel video
    dtype: jnp.dtype = jnp.bfloat16

    def generate_latents(
        self,
        context,  # (1, 226, 4096)
        context_null,
        image_latents,  # (1, 16, 1, h, w) VAE-encoded first frame
        *,
        height: int = 768,
        width: int = 1360,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        pattern: str = "SVG",
        first_layers_fp: float = 0.025,
        first_times_fp: float = 0.2,
        svg: SVGConfig = SVGConfig(num_sampled_rows=32, sparsity=0.25),
        seed: int = 0,
        callback=None,
        mesh=None,  # dp x rp x sp device mesh (parallel/mesh.py)
    ):
        """Returns final latents (1, 16, F_lat, h, w) — front padding removed."""
        cfgm = self.model_cfg
        assert cfgm.in_channels == 2 * cfgm.out_channels, "I2V config (channel-concat)"
        layout = cog_layout(cfgm, height, width, num_frames)
        sch = CogDDIM(num_inference_steps)
        warmup = WarmupSchedule.from_fractions(
            first_layers_fp, first_times_fp, cfgm.num_layers, sch.timesteps
        )
        plan = make_svg1_plan(layout, svg, warmup)
        mode = SparseMode(pattern)
        runtime = (DenseRuntime if mode == SparseMode.DENSE else SVG1Runtime)(
            plan, prompt_length=cfgm.text_len
        )
        if mesh is not None:
            from sparse_videogen_tpu.parallel import parallelize_runtime

            runtime = parallelize_runtime(runtime, mesh, plan, pattern=pattern,
                                          prompt_length=cfgm.text_len)

        f_lat = 1 + (num_frames - 1) // VAE_TEMPORAL
        extra = (-f_lat) % cfgm.patch_size_t  # discarded after denoising
        f_pad = f_lat + extra
        h_lat, w_lat = height // VAE_SPATIAL, width // VAE_SPATIAL
        C = cfgm.out_channels

        key = jax.random.PRNGKey(seed)
        key, nkey = jax.random.split(key)
        lat = jax.random.normal(nkey, (1, C, f_pad, h_lat, w_lat), jnp.float32)
        # image at latent frame 0, zeros after (prepare_latents)
        img_full = jnp.zeros((1, C, f_pad, h_lat, w_lat), jnp.float32)
        img_full = img_full.at[:, :, :1].set(image_latents.astype(jnp.float32))
        logger.info(
            f"cog generate: layout seq={layout.seq_len} "
            f"({layout.num_frames}x{layout.frame_size}+{cfgm.text_len} text), "
            f"steps={num_inference_steps}, pattern={pattern}, warmup={warmup}"
        )

        B = 2
        consts = runtime.consts()
        astates = runtime.init_state(B * cfgm.heads_num, cfgm.head_dim, cfgm.num_layers)
        ctx_pair = jnp.concatenate([context, context_null], axis=0)

        @jax.jit
        def fwd(params, lat, img_full, t, ctx2, states, consts, key):
            x = jnp.concatenate([lat, lat], axis=0)
            img2 = jnp.concatenate([img_full, img_full], axis=0)
            x = jnp.concatenate([x, img2], axis=1).astype(self.dtype)
            v, states = CM.cog_forward(
                params, cfgm, x, jnp.full((B,), t, jnp.float32), ctx2,
                attention=runtime, attn_states=states, attn_consts=consts, rng=key,
            )
            # cog_forward returns (B, F, C, H, W); back to channel-first
            v = v.transpose(0, 2, 1, 3, 4)
            return v[:1], v[1:2], states

        sstate = sch.init_state(lat)
        for i in range(num_inference_steps):
            t = float(sch.timesteps[i])
            kstep = jax.random.fold_in(key, i)
            v_cond, v_uncond, astates = fwd(
                self.params, lat, img_full, t, ctx_pair, astates, consts, kstep
            )
            g = (
                dynamic_cfg_scale(guidance_scale, t, num_inference_steps)
                if use_dynamic_cfg
                else guidance_scale
            )
            v = v_uncond + g * (v_cond - v_uncond)
            lat, sstate = sch.step(i, lat, v, sstate)
            if callback is not None:
                callback(i, lat)
        return lat[:, :, extra:]

    def generate(self, prompt: str, image, negative_prompt: str = "", **kw):
        assert self.text_encoder is not None, "attach a T5 text encoder (io/encoders)"
        ctx = self.text_encoder([prompt])
        ctx_null = self.text_encoder([negative_prompt])
        assert self.vae_encode is not None, "attach a VAE encoder for I2V"
        image_latents = self.vae_encode(image)
        lat = self.generate_latents(ctx, ctx_null, image_latents, **kw)
        if self.vae_decode is not None:
            return self.vae_decode(lat)
        return lat
