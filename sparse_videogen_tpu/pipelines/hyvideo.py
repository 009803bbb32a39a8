"""HunyuanVideo T2V generation pipeline.

Mirrors the reference entry flow (hyvideo_t2v_inference.py + diffusers
HunyuanVideoPipeline): flow-match Euler scheduler (shift 7.0), embedded
guidance (the cfg-distilled checkpoint runs ONE forward per step with
guidance * 1000 instead of classifier-free pairs), prompt_length precomputed
up front for the text-last sparse masks (hyvideo/utils.py:96+).
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
    TextPosition,
    VideoLayout,
    WarmupSchedule,
)
from sparse_videogen_tpu.models.hyvideo import model as HM
from sparse_videogen_tpu.schedulers import FlowMatchEuler
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.logging import logger

VAE_SPATIAL = 8
VAE_TEMPORAL = 4


def hyvideo_layout(cfg: HM.HyVideoConfig, height: int, width: int, num_frames: int) -> VideoLayout:
    """replace_hyvideo_attention geometry (hyvideo/inference.py:57-59)."""
    pt, ph, pw = cfg.patch_size
    nf = (1 + (num_frames - 1) // VAE_TEMPORAL) // pt
    fs = (height // (VAE_SPATIAL * ph)) * (width // (VAE_SPATIAL * pw))
    return VideoLayout(
        num_frames=nf, frame_size=fs,
        context_length=cfg.text_len, text_position=TextPosition.LAST,
    )


@dataclasses.dataclass
class HyVideoPipeline:
    model_cfg: HM.HyVideoConfig
    params: dict
    text_encoder: Optional[Callable] = None  # prompts -> (states, mask, pooled)
    vae_decode: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16

    def generate_latents(
        self,
        text_states,  # (1, text_len, 4096)
        text_mask,  # (1, text_len)
        text_pooled,  # (1, 768)
        *,
        prompt_length: int,  # real prompt tokens (get_prompt_length analog)
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        num_inference_steps: int = 50,
        embedded_guidance_scale: float = 6.0,
        flow_shift: float = 7.0,
        pattern: str = "SVG",
        first_layers_fp: float = 0.025,
        first_times_fp: float = 0.15,
        svg: SVGConfig = SVGConfig(sparsity=0.25, profile_multiplier=1.5),
        sap: SAPConfig = SAPConfig(),
        seed: int = 0,
        image_latents=None,  # I2V: (1, 16, 1, h, w) VAE-encoded first frame
        mesh=None,  # dp x rp x sp device mesh (parallel/mesh.py)
        logging_file=None,  # SAP density JSONL (reference --logging_file)
    ):
        cfg = self.model_cfg
        layout = hyvideo_layout(cfg, height, width, num_frames)
        # prompt_length feeds the text-last masks (SVG1 aux) and the SAP
        # prompt/padding extra clusters (svg2._extend_text_clusters)
        layout = dataclasses.replace(layout, prompt_length=prompt_length)
        sch = FlowMatchEuler(num_inference_steps, shift=flow_shift)
        n_layers = cfg.mm_double_blocks_depth + cfg.mm_single_blocks_depth
        warmup = WarmupSchedule.from_fractions(
            first_layers_fp, first_times_fp, n_layers, sch.timesteps
        )
        plan = make_svg1_plan(layout, svg, warmup)
        mode = SparseMode(pattern)
        rp = mesh.shape.get("rp", 1) if mesh is not None else 1
        sp = mesh.shape.get("sp", 1) if mesh is not None else 1
        if rp > 1:
            # text-LAST layout: ring supports dense only (the static masks
            # compose via global-coordinate aux predicates); SVG needs
            # global placement and SAP's ring variant is video-only —
            # shard heads (--ulysses_degree) for those.
            from sparse_videogen_tpu.parallel.ring_runtime import RingDenseRuntime

            if mode != SparseMode.DENSE:
                raise ValueError(
                    "hyvideo ring_degree>1 supports pattern=dense; use "
                    "--ulysses_degree for SVG/SAP (head-local algorithms)"
                )
            runtime = RingDenseRuntime(
                plan, mesh, head_axis="sp" if sp > 1 else None,
                prompt_length=prompt_length,
            )
        else:
            if mode == SparseMode.DENSE:
                runtime = DenseRuntime(plan, prompt_length=prompt_length)
            elif mode == SparseMode.SVG:
                runtime = SVG1Runtime(plan, prompt_length=prompt_length)
            else:
                runtime = SAPRuntime(plan, sap, warmup)
            if sp > 1:
                from sparse_videogen_tpu.parallel import UlyssesRuntime

                runtime = UlyssesRuntime(runtime, mesh)

        F_lat = 1 + (num_frames - 1) // VAE_TEMPORAL
        H_lat, W_lat = height // VAE_SPATIAL, width // VAE_SPATIAL
        key = jax.random.PRNGKey(seed)
        key, nkey = jax.random.split(key)
        lat = jax.random.normal(nkey, (1, cfg.out_channels, F_lat, H_lat, W_lat), jnp.float32)
        cond = None
        if image_latents is not None:
            # HunyuanVideo-I2V "latent_concat" conditioning (community
            # checkpoint, in_channels 33 = 16 noise + 16 image + 1 mask;
            # hyvideo_i2v_inference.py loads it via the diffusers I2V
            # pipeline): image at latent frame 0, zeros after; mask marks
            # the conditioned frame.
            assert cfg.in_channels == 2 * cfg.out_channels + 1, (
                "I2V conditioning needs a latent_concat checkpoint (in_channels 33)"
            )
            img_full = jnp.zeros((1, cfg.out_channels, F_lat, H_lat, W_lat), jnp.float32)
            img_full = img_full.at[:, :, :1].set(image_latents.astype(jnp.float32))
            m = jnp.zeros((1, 1, F_lat, H_lat, W_lat), jnp.float32)
            m = m.at[:, :, :1].set(1.0)
            cond = jnp.concatenate([img_full, m], axis=1)
        logger.info(
            f"hyvideo generate: seq={layout.seq_len} (video {layout.video_length} + text {cfg.text_len}), "
            f"steps={num_inference_steps}, pattern={pattern}, prompt_len={prompt_length}"
        )

        consts = runtime.consts()
        astates = runtime.init_state(cfg.heads_num, cfg.head_dim, n_layers)
        guidance = jnp.full((1,), embedded_guidance_scale * 1000.0, jnp.float32)

        @jax.jit
        def fwd(params, lat, t, states, consts, key, cond=None):
            x = lat if cond is None else jnp.concatenate([lat, cond], axis=1)
            v, states = HM.hyvideo_forward(
                params, cfg, x.astype(self.dtype), jnp.full((1,), t, jnp.float32),
                text_states.astype(self.dtype), text_mask, text_pooled.astype(self.dtype),
                guidance=guidance, attention=runtime, attn_states=states,
                attn_consts=consts, rng=key,
            )
            return v, states

        from sparse_videogen_tpu.utils.density import DensityLogger, log_sap_states

        dlog = DensityLogger(logging_file if pattern == "SAP" else None)
        sstate = sch.init_state()
        for i in range(num_inference_steps):
            t = float(sch.timesteps[i])
            v, astates = fwd(self.params, lat, t, astates, consts,
                             jax.random.fold_in(key, i), cond)
            lat, sstate = sch.step(i, lat, v, sstate)
            if pattern == "SAP":
                log_sap_states(dlog, t, astates)
        return lat

    def generate(self, prompt: str, **kw):
        """prompt -> latents (or video if vae_decode attached).

        text_encoder must return (states (1, text_len, 4096), mask
        (1, text_len), pooled (1, 768)) — io/encoders.HyVideoTextEncoders.
        """
        assert self.text_encoder is not None, "attach io/encoders.HyVideoTextEncoders"
        states, mask, pooled = self.text_encoder([prompt])
        prompt_length = int(jnp.sum(mask[0]))
        lat = self.generate_latents(
            states, mask, pooled, prompt_length=prompt_length, **kw
        )
        if self.vae_decode is not None:
            return self.vae_decode(lat)
        return lat
