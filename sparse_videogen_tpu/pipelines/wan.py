"""Wan 2.1 T2V/I2V generation pipeline.

Mirrors the reference entry flow (wan_t2v_inference.py + diffusers
WanPipeline.__call__): UniPC flow scheduler, CFG guidance, the sparse
attention pattern as first-class config (the reference monkey-patches
processors; here it is a runtime object).

Text encoding (UMT5) and VAE decode are pluggable callables so the denoising
core is independently testable; io/ provides checkpoint loading.
"""

from __future__ import annotations

import dataclasses
import math
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
from sparse_videogen_tpu.models.wan import model as WM
from sparse_videogen_tpu.schedulers import FlowUniPC
from sparse_videogen_tpu.sparse.runtimes import DenseRuntime, SAPRuntime, SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan
from sparse_videogen_tpu.utils.logging import logger

VAE_SPATIAL = 8
VAE_TEMPORAL = 4


def wan_layout(model_cfg: WM.WanConfig, height: int, width: int, num_frames: int) -> VideoLayout:
    """Token layout from pixel dims (replace_wan_attention, inference.py:41-44)."""
    pt, ph, pw = model_cfg.patch_size
    nf = 1 + (num_frames - 1) // VAE_TEMPORAL
    nf = nf // pt
    mod = VAE_SPATIAL * ph
    fs = (height // mod) * (width // (VAE_SPATIAL * pw))
    return VideoLayout(num_frames=nf, frame_size=fs)


def make_wan_runtime(
    layout: VideoLayout,
    *,
    pattern: str = "SVG",
    warmup: WarmupSchedule = WarmupSchedule(),
    svg: SVGConfig = SVGConfig(),
    sap: SAPConfig = SAPConfig(),
    block_q: int = 512,
    block_kv: int = 1024,
    mesh=None,
):
    plan = make_svg1_plan(layout, svg, warmup, block_q=block_q, block_kv=block_kv)
    mode = SparseMode(pattern)
    rp = mesh.shape.get("rp", 1) if mesh is not None else 1
    sp = mesh.shape.get("sp", 1) if mesh is not None else 1
    if rp > 1:
        # ring / context parallel (--ring_degree): token axis sharded.
        # dense and SAP compose (parallel/ring.py, ring_sap.py); SVG1's
        # per-head profiling + placement permute the GLOBAL token axis —
        # shard heads instead (the reference likewise only runs dense under
        # sequence parallelism, xdit_context_parallel.py).
        from sparse_videogen_tpu.parallel.ring_runtime import (
            RingDenseRuntime,
            RingSAPRuntime,
        )

        head_axis = "sp" if sp > 1 else None
        if mode == SparseMode.DENSE:
            return RingDenseRuntime(plan, mesh, head_axis=head_axis)
        if mode == SparseMode.SAP:
            return RingSAPRuntime(plan, sap, warmup, mesh, head_axis=head_axis)
        raise ValueError(
            "pattern=SVG does not compose with ring_degree>1 (global per-head "
            "placement); use --ulysses_degree for SVG multi-chip"
        )
    if mode == SparseMode.DENSE:
        rt = DenseRuntime(plan)
    elif mode == SparseMode.SVG:
        rt = SVG1Runtime(plan)
    else:
        rt = SAPRuntime(plan, sap, warmup)
    if sp > 1:
        from sparse_videogen_tpu.parallel import UlyssesRuntime

        rt = UlyssesRuntime(rt, mesh)
    return rt


@dataclasses.dataclass
class WanPipeline:
    model_cfg: WM.WanConfig
    params: dict
    text_encoder: Optional[Callable] = None  # (prompts) -> (B, text_len, text_dim)
    vae_decode: Optional[Callable] = None  # latents -> pixel video
    dtype: jnp.dtype = jnp.bfloat16

    def generate_latents(
        self,
        context,  # (1, text_len, text_dim) conditional text embedding
        context_null,  # (1, text_len, text_dim) negative/unconditional
        *,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        flow_shift: float = 3.0,
        sampler: str = "unipc",  # "unipc" (live diffusers path) | "dpm++"
        pattern: str = "SVG",
        first_layers_fp: float = 0.0,
        first_times_fp: float = 0.0,
        svg: SVGConfig = SVGConfig(),
        sap: SAPConfig = SAPConfig(),
        seed: int = 0,
        clip_fea=None,
        latent_cond=None,  # I2V: conditioning latents concatenated on channels
        mesh=None,
        cfg_batch: Optional[bool] = None,
        callback=None,
        logging_file: Optional[str] = None,
    ):
        """Run the denoise loop, return final latents (1, C, F', H', W')."""
        cfgm = self.model_cfg
        layout = wan_layout(cfgm, height, width, num_frames)
        if sampler == "dpm++":
            # wan_orig's alternative solver (fm_solvers.py)
            from sparse_videogen_tpu.schedulers import FlowDPM

            sch = FlowDPM(num_inference_steps, shift=flow_shift)
        else:
            sch = FlowUniPC(num_inference_steps, shift=flow_shift)
        warmup = WarmupSchedule.from_fractions(
            first_layers_fp, first_times_fp, cfgm.num_layers, sch.timesteps
        )
        runtime = make_wan_runtime(
            layout, pattern=pattern, warmup=warmup, svg=svg, sap=sap, mesh=mesh
        )
        if cfg_batch is None:
            # SAP requires cfg=1 per stream (wan/attention.py:502): run
            # cond/uncond as separate forwards; SVG/dense batch them.
            cfg_batch = pattern != "SAP"

        F_lat = (1 + (num_frames - 1) // VAE_TEMPORAL)
        H_lat, W_lat = height // VAE_SPATIAL, width // VAE_SPATIAL
        key = jax.random.PRNGKey(seed)
        key, nkey = jax.random.split(key)
        # noise latents carry out_dim channels; I2V's extra in_dim-out_dim
        # channels come from latent_cond (mask + image latents)
        lat = jax.random.normal(nkey, (1, cfgm.out_dim, F_lat, H_lat, W_lat), jnp.float32)
        logger.info(
            f"wan generate: layout seq={layout.seq_len} ({layout.num_frames}x{layout.frame_size}), "
            f"steps={num_inference_steps}, pattern={pattern}, warmup={warmup}"
        )

        B = 2 if cfg_batch else 1
        consts = runtime.consts()
        astates = runtime.init_state(B * cfgm.num_heads, cfgm.head_dim, cfgm.num_layers)
        if not cfg_batch:
            astates = (astates, runtime.init_state(cfgm.num_heads, cfgm.head_dim, cfgm.num_layers))

        ctx_pair = jnp.concatenate([context, context_null], axis=0)

        @jax.jit
        def fwd_batched(params, lat, t, ctx2, states, consts, key, clip_fea=None, lat_cond=None):
            x = jnp.concatenate([lat, lat], axis=0).astype(self.dtype)
            if lat_cond is not None:
                x = jnp.concatenate([x, jnp.concatenate([lat_cond, lat_cond], 0).astype(self.dtype)], axis=1)
            v, states = WM.wan_forward(
                params, cfgm, x, jnp.full((2,), t, jnp.float32), ctx2,
                clip_fea=None if clip_fea is None else jnp.concatenate([clip_fea, clip_fea], 0),
                attention=runtime, attn_states=states, attn_consts=consts, rng=key,
            )
            return v[:1], v[1:2], states

        @jax.jit
        def fwd_single(params, lat, t, ctx, states, consts, key, clip_fea=None, lat_cond=None):
            x = lat.astype(self.dtype)
            if lat_cond is not None:
                x = jnp.concatenate([x, lat_cond.astype(self.dtype)], axis=1)
            v, states = WM.wan_forward(
                params, cfgm, x, jnp.full((1,), t, jnp.float32), ctx,
                clip_fea=clip_fea,
                attention=runtime, attn_states=states, attn_consts=consts, rng=key,
            )
            return v, states

        # SAP density telemetry (reference wan/attention.py:540-557 logs a
        # JSONL row per (timestep, layer)); states return to host every step
        # anyway, so this costs one small transfer per logged step
        from sparse_videogen_tpu.utils.density import DensityLogger, log_sap_states

        dlog = DensityLogger(logging_file if pattern == "SAP" else None)
        sstate = sch.init_state(lat)
        for i in range(num_inference_steps):
            t = float(sch.timesteps[i])
            kstep = jax.random.fold_in(key, i)
            if cfg_batch:
                v_cond, v_uncond, astates = fwd_batched(
                    self.params, lat, t, ctx_pair, astates, consts, kstep,
                    clip_fea, latent_cond,
                )
            else:
                st_c, st_u = astates
                v_cond, st_c = fwd_single(
                    self.params, lat, t, context, st_c, consts, kstep, clip_fea, latent_cond
                )
                v_uncond, st_u = fwd_single(
                    self.params, lat, t, context_null, st_u, consts, kstep, clip_fea, latent_cond
                )
                astates = (st_c, st_u)
            v = v_uncond + guidance_scale * (v_cond - v_uncond)
            lat, sstate = sch.step(i, lat, v, sstate)
            if pattern == "SAP":
                log_sap_states(dlog, t, astates[0] if not cfg_batch else astates)
            if callback is not None:
                callback(i, lat)
        return lat

    def generate(self, prompt: str, negative_prompt: str = "", **kw):
        assert self.text_encoder is not None, "attach a text encoder (io/encoders)"
        ctx = self.text_encoder([prompt])
        ctx_null = self.text_encoder([negative_prompt])
        lat = self.generate_latents(ctx, ctx_null, **kw)
        if self.vae_decode is not None:
            return self.vae_decode(lat)
        return lat


def export_video(video, path: str, fps: int = 16):
    """video: (B, 3, T, H, W) in [-1, 1] -> .mp4 (MJPEG, io/mp4.py) or .y4m
    (lossless, native writer) by extension (reference: diffusers
    export_to_video writes .mp4, wan_t2v_inference.py:166)."""
    import numpy as np

    v = np.asarray(video)[0]
    v = np.clip((v + 1.0) * 127.5, 0, 255).astype(np.uint8)
    v = np.transpose(v, (1, 2, 3, 0))  # (T, H, W, 3)
    if path.endswith(".mp4"):
        from sparse_videogen_tpu.io.mp4 import write_mp4

        write_mp4(path, v, fps=fps)
    else:
        from sparse_videogen_tpu.io.native import write_y4m

        write_y4m(path, v, fps=fps)


def build_i2v_condition(latent_condition, *, vae_temporal: int = VAE_TEMPORAL):
    """I2V conditioning tensor (diffusers WanImageToVideoPipeline
    .prepare_latents): 4-channel first-frame mask + 16-channel VAE latents
    of the [image, zeros...] video -> (B, 20, F_lat, h, w), concatenated to
    the noise latents on channels (model in_dim 36 = 16 + 20).

    latent_condition: (B, 16, F_lat, h, w), already latent-normalized
    (models/wan/vae.py vae_encode output).
    """
    B, C, F_lat, h, w = latent_condition.shape
    # pixel-frame mask: frame 0 = 1 (repeated vae_temporal times), rest 0;
    # grouped (F_lat, vae_temporal) -> transposed to (vae_temporal, F_lat)
    n_pix = vae_temporal + ((F_lat - 1) * vae_temporal + 1) - 1  # = 4*F_lat
    flat = jnp.zeros((B, n_pix, h, w), latent_condition.dtype)
    flat = flat.at[:, :vae_temporal].set(1.0)
    mask = flat.reshape(B, F_lat, vae_temporal, h, w).transpose(0, 2, 1, 3, 4)
    return jnp.concatenate([mask, latent_condition], axis=1)
