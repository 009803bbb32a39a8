"""Shared CLI helpers for reference entry-script parity.

The reference scripts take ``--model_id`` (an HF hub repo id downloaded via
``from_pretrained``, e.g. /root/reference/wan_t2v_inference.py:22,71-75).
This environment has no network, so the TPU CLIs load locally converted
checkpoints via ``--model_dir``. ``--model_id`` is still accepted so the
reference shell scripts run unmodified: a *local directory* passed as
``--model_id`` is used as the model dir; a repo id is recorded but the run
falls back to smoke mode unless ``--model_dir`` is also given.
"""

from __future__ import annotations

import os


def add_model_id(p, default: str):
    # default None (not the reference's repo id): the id is only usable for
    # downloads, which this environment cannot do — a non-None default made
    # every plain smoke run log a misleading "you passed an HF repo id"
    # warning for a flag the user never typed.
    p.add_argument(
        "--model_id", type=str, default=None,
        help="reference-parity flag: HF repo id (informational; no network "
             f"here; reference default {default}) or a local converted "
             "checkpoint dir (used as --model_dir)")
    return p


def resolve_model_dir(args, logger=None):
    """Fold --model_id into --model_dir (local dir wins; repo id is noted)."""
    if getattr(args, "model_dir", None):
        return args.model_dir
    mid = getattr(args, "model_id", None)
    if mid and os.path.isdir(mid):
        if logger is not None:
            logger.info(f"--model_id is a local dir; using it as --model_dir: {mid}")
        return mid
    if mid and logger is not None and not getattr(args, "smoke", False):
        logger.warning(
            f"--model_id {mid!r} is an HF repo id but this environment has no "
            "network: convert the checkpoint locally (io/checkpoint.py) and "
            "pass --model_dir. Falling back to smoke generation.")
    return None


def add_vae_tiling_flags(p):
    """Reference parity: pipe.vae.enable_tiling() (hyvideo_t2v_inference.py:81,
    diffusers tiled_decode). Auto tiles when a latent frame exceeds 64x64
    (≈512p) — whole-frame decode at 720p x 129f needs ~60 GB of activations,
    far beyond one 16 GB v5e chip."""
    p.add_argument("--vae_tiling", type=str, default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--vae_tile", type=int, default=32,
                   help="latent tile edge (pixels = 8x)")
    p.add_argument("--vae_tile_overlap", type=int, default=8,
                   help="latent overlap blended between adjacent tiles")
    p.add_argument("--vae_stream_chunk", type=int, default=0,
                   help="decode in N-latent-frame streamed chunks with a "
                        "per-conv cache — EXACT, bounds temporal memory "
                        "(the reference WanVAE's own streaming decode, "
                        "vae.py:584-610). 0 = whole-sequence. Composes "
                        "with --vae_tiling. Wan VAE only for now.")
    return p


def make_vae_decoder(args, module, params, cfg, logger):
    """Build the pipeline's vae_decode callable honoring --vae_tiling."""
    import jax

    mode = getattr(args, "vae_tiling", "auto")
    tile = getattr(args, "vae_tile", 32)
    overlap = getattr(args, "vae_tile_overlap", 8)
    stream = getattr(args, "vae_stream_chunk", 0)
    if stream and not hasattr(module, "vae_decode_streamed"):
        logger.warning(f"--vae_stream_chunk: {module.__name__} has no streamed "
                       "decode; falling back to whole-sequence")
        stream = 0

    def base(zz):
        if stream:
            return module.vae_decode_streamed(params, cfg, zz, chunk=stream)
        return module.vae_decode(params, cfg, zz)

    # vae_decode_streamed jits its own per-chunk steps (one executable per
    # chunk shape, shared across tiles); wrapping it in an outer jit would
    # unroll the host chunk loop into one huge XLA program — jit only the
    # whole-sequence path.
    run = base if stream else jax.jit(base)

    def decode(z):
        h, w = z.shape[-2], z.shape[-1]
        if mode == "on" or (mode == "auto" and h * w > 64 * 64):
            logger.info(f"VAE decode: spatial tiling (latent {h}x{w}, "
                        f"tile={tile}, overlap={overlap}"
                        + (f", streamed chunk={stream}" if stream else "") + ")")
            from sparse_videogen_tpu.models.common.vae_tiling import spatial_tiled_decode

            return spatial_tiled_decode(run, z, tile=tile, overlap=overlap,
                                        scale=getattr(cfg, "spatial_compression", 8))
        return run(z)

    return decode
