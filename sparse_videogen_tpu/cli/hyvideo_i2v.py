"""HunyuanVideo I2V CLI (flags mirror /root/reference/hyvideo_i2v_inference.py).

Conditions via the community checkpoint's latent_concat scheme (in_channels
33 = 16 noise + 16 first-frame VAE latents + 1 mask) with FlowMatch Euler at
shift 7.0. Prompt encoding uses the LLaMA-template text path; the upstream
pipeline additionally interleaves CLIP image tokens into the LLaMA prompt
(Llava) — not implemented, the image conditions through the latents.
"""

from __future__ import annotations

import argparse
import os

from sparse_videogen_tpu.cli._common import (add_model_id, add_vae_tiling_flags,
                                             make_vae_decoder, resolve_model_dir)

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("hyvideo_i2v")
    p.add_argument("--prompt", type=str, default="A cat walks on the grass, realistic")
    p.add_argument("--negative_prompt", type=str, default=None,
                   help="accepted for reference-script parity; unused with "
                        "embedded guidance")
    p.add_argument("--resolution", type=str, default=None, choices=["480p", "720p"],
                   help="accepted for reference-script parity (output naming); "
                        "--height/--width control the actual size")
    p.add_argument("--logging_file", type=str, default=None,
                   help="JSONL density telemetry for SAP patterns (reference flag)")
    p.add_argument("--image_path", type=str, default=None,
                   help="conditioning image; .npy = precomputed VAE latents (1,16,1,h,w)")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--prompt_source", type=str, default="prompt",
                   choices=["prompt", "I2V_VBench", "I2V_Wan_Web"])
    p.add_argument("--prompt_idx", type=int, default=0)
    p.add_argument("--model_dir", type=str, default=None)
    add_model_id(p, "hunyuanvideo-community/HunyuanVideo-I2V")
    add_vae_tiling_flags(p)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--num_frames", type=int, default=129)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--embedded_guidance_scale", type=float, default=1.0)
    p.add_argument("--flow_shift", type=float, default=7.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_file", type=str, default="output_hy_i2v.npz")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip generation when the output file exists (batch resume, wan_t2v_inference.py:62-65)")
    # reference choices are {dense, sparse}; "sparse" = the SVG pattern
    p.add_argument("--pattern", type=str, default="dense", choices=["dense", "sparse"])
    p.add_argument("--first_layers_fp", type=float, default=0.025)
    p.add_argument("--first_times_fp", type=float, default=0.15)
    p.add_argument("--num_sampled_rows", type=int, default=64)
    p.add_argument("--sparsity", type=float, default=0.25)
    p.add_argument("--smoke", action="store_true")
    from sparse_videogen_tpu.cli._parallel import add_parallel_flags

    add_parallel_flags(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.skip_existing:
        import os as _os

        _out = args.output_file
        for _p in (_out, _out[: -len(".npz")] + ".y4m" if _out.endswith(".npz") else _out):
            if _os.path.exists(_p):
                print(f"output {_p} exists; skipping generation")
                return
    import jax
    import jax.numpy as jnp

    from sparse_videogen_tpu.config import SVGConfig
    from sparse_videogen_tpu.models.hyvideo import model as HM
    from sparse_videogen_tpu.pipelines.hyvideo import HyVideoPipeline
    from sparse_videogen_tpu.utils.logging import logger
    from sparse_videogen_tpu.utils.seed import seed_everything

    seed_everything(args.seed)
    if args.prompt_source != "prompt":
        from sparse_videogen_tpu.utils.dataloader import load_prompt_or_image

        args.prompt, args.image_path = load_prompt_or_image(
            args.prompt_source, args.prompt_idx, args.prompt, args.image_path
        )
    pattern = "SVG" if args.pattern == "sparse" else "dense"
    vae_decode = None

    args.model_dir = resolve_model_dir(args, logger)
    if args.smoke or args.model_dir is None:
        logger.warning("smoke generation with random weights")
        cfg = HM.HyVideoConfig(in_channels=33, hidden_size=256, heads_num=4,
                               mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                               rope_dim_list=(16, 24, 24), text_states_dim=64,
                               text_states_dim_2=32, text_len=16)
        params = HM.init_hyvideo_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(args.seed)
        text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_states_dim)), jnp.float32)
        mask = np.ones((1, cfg.text_len), np.int32)
        mask[0, 10:] = 0
        pooled = jnp.asarray(rng.standard_normal((1, cfg.text_states_dim_2)), jnp.float32)
        args.height, args.width = min(args.height, 96), min(args.width, 128)
        args.num_frames = min(args.num_frames, 9)
        args.num_inference_steps = min(args.num_inference_steps, 3)
        img_lat = jnp.asarray(
            rng.standard_normal((1, 16, 1, args.height // 8, args.width // 8)) * 0.1,
            jnp.float32,
        )
        if not args.output_file.endswith(".npz"):
            # video output requested: decode through a tiny random
            # VAE so the full pixels->container path runs in smoke
            from sparse_videogen_tpu.models.hyvideo import vae as HVV

            vcfg = HVV.HyVideoVAEConfig(block_out_channels=(16, 16, 16, 16),
                                        layers_per_block=1, norm_num_groups=4)
            vparams = HVV.init_hyvideo_vae_params(jax.random.PRNGKey(1), vcfg)
            vae_decode = make_vae_decoder(args, HVV, vparams, vcfg, logger)
    else:
        from sparse_videogen_tpu.io.checkpoint import (
            convert_hyvideo_dit,
            convert_hyvideo_vae,
            dataclass_from_json,
            load_safetensors_dir,
        )
        from sparse_videogen_tpu.io.encoders import HyVideoTextEncoders
        from sparse_videogen_tpu.models.hyvideo import vae as HVV

        tdir = os.path.join(args.model_dir, "transformer")
        cfg = dataclass_from_json(tdir, HM.HyVideoConfig)
        assert cfg is not None and cfg.in_channels == 33, (
            "expected a HunyuanVideo-I2V latent_concat transformer (in_channels 33)"
        )
        params = convert_hyvideo_dit(load_safetensors_dir(tdir), cfg)

        assert args.image_path, "--image_path required for I2V"
        img_px = None
        if not args.image_path.endswith(".npy"):
            from sparse_videogen_tpu.cli.wan_i2v import _load_image

            img_px = jax.image.resize(
                jnp.asarray(_load_image(args.image_path)),
                (1, 3, args.height, args.width), method="cubic",
            )

        # Llava checkpoints (the community I2V text encoder) carry a vision
        # tower — use the image-spliced prompt path; otherwise text-only.
        edir = os.path.join(args.model_dir, "text_encoder")
        cjf = os.path.join(edir, "config.json")
        is_llava = os.path.isfile(cjf) and '"vision_config"' in open(cjf).read()
        if is_llava and img_px is not None:
            from sparse_videogen_tpu.io.encoders import LlavaImageTextEncoder

            enc = LlavaImageTextEncoder.from_dir(args.model_dir, text_len=cfg.text_len)
            text, mask, pooled = enc([args.prompt], img_px)
        else:
            enc = HyVideoTextEncoders.from_dir(args.model_dir, text_len=cfg.text_len)
            text, mask, pooled = enc([args.prompt])
        del enc

        vae_dir = os.path.join(args.model_dir, "vae")
        vcfg = dataclass_from_json(vae_dir, HVV.HyVideoVAEConfig) or HVV.HyVideoVAEConfig()
        vparams = convert_hyvideo_vae(load_safetensors_dir(vae_dir), vcfg)
        vae_decode = make_vae_decoder(args, HVV, vparams, vcfg, logger)

        if args.image_path.endswith(".npy"):
            img_lat = jnp.asarray(np.load(args.image_path), jnp.float32)
        else:
            img_lat = HVV.vae_encode(vparams, vcfg, img_px[:, :, None])

    from sparse_videogen_tpu.cli._parallel import mesh_and_shard

    mesh, params = mesh_and_shard(args, params, logger)
    pipe = HyVideoPipeline(cfg, params)
    mask = jnp.asarray(mask)
    lat = pipe.generate_latents(
        text, mask, pooled,
        mesh=mesh, prompt_length=int(np.asarray(mask)[0].sum()),
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        embedded_guidance_scale=args.embedded_guidance_scale,
        flow_shift=args.flow_shift, pattern=pattern,
        first_layers_fp=args.first_layers_fp, first_times_fp=args.first_times_fp,
        svg=SVGConfig(num_sampled_rows=args.num_sampled_rows,
                      sparsity=args.sparsity, profile_multiplier=1.5),
        seed=args.seed,
        image_latents=img_lat,
    )
    if vae_decode is not None:
        from sparse_videogen_tpu.pipelines.wan import export_video

        video = vae_decode(lat)
        out = args.output_file
        if out.endswith(".npz"):
            out = out[: -len(".npz")] + ".y4m"
        export_video(video, out, fps=24)
        logger.info(f"saved video {video.shape} -> {out}")
    else:
        np.savez(args.output_file, latents=np.asarray(lat))
        logger.info(f"saved latents {lat.shape} -> {args.output_file}")


if __name__ == "__main__":
    main()
