"""CogVideoX 1.5 I2V CLI (flags mirror /root/reference/cog_inference.py)."""

from __future__ import annotations

import argparse
import os

from sparse_videogen_tpu.cli._common import (add_model_id, add_vae_tiling_flags,
                                             make_vae_decoder, resolve_model_dir)

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("cog_i2v")
    p.add_argument("--version", type=str, default="v1.5", choices=["v1", "v1.5"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image_path", type=str, default=None,
                   help="conditioning image; .npy = precomputed VAE latents (1,16,1,h,w)")
    p.add_argument("--prompt", type=str, default="A cat walks on the grass, realistic")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--pattern", type=str, default="SVG", choices=["SVG", "dense"])
    p.add_argument("--num_step", type=int, default=50)
    p.add_argument("--first_layers_fp", type=float, default=0.025)
    p.add_argument("--first_times_fp", type=float, default=0.2)
    p.add_argument("--num_sampled_rows", type=int, default=32)
    p.add_argument("--sparsity", type=float, default=0.25)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1360)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--model_dir", type=str, default=None)
    add_model_id(p, "THUDM/CogVideoX1.5-5B-I2V")
    add_vae_tiling_flags(p)
    p.add_argument("--output_path", type=str, default="output_cog.npz")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip generation when the output file exists (batch resume, wan_t2v_inference.py:62-65)")
    p.add_argument("--smoke", action="store_true")
    from sparse_videogen_tpu.cli._parallel import add_parallel_flags

    add_parallel_flags(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.skip_existing:
        import os as _os

        _out = args.output_path
        for _p in (_out, _out[: -len(".npz")] + ".y4m" if _out.endswith(".npz") else _out):
            if _os.path.exists(_p):
                print(f"output {_p} exists; skipping generation")
                return
    import jax
    import jax.numpy as jnp

    from sparse_videogen_tpu.config import SVGConfig
    from sparse_videogen_tpu.models.cog import model as CM
    from sparse_videogen_tpu.pipelines.cog import CogPipeline
    from sparse_videogen_tpu.utils.logging import logger
    from sparse_videogen_tpu.utils.seed import seed_everything

    seed_everything(args.seed)
    use_dynamic_cfg = args.version == "v1"
    vae_decode = None

    args.model_dir = resolve_model_dir(args, logger)
    if args.smoke or args.model_dir is None:
        logger.warning("no --model_dir: smoke generation with random weights")
        cfg = CM.CogConfig(num_layers=2, hidden_size=128, heads_num=2, head_dim=64,
                           text_len=16, text_dim=32, in_channels=32,
                           ofs_embed=args.version == "v1.5")
        params = CM.init_cog_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(args.seed)
        ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
        ctx_null = jnp.zeros_like(ctx)
        args.height, args.width = min(args.height, 96), min(args.width, 128)
        args.num_frames = min(args.num_frames, 17)
        args.num_step = min(args.num_step, 3)
        img_lat = jnp.asarray(
            rng.standard_normal((1, cfg.out_channels, 1, args.height // 8, args.width // 8)),
            jnp.float32,
        )
        if not args.output_path.endswith(".npz"):
            # video output requested: decode through a tiny random
            # VAE so the full pixels->container path runs in smoke
            from sparse_videogen_tpu.models.cog import vae as CVAE

            vae_cfg = CVAE.CogVAEConfig(block_out_channels=(16, 16, 16, 16),
                                        layers_per_block=1, norm_num_groups=4)
            vae_params = CVAE.init_cog_vae_params(jax.random.PRNGKey(1), vae_cfg)
            vae_decode = make_vae_decoder(args, CVAE, vae_params, vae_cfg, logger)
    else:
        from sparse_videogen_tpu.io.checkpoint import (
            cog_config_from_json,
            convert_cog_dit,
            convert_t5_hf,
            dataclass_from_json,
            load_safetensors_dir,
        )
        from sparse_videogen_tpu.io.tokenizer import T5TokenizerLite
        from sparse_videogen_tpu.models.common.t5 import T5Config, t5_encode

        tdir = os.path.join(args.model_dir, "transformer")
        cfg = cog_config_from_json(tdir) or CM.COG_1_5_5B_I2V
        params = convert_cog_dit(load_safetensors_dir(tdir), cfg)

        edir = os.path.join(args.model_dir, "text_encoder")
        t5_cfg = dataclass_from_json(edir, T5Config)
        t5_params = convert_t5_hf(load_safetensors_dir(edir), t5_cfg)
        tok = T5TokenizerLite.from_dir(args.model_dir)
        enc = jax.jit(lambda p, i, m: t5_encode(p, t5_cfg, i, m))

        def encode(texts):
            ids, mask = tok(texts, seq_len=cfg.text_len)
            return enc(t5_params, jnp.asarray(ids), jnp.asarray(mask))

        ctx = encode([args.prompt]).astype(jnp.bfloat16)
        ctx_null = encode([args.negative_prompt]).astype(jnp.bfloat16)
        del t5_params

        vae_dir = os.path.join(args.model_dir, "vae")
        if os.path.isdir(vae_dir):
            from sparse_videogen_tpu.io.checkpoint import cog_vae_config_from_json, convert_cog_vae
            from sparse_videogen_tpu.models.cog import vae as CVAE

            vae_cfg = cog_vae_config_from_json(vae_dir) or CVAE.CogVAEConfig()
            vae_params = convert_cog_vae(load_safetensors_dir(vae_dir), vae_cfg)
            vae_decode = make_vae_decoder(args, CVAE, vae_params, vae_cfg, logger)

        assert args.image_path is not None, "--image_path required for I2V"
        if args.image_path.endswith(".npy"):
            img_lat = jnp.asarray(np.load(args.image_path), jnp.float32)
        else:
            assert vae_decode is not None, (
                "pixel-image conditioning needs the CogVideoX VAE under "
                f"{vae_dir}; otherwise pass precomputed latents as .npy "
                "(1, 16, 1, H/8, W/8)"
            )
            from sparse_videogen_tpu.cli.wan_i2v import _load_image

            img = jnp.asarray(_load_image(args.image_path))  # (1, 3, H, W) in [-1, 1]
            img = jax.image.resize(img, (1, 3, args.height, args.width), "bilinear")
            raw = CVAE.vae_encode(vae_params, vae_cfg, img[:, :, None])
            img_lat = CVAE.scale_latents(vae_cfg, raw)

    from sparse_videogen_tpu.cli._parallel import mesh_and_shard

    mesh, params = mesh_and_shard(args, params, logger)
    pipe = CogPipeline(cfg, params)
    lat = pipe.generate_latents(
        ctx, ctx_null, img_lat,
        mesh=mesh,
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_step,
        guidance_scale=args.guidance_scale, use_dynamic_cfg=use_dynamic_cfg,
        pattern=args.pattern,
        first_layers_fp=args.first_layers_fp, first_times_fp=args.first_times_fp,
        svg=SVGConfig(num_sampled_rows=args.num_sampled_rows, sparsity=args.sparsity),
        seed=args.seed,
    )
    if vae_decode is not None:
        from sparse_videogen_tpu.pipelines.wan import export_video

        video = vae_decode(lat)
        out = args.output_path
        if out.endswith(".npz"):
            out = out[: -len(".npz")] + ".y4m"
        export_video(video, out, fps=8)  # sample_image fps (cog/inference.py:23)
        logger.info(f"saved video {video.shape} -> {out}")
    else:
        np.savez(args.output_path, latents=np.asarray(lat))
        logger.info(f"saved latents {lat.shape} -> {args.output_path}")


if __name__ == "__main__":
    main()
