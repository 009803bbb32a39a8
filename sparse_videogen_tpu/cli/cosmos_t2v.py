"""Cosmos Text2World CLI (flags mirror /root/reference/cosmos_t2v_inference.py)."""

from __future__ import annotations

import argparse
import os

from sparse_videogen_tpu.cli._common import (add_model_id, add_vae_tiling_flags,
                                             make_vae_decoder, resolve_model_dir)

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("cosmos_t2v")
    p.add_argument("--prompt", type=str, default="A cat walks on the grass, realistic")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--prompt_source", type=str, default="prompt",
                   help='reference dataloader semantics: with a non-"prompt" '
                        "source, --prompt is the prompt-list .txt and "
                        "--prompt_idx selects the line")
    p.add_argument("--prompt_idx", type=int, default=0)
    p.add_argument("--logging_file", type=str, default=None,
                   help="JSONL density telemetry for SAP (reference --logging_file)")
    p.add_argument("--model_dir", type=str, default=None)
    add_model_id(p, "nvidia/Cosmos-1.0-Diffusion-14B-Text2World")
    add_vae_tiling_flags(p)
    p.add_argument("--model_size", type=str, default="7B", choices=["7B", "14B"])
    p.add_argument("--height", type=int, default=704)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--num_frames", type=int, default=121)
    p.add_argument("--num_inference_steps", type=int, default=35)
    p.add_argument("--guidance_scale", type=float, default=7.0)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_file", type=str, default="output_cosmos.npz")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip generation when the output file exists (batch resume, wan_t2v_inference.py:62-65)")
    p.add_argument("--pattern", type=str, default="dense", choices=["SVG", "dense", "SAP"])
    p.add_argument("--first_layers_fp", type=float, default=0.025)
    p.add_argument("--first_times_fp", type=float, default=0.075)
    p.add_argument("--num_sampled_rows", type=int, default=64)
    p.add_argument("--sample_mse_max_row", type=int, default=10000)
    p.add_argument("--sparsity", type=float, default=0.25)
    p.add_argument("--num_q_centroids", type=int, default=50)
    p.add_argument("--num_k_centroids", type=int, default=200)
    p.add_argument("--top_p_kmeans", type=float, default=0.9)
    p.add_argument("--min_kc_ratio", type=float, default=0.0)
    p.add_argument("--kmeans_iter_init", type=int, default=50)
    p.add_argument("--kmeans_iter_step", type=int, default=2)
    p.add_argument("--sap_block_mode", type=str, default="cluster",
                   choices=["cluster", "tile"],
                   help="SAP selection granularity: 'cluster' = the "
                        "reference's variable-size cluster blocks; "
                        "'tile' = fixed block_kv tiles of the k-means "
                        "order (TPU-optimal under organic density)")
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

    from sparse_videogen_tpu.config import SAPConfig, SVGConfig
    from sparse_videogen_tpu.models.cosmos import model as CM
    from sparse_videogen_tpu.pipelines.cosmos import CosmosPipeline
    from sparse_videogen_tpu.utils.logging import logger
    from sparse_videogen_tpu.utils.seed import seed_everything

    seed_everything(args.seed)
    if args.prompt_source != "prompt":
        from sparse_videogen_tpu.utils.dataloader import load_prompt_or_image

        args.prompt, _ = load_prompt_or_image(
            args.prompt_source, args.prompt_idx, args.prompt, None)

    vae_decode = None
    args.model_dir = resolve_model_dir(args, logger)
    if args.smoke or args.model_dir is None:
        logger.warning("no --model_dir: smoke generation with random weights")
        cfg = CM.CosmosConfig(num_attention_heads=2, attention_head_dim=64, num_layers=2,
                              text_embed_dim=64, adaln_lora_dim=16, max_size=(8, 16, 16))
        params = CM.init_cosmos_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(args.seed)
        ctx = jnp.asarray(rng.standard_normal((1, 24, cfg.text_embed_dim)), jnp.bfloat16)
        ctx_null = jnp.zeros_like(ctx)
        args.height, args.width = min(args.height, 128), min(args.width, 128)
        args.num_frames = min(args.num_frames, 17)
        args.num_inference_steps = min(args.num_inference_steps, 3)
        args.num_q_centroids = min(args.num_q_centroids, 8)
        args.num_k_centroids = min(args.num_k_centroids, 12)
        args.kmeans_iter_init = min(args.kmeans_iter_init, 8)
        if not args.output_file.endswith(".npz"):
            # video output requested: decode through a tiny random
            # VAE so the full pixels->container path runs in smoke
            from sparse_videogen_tpu.models.cosmos import vae as CVAE

            vcfg = CVAE.CosmosVAEConfig(base_channels=16, channels_mult=(1, 2),
                                        num_res_blocks=1,
                                        latent_channels=cfg.out_channels)
            vparams = CVAE.init_cosmos_vae_params(jax.random.PRNGKey(1), vcfg)
            vae_decode = make_vae_decoder(args, CVAE, vparams, vcfg, logger)
    else:
        from sparse_videogen_tpu.io.checkpoint import (
            convert_cosmos_dit,
            convert_t5_hf,
            dataclass_from_json,
            load_safetensors_dir,
        )
        from sparse_videogen_tpu.io.tokenizer import T5TokenizerLite
        from sparse_videogen_tpu.models.common.t5 import T5_11B, T5Config, t5_encode

        tdir = os.path.join(args.model_dir, "transformer")
        cfg = dataclass_from_json(tdir, CM.CosmosConfig) or (
            CM.COSMOS_7B if args.model_size == "7B" else CM.COSMOS_14B
        )
        params = convert_cosmos_dit(load_safetensors_dir(tdir), cfg)

        edir = os.path.join(args.model_dir, "text_encoder")
        t5_cfg = dataclass_from_json(edir, T5Config) or T5_11B
        t5_params = convert_t5_hf(load_safetensors_dir(edir), t5_cfg)
        tok = T5TokenizerLite.from_dir(args.model_dir)
        enc = jax.jit(lambda p, i, m: t5_encode(p, t5_cfg, i, m))

        def encode(texts, max_len=512):
            ids, mask = tok(texts, seq_len=max_len)
            out = enc(t5_params, jnp.asarray(ids), jnp.asarray(mask))
            return out * jnp.asarray(mask, out.dtype)[..., None]

        ctx = encode([args.prompt]).astype(jnp.bfloat16)
        ctx_null = encode([args.negative_prompt]).astype(jnp.bfloat16)
        del t5_params

        vae_dir = os.path.join(args.model_dir, "vae")
        if os.path.isdir(vae_dir):
            from sparse_videogen_tpu.io.checkpoint import convert_cosmos_vae
            from sparse_videogen_tpu.models.cosmos import vae as CVAE

            vcfg = dataclass_from_json(vae_dir, CVAE.CosmosVAEConfig) or CVAE.COSMOS_VAE_CV8x8x8
            vparams = convert_cosmos_vae(load_safetensors_dir(vae_dir), vcfg)
            vae_decode = make_vae_decoder(args, CVAE, vparams, vcfg, logger)
        else:
            vae_decode = None
            logger.warning(f"no {vae_dir}: saving latents instead of video")

    from sparse_videogen_tpu.cli._parallel import mesh_and_shard

    mesh, params = mesh_and_shard(args, params, logger)
    pipe = CosmosPipeline(cfg, params)
    lat = pipe.generate_latents(
        ctx, ctx_null,
        mesh=mesh,
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, fps=args.fps,
        pattern=args.pattern,
        first_layers_fp=args.first_layers_fp, first_times_fp=args.first_times_fp,
        svg=SVGConfig(num_sampled_rows=args.num_sampled_rows,
                      sample_mse_max_row=args.sample_mse_max_row,
                      sparsity=args.sparsity),
        sap=SAPConfig(num_q_centroids=args.num_q_centroids,
                      num_k_centroids=args.num_k_centroids,
                      top_p_kmeans=args.top_p_kmeans,
                      min_kc_ratio=args.min_kc_ratio,
                      kmeans_iter_init=args.kmeans_iter_init,
                      kmeans_iter_step=args.kmeans_iter_step,
                      block_mode=args.sap_block_mode,
                      # tile mode executes at hardware-tile granularity;
                      # bq=bkv=512 is the measured TPU optimum (cluster
                      # mode keeps the SAPConfig defaults tuned for
                      # variable-size runs — bench_wan14b.py --sap_bq)
                      **({"block_q": 512, "block_kv": 512}
                         if args.sap_block_mode == "tile" else {})),
        seed=args.seed,
        logging_file=args.logging_file,
    )
    if vae_decode is not None:
        from sparse_videogen_tpu.pipelines.wan import export_video

        video = np.asarray(vae_decode(lat))
        out = args.output_file
        if out.endswith(".npz"):
            out = out[: -len(".npz")] + ".y4m"
        export_video(video, out, fps=args.fps)  # reference fps=30 (cosmos_t2v_inference.py:161)
        logger.info(f"saved video {video.shape} -> {out}")
    else:
        np.savez(args.output_file, latents=np.asarray(lat))
        logger.info(f"saved latents {lat.shape} -> {args.output_file}")


if __name__ == "__main__":
    main()
