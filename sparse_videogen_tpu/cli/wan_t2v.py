"""Wan 2.1 T2V generation CLI.

Flag names/defaults mirror the reference entry script
(/root/reference/wan_t2v_inference.py) so its shell scripts (scripts/wan/*)
port 1:1. Differences: --model_dir points at local converted/safetensors
checkpoints (this environment has no network); without it the CLI runs a
smoke generation with random weights at a reduced size.

Usage:
  python -m sparse_videogen_tpu.cli.wan_t2v --prompt "..." --pattern SVG \
      --num_inference_steps 50 --height 480 --width 832 --num_frames 81 \
      --first_layers_fp 0.025 --first_times_fp 0.075 --sparsity 0.25
"""

from __future__ import annotations

import argparse
import os

from sparse_videogen_tpu.cli._common import (add_model_id, add_vae_tiling_flags,
                                             make_vae_decoder, resolve_model_dir)

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("wan_t2v")
    p.add_argument("--prompt", type=str, default="A cat walks on the grass, realistic")
    p.add_argument("--neg_prompt", "--negative_prompt", dest="neg_prompt",
                   type=str, default="")
    p.add_argument("--prompt_source", type=str, default="prompt",
                   help='prompt | path semantics of the reference dataloader '
                        '(T2V_*_VBench etc.): with a non-"prompt" source, '
                        '--prompt is the .txt/dir and --prompt_idx selects the line')
    p.add_argument("--prompt_idx", type=int, default=0)
    p.add_argument("--model_dir", type=str, default=None, help="dir with transformer safetensors (+ optional vae/umt5)")
    add_model_id(p, "Wan-AI/Wan2.1-T2V-14B-Diffusers")
    add_vae_tiling_flags(p)
    p.add_argument("--model_size", type=str, default="1.3B", choices=["1.3B", "14B"])
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--flow_shift", type=float, default=None, help="default 5.0 for 720p, 3.0 otherwise")
    p.add_argument("--sampler", type=str, default="unipc", choices=["unipc", "dpm++"],
                   help="flow solver (wan_orig ships both: fm_solvers_unipc / fm_solvers)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_file", type=str, default="output.npz")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip generation when the output file exists (batch resume, wan_t2v_inference.py:62-65)")
    p.add_argument("--converted_cache", type=str, default=None,
                   help="dir to cache converted param pytrees (convert once, reload fast)")
    # sparsity pattern (reference flags)
    p.add_argument("--pattern", type=str, default="SVG", choices=["SVG", "dense", "SAP"])
    p.add_argument("--first_layers_fp", type=float, default=0.025)
    p.add_argument("--first_times_fp", type=float, default=0.075)
    # SVG
    p.add_argument("--num_sampled_rows", type=int, default=64)
    p.add_argument("--sample_mse_max_row", type=int, default=10000)
    p.add_argument("--sparsity", type=float, default=0.25)
    # SAP
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
    p.add_argument("--zero_step_kmeans_init", action="store_true")
    p.add_argument("--logging_file", type=str, default=None,
                   help="JSONL density telemetry for SAP (reference --logging_file)")
    # parallelism (reference parallel flag group, hyvideo_orig/config.py:
    # 351-369 --ulysses-degree/--ring-degree; wan_orig dit_fsdp)
    p.add_argument("--dp", type=int, default=1, help="data-parallel degree (CFG pair / batch)")
    p.add_argument("--ulysses_degree", type=int, default=1,
                   help="head-sharded sequence parallelism (all patterns)")
    p.add_argument("--ring_degree", type=int, default=1,
                   help="ring/context parallelism over tokens (dense and SAP)")
    p.add_argument("--dit_fsdp", action="store_true",
                   help="shard DiT weights over all mesh devices even when no "
                        "other degree is set (uses every available device)")
    # smoke mode
    p.add_argument("--smoke", action="store_true", help="tiny random-weight run (no checkpoints needed)")
    p.add_argument("--use_fp8", action="store_true",
                   help="FP8 (e4m3) weight-only storage for block linears (reference --use-fp8)")
    p.add_argument("--quant", choices=["none", "fp8", "int8"], default=None,
                   help="block-linear quantization: fp8 = e4m3 weight-only storage "
                        "(reference --use-fp8); int8 = W8A8 with int8 MXU matmuls "
                        "(~1.6x bf16 on v5e, the TPU analog of the reference's fp8 compute)")
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
    from sparse_videogen_tpu.models.wan import model as WM
    from sparse_videogen_tpu.pipelines import WanPipeline
    from sparse_videogen_tpu.utils.logging import logger
    from sparse_videogen_tpu.utils.seed import seed_everything

    seed_everything(args.seed)
    if args.prompt_source != "prompt":
        # reference semantics (wan_t2v_inference.py:102): --prompt is the
        # prompt-list .txt and --prompt_idx selects the line
        from sparse_videogen_tpu.utils.dataloader import load_prompt_or_image

        args.prompt, _ = load_prompt_or_image(
            args.prompt_source, args.prompt_idx, args.prompt, None)
    if args.flow_shift is None:
        args.flow_shift = 5.0 if args.height >= 720 else 3.0
    if not args.neg_prompt:
        # reference default (wan_t2v_inference.py:108-110)
        args.neg_prompt = (
            "Bright tones, overexposed, static, blurred details, subtitles, "
            "style, works, paintings, images, static, overall gray, worst "
            "quality, low quality, JPEG compression residue, ugly, incomplete, "
            "extra fingers, poorly drawn hands, poorly drawn faces, deformed, "
            "disfigured, misshapen limbs, fused fingers, still picture, messy "
            "background, three legs, many people in the background, walking "
            "backwards"
        )

    vae_decode = None
    args.model_dir = resolve_model_dir(args, logger)
    if args.smoke or args.model_dir is None:
        logger.warning("no --model_dir: running smoke generation with random weights")
        # head_dim 64: the kernel's packed-KV DMA needs 2*head_dim % 128 == 0
        # on real TPUs (ops/attention.py)
        cfg = WM.WanConfig(dim=256, ffn_dim=512, num_heads=4, num_layers=4,
                           freq_dim=64, text_dim=64, text_len=16)
        params = WM.init_wan_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(args.seed)
        ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
        ctx_null = jnp.zeros_like(ctx)
        args.height, args.width = min(args.height, 96), min(args.width, 128)
        args.num_frames = min(args.num_frames, 9)
        args.num_inference_steps = min(args.num_inference_steps, 4)
        args.num_q_centroids = min(args.num_q_centroids, 8)
        args.num_k_centroids = min(args.num_k_centroids, 12)
        args.kmeans_iter_init = min(args.kmeans_iter_init, 8)
        if not args.output_file.endswith(".npz"):
            # video output requested: decode through a tiny random-weight VAE
            # so the full prompt->pixels->container path runs in smoke mode
            from sparse_videogen_tpu.models.wan import vae as WV

            vae_cfg = WV.WanVAEConfig(dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)
            vae_params = WV.init_wan_vae_params(jax.random.PRNGKey(1), vae_cfg)
            vae_decode = make_vae_decoder(args, WV, vae_params, vae_cfg, logger)
    else:
        from sparse_videogen_tpu.io.checkpoint import (
            convert_wan_dit,
            load_safetensors_dir,
            wan_config_from_json,
        )
        from sparse_videogen_tpu.io.encoders import UMT5Encoder

        tdir = os.path.join(args.model_dir, "transformer")
        cfg = wan_config_from_json(tdir) or (
            WM.WAN_1_3B if args.model_size == "1.3B" else WM.WAN_14B
        )
        cache = os.path.join(args.converted_cache, "wan_dit") if args.converted_cache else None
        if cache and os.path.isfile(os.path.join(cache, "params.safetensors")):
            from sparse_videogen_tpu.io.checkpoint import load_pytree

            logger.info(f"loading converted params from cache {cache}")
            params = load_pytree(cache)
        else:
            sd = load_safetensors_dir(tdir)
            params = convert_wan_dit(sd, cfg)
            if cache:
                from sparse_videogen_tpu.io.checkpoint import save_pytree

                save_pytree(cache, params)
                logger.info(f"cached converted params -> {cache}")
        logger.info("encoding prompts with UMT5 (reference flow: t5.py:500-506)")
        t5 = UMT5Encoder.from_dir(args.model_dir, text_len=cfg.text_len)
        ctx = t5([args.prompt]).astype(jnp.bfloat16)
        ctx_null = t5([args.neg_prompt]).astype(jnp.bfloat16)
        del t5  # free ~11 GB of UMT5 weights before the DiT runs

        vae_dir = os.path.join(args.model_dir, "vae")
        if os.path.isdir(vae_dir):
            from sparse_videogen_tpu.io.checkpoint import convert_wan_vae, dataclass_from_json
            from sparse_videogen_tpu.models.wan import vae as WV

            vae_cfg = dataclass_from_json(vae_dir, WV.WanVAEConfig) or WV.WanVAEConfig()
            vae_params = convert_wan_vae(load_safetensors_dir(vae_dir), vae_cfg)
            vae_decode = make_vae_decoder(args, WV, vae_params, vae_cfg, logger)
        else:
            logger.warning(f"no {vae_dir}: saving latents instead of video")

    quant = args.quant or ("fp8" if args.use_fp8 else "none")
    if quant != "none":
        from sparse_videogen_tpu.utils.quant import quantize_linears_fp8, quantize_linears_int8

        qfn = quantize_linears_int8 if quant == "int8" else quantize_linears_fp8
        params["blocks"] = qfn(params["blocks"])
        logger.info(f"{quant}: block linears quantized "
                    f"({'W8A8 int8 matmuls' if quant == 'int8' else 'e4m3 + per-layer scales'})")

    mesh = None
    if args.dp * args.ulysses_degree * args.ring_degree > 1 or args.dit_fsdp:
        from sparse_videogen_tpu.parallel import make_mesh, shard_params

        n = args.dp * args.ulysses_degree * args.ring_degree
        dp = args.dp
        if args.dit_fsdp and n == 1:
            # pure weight sharding: all devices on dp (activations replicated,
            # XLA all-gathers weights at use — torch FSDP FULL_SHARD analog)
            n = dp = len(jax.devices())
        mesh = make_mesh(n, dp=dp, sp=args.ulysses_degree, rp=args.ring_degree)
        params = shard_params(params, mesh)
        logger.info(f"mesh {dict(mesh.shape)} over {n} devices; params FSDP-sharded")

    pipe = WanPipeline(cfg, params)
    lat = pipe.generate_latents(
        ctx, ctx_null,
        mesh=mesh,
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, flow_shift=args.flow_shift,
        sampler=args.sampler,
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
                      zero_step_kmeans_init=args.zero_step_kmeans_init,
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

        video = vae_decode(lat)
        out = args.output_file
        if out.endswith(".npz"):
            out = out[: -len(".npz")] + ".y4m"
        export_video(video, out, fps=16)
        logger.info(f"saved video {video.shape} -> {out}")
    else:
        np.savez(args.output_file, latents=np.asarray(lat))
        logger.info(f"saved latents {lat.shape} -> {args.output_file}")


if __name__ == "__main__":
    main()
