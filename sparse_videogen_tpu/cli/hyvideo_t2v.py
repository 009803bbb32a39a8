"""HunyuanVideo T2V CLI (flags mirror /root/reference/hyvideo_t2v_inference.py)."""

from __future__ import annotations

import argparse

from sparse_videogen_tpu.cli._common import (add_model_id, add_vae_tiling_flags,
                                             make_vae_decoder, resolve_model_dir)

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("hyvideo_t2v")
    p.add_argument("--prompt", type=str, default="A cat walks on the grass, realistic")
    p.add_argument("--negative_prompt", type=str, default=None,
                   help="accepted for reference-script parity; HunyuanVideo "
                        "runs embedded (distilled) guidance without a CFG "
                        "uncond pass, so it is unused (hyvideo_t2v_inference.py)")
    p.add_argument("--prompt_source", type=str, default="prompt",
                   help='reference dataloader semantics: with a non-"prompt" '
                        "source, --prompt is the prompt-list .txt and "
                        "--prompt_idx selects the line")
    p.add_argument("--prompt_idx", type=int, default=0)
    p.add_argument("--resolution", type=str, default=None, choices=["480p", "720p"],
                   help="preset for --height/--width (480p=480x720, 720p=720x1280); "
                        "explicit --height/--width win")
    p.add_argument("--model_dir", type=str, default=None)
    add_model_id(p, "tencent/HunyuanVideo")
    add_vae_tiling_flags(p)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--data_path", type=str, default=None,
                   help="reference-parity flag (hyvideo_t2v_inference.py:25, "
                        "VBench I2V data suite; unused by the T2V path there too)")
    p.add_argument("--logging_file", type=str, default=None,
                   help="JSONL density/latency telemetry (reference --logging_file)")
    p.add_argument("--num_frames", type=int, default=129)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--embedded_guidance_scale", type=float, default=6.0)
    p.add_argument("--flow_shift", type=float, default=7.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_file", type=str, default="output_hy.npz")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip generation when the output file exists (batch resume, wan_t2v_inference.py:62-65)")
    p.add_argument("--pattern", type=str, default="SVG", choices=["SVG", "dense", "SAP"])
    p.add_argument("--first_layers_fp", type=float, default=0.025)
    p.add_argument("--first_times_fp", type=float, default=0.15)
    p.add_argument("--num_sampled_rows", type=int, default=64)
    p.add_argument("--sample_mse_max_row", type=int, default=10000)
    p.add_argument("--sparsity", type=float, default=0.25)
    p.add_argument("--num_q_centroids", type=int, default=400)
    p.add_argument("--num_k_centroids", type=int, default=1000)
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
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--use_fp8", action="store_true",
                   help="FP8 (e4m3) weight-only storage for block linears (reference --use-fp8)")
    p.add_argument("--quant", choices=["none", "fp8", "int8"], default=None,
                   help="block-linear quantization: fp8 = e4m3 weight-only storage "
                        "(reference --use-fp8); int8 = W8A8 with int8 MXU matmuls "
                        "(~1.6x bf16 on v5e, the TPU analog of the reference's fp8 compute)")
    # parallelism (reference parallel flag group, hyvideo_orig/config.py:351-369)
    p.add_argument("--ulysses_degree", type=int, default=1,
                   help="head-sharded sequence parallelism (all patterns)")
    p.add_argument("--ring_degree", type=int, default=1,
                   help="ring/context parallelism over tokens (dense pattern)")
    p.add_argument("--dit_fsdp", action="store_true",
                   help="shard DiT weights over all devices (FSDP analog)")
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
    from sparse_videogen_tpu.models.hyvideo import model as HM
    from sparse_videogen_tpu.pipelines.hyvideo import HyVideoPipeline
    from sparse_videogen_tpu.utils.logging import logger
    from sparse_videogen_tpu.utils.seed import seed_everything

    seed_everything(args.seed)
    if args.prompt_source != "prompt":
        from sparse_videogen_tpu.utils.dataloader import load_prompt_or_image

        args.prompt, _ = load_prompt_or_image(
            args.prompt_source, args.prompt_idx, args.prompt, None)
    # --resolution preset; explicit --height/--width win (the reference keeps
    # them as separate flags and uses resolution only for output naming)
    if args.height is None or args.width is None:
        ph, pw = (480, 720) if args.resolution == "480p" else (720, 1280)
        args.height = ph if args.height is None else args.height
        args.width = pw if args.width is None else args.width

    vae_decode = None
    args.model_dir = resolve_model_dir(args, logger)
    if args.smoke or args.model_dir is None:
        logger.warning("smoke generation with random weights")
        # head_dim 64 (2*head_dim % 128 == 0): the kernel's packed-KV DMA needs
        # it on real TPUs (ops/attention.py)
        cfg = HM.HyVideoConfig(hidden_size=256, heads_num=4, mm_double_blocks_depth=2,
                               mm_single_blocks_depth=2, rope_dim_list=(16, 24, 24),
                               text_states_dim=64, text_states_dim_2=32, text_len=16)
        params = HM.init_hyvideo_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(args.seed)
        text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_states_dim)), jnp.float32)
        mask = np.ones((1, cfg.text_len), np.int32)
        mask[0, 10:] = 0
        pooled = jnp.asarray(rng.standard_normal((1, cfg.text_states_dim_2)), jnp.float32)
        args.height, args.width = min(args.height, 96), min(args.width, 128)
        args.num_frames = min(args.num_frames, 9)
        args.num_inference_steps = min(args.num_inference_steps, 3)
        args.num_q_centroids = min(args.num_q_centroids, 8)
        args.num_k_centroids = min(args.num_k_centroids, 12)
        args.kmeans_iter_init = min(args.kmeans_iter_init, 8)
        if not args.output_file.endswith(".npz"):
            # video output requested: decode through a tiny random
            # VAE so the full pixels->container path runs in smoke
            from sparse_videogen_tpu.models.hyvideo import vae as HVV

            vcfg = HVV.HyVideoVAEConfig(block_out_channels=(16, 16, 16, 16),
                                        layers_per_block=1, norm_num_groups=4)
            vparams = HVV.init_hyvideo_vae_params(jax.random.PRNGKey(1), vcfg)
            vae_decode = make_vae_decoder(args, HVV, vparams, vcfg, logger)
    else:
        import os

        from sparse_videogen_tpu.io.checkpoint import (
            convert_hyvideo_dit,
            dataclass_from_json,
            load_safetensors_dir,
        )
        from sparse_videogen_tpu.io.encoders import HyVideoTextEncoders

        tdir = os.path.join(args.model_dir, "transformer")
        cfg = dataclass_from_json(tdir, HM.HyVideoConfig) or HM.HYVIDEO_T2
        params = convert_hyvideo_dit(load_safetensors_dir(tdir), cfg)
        logger.info("encoding prompt with LLaMA template + CLIP-L (text_encoder/__init__.py)")
        enc = HyVideoTextEncoders.from_dir(args.model_dir, text_len=cfg.text_len)
        text, mask, pooled = enc([args.prompt])
        del enc  # free LLaMA weights before the DiT runs

        vae_dir = os.path.join(args.model_dir, "vae")
        if os.path.isdir(vae_dir):
            from sparse_videogen_tpu.io.checkpoint import convert_hyvideo_vae
            from sparse_videogen_tpu.models.hyvideo import vae as HVV

            vcfg = dataclass_from_json(vae_dir, HVV.HyVideoVAEConfig) or HVV.HyVideoVAEConfig()
            vparams = convert_hyvideo_vae(load_safetensors_dir(vae_dir), vcfg)
            vae_decode = make_vae_decoder(args, HVV, vparams, vcfg, logger)
        else:
            logger.warning(f"no {vae_dir}: saving latents instead of video")

    quant = args.quant or ("fp8" if args.use_fp8 else "none")
    if quant != "none":
        from sparse_videogen_tpu.utils.quant import quantize_linears_fp8, quantize_linears_int8

        qfn = quantize_linears_int8 if quant == "int8" else quantize_linears_fp8
        for key in ("double_blocks", "single_blocks"):
            if key in params:
                params[key] = qfn(params[key])
        logger.info(f"{quant}: block linears quantized "
                    f"({'W8A8 int8 matmuls' if quant == 'int8' else 'e4m3 + per-layer scales'})")

    mesh = None
    if args.ulysses_degree * args.ring_degree > 1 or args.dit_fsdp:
        from sparse_videogen_tpu.parallel import make_mesh, shard_params

        n = args.ulysses_degree * args.ring_degree
        dp = 1
        if args.dit_fsdp and n == 1:
            n = dp = len(jax.devices())
        mesh = make_mesh(n, dp=dp, sp=args.ulysses_degree, rp=args.ring_degree)
        params = shard_params(params, mesh)
        logger.info(f"mesh {dict(mesh.shape)} over {n} devices; params FSDP-sharded")

    pipe = HyVideoPipeline(cfg, params)
    mask = jnp.asarray(mask)
    lat = pipe.generate_latents(
        text, mask, pooled,
        mesh=mesh, prompt_length=int(np.asarray(mask)[0].sum()),
        height=args.height, width=args.width,
        num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        embedded_guidance_scale=args.embedded_guidance_scale,
        flow_shift=args.flow_shift, pattern=args.pattern,
        first_layers_fp=args.first_layers_fp, first_times_fp=args.first_times_fp,
        svg=SVGConfig(num_sampled_rows=args.num_sampled_rows,
                      sample_mse_max_row=args.sample_mse_max_row,
                      sparsity=args.sparsity, profile_multiplier=1.5),
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
