"""Wan 2.1 I2V generation CLI.

Flag names/defaults mirror the reference entry script
(/root/reference/wan_i2v_inference.py): CLIP ViT-H image conditioning
(penultimate hidden states -> DiT img_emb), first-frame VAE latents + mask
concatenated on channels (in_dim 36), UniPC flow scheduler. Without
--model_dir runs a smoke generation with random weights at a reduced size.
"""

from __future__ import annotations

import argparse
import os

from sparse_videogen_tpu.cli._common import (add_model_id, add_vae_tiling_flags,
                                             make_vae_decoder, resolve_model_dir)

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("wan_i2v")
    p.add_argument("--prompt", type=str, default="A cat walks on the grass, realistic")
    p.add_argument("--neg_prompt", "--negative_prompt", dest="neg_prompt",
                   type=str, default="")
    p.add_argument("--data_path", type=str, default=None,
                   help="VBench I2V data suite dir (reference --data_path)")
    p.add_argument("--attention_backend", type=str, default="flexattn",
                   choices=["flashinfer", "flexattn"],
                   help="reference-parity flag (wan_i2v_inference.py:44); both "
                        "map to the one universal Pallas kernel here")
    p.add_argument("--logging_file", type=str, default=None,
                   help="JSONL density telemetry for SAP (reference --logging_file)")
    p.add_argument("--image_path", type=str, default=None,
                   help="conditioning image (png/jpg); .npy = (3, H, W) array in [-1, 1]")
    p.add_argument("--prompt_source", type=str, default="prompt",
                   choices=["prompt", "I2V_VBench", "I2V_Wan_Web"])
    p.add_argument("--prompt_idx", type=int, default=0)
    p.add_argument("--model_dir", type=str, default=None,
                   help="dir with transformer/ image_encoder/ vae/ text_encoder/ (diffusers layout)")
    add_model_id(p, "Wan-AI/Wan2.1-I2V-14B-720P-Diffusers")
    add_vae_tiling_flags(p)
    p.add_argument("--resolution", type=str, default="720p", choices=["480p", "720p"])
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_file", type=str, default="output_i2v.npz")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip generation when the output file exists (batch resume, wan_t2v_inference.py:62-65)")
    p.add_argument("--pattern", type=str, default="dense", choices=["SVG", "dense", "SAP"])
    # reference i2v defaults (wan_i2v_inference.py:44-45)
    p.add_argument("--first_layers_fp", type=float, default=0.3)
    p.add_argument("--first_times_fp", type=float, default=0.03)
    p.add_argument("--num_sampled_rows", type=int, default=64)
    p.add_argument("--sample_mse_max_row", type=int, default=10000)
    p.add_argument("--sparsity", type=float, default=0.25)
    p.add_argument("--num_q_centroids", type=int, default=50)
    p.add_argument("--num_k_centroids", type=int, default=200)
    p.add_argument("--top_p_kmeans", type=float, default=0.9)
    p.add_argument("--min_kc_ratio", type=float, default=0.0)
    p.add_argument("--kmeans_iter_init", type=int, default=0)
    p.add_argument("--kmeans_iter_step", type=int, default=0)
    p.add_argument("--sap_block_mode", type=str, default="cluster",
                   choices=["cluster", "tile"],
                   help="SAP selection granularity: 'cluster' = the "
                        "reference's variable-size cluster blocks; "
                        "'tile' = fixed block_kv tiles of the k-means "
                        "order (TPU-optimal under organic density)")
    p.add_argument("--zero_step_kmeans_init", action="store_true")
    p.add_argument("--smoke", action="store_true")
    from sparse_videogen_tpu.cli._parallel import add_parallel_flags

    add_parallel_flags(p, dp=True)
    return p


def _load_image(path):
    """-> (1, 3, H, W) float32 in [-1, 1]."""
    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32)
    else:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 127.5 - 1.0
    return arr[None]


def _fit_resolution(h, w, resolution, mod=16):
    """Aspect-preserving area fit (wan_i2v_inference.py:117-121)."""
    max_area = 720 * 1280 if resolution == "720p" else 480 * 832
    ar = h / w
    H = int(round(np.sqrt(max_area * ar))) // mod * mod
    W = int(round(np.sqrt(max_area / ar))) // mod * mod
    return H, W


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
    from sparse_videogen_tpu.pipelines.wan import VAE_TEMPORAL, build_i2v_condition
    from sparse_videogen_tpu.utils.logging import logger
    from sparse_videogen_tpu.utils.seed import seed_everything

    seed_everything(args.seed)
    if args.prompt_source != "prompt":
        from sparse_videogen_tpu.utils.dataloader import load_prompt_or_image

        args.prompt, args.image_path = load_prompt_or_image(
            args.prompt_source, args.prompt_idx, args.prompt, args.image_path
        )
    flow_shift = 5.0 if args.resolution == "720p" else 3.0
    vae_decode = None

    args.model_dir = resolve_model_dir(args, logger)
    if args.smoke or args.model_dir is None:
        logger.warning("no --model_dir: running smoke generation with random weights")
        cfg = WM.WanConfig(model_type="i2v", in_dim=36, dim=256, ffn_dim=512,
                           num_heads=4, num_layers=4, freq_dim=64, text_dim=64,
                           text_len=16, image_dim=48)
        params = WM.init_wan_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(args.seed)
        ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
        ctx_null = jnp.zeros_like(ctx)
        H, W = 96, 128
        args.num_frames = min(args.num_frames, 9)
        args.num_inference_steps = min(args.num_inference_steps, 4)
        args.num_q_centroids = min(args.num_q_centroids, 8)
        args.num_k_centroids = min(args.num_k_centroids, 12)
        args.kmeans_iter_init = min(args.kmeans_iter_init, 8)
        clip_fea = jnp.asarray(rng.standard_normal((1, 257, cfg.image_dim)), jnp.bfloat16)
        f_lat = 1 + (args.num_frames - 1) // VAE_TEMPORAL
        img_lat = jnp.asarray(
            rng.standard_normal((1, 16, f_lat, H // 8, W // 8)) * 0.1, jnp.float32
        )
    else:
        from sparse_videogen_tpu.io.checkpoint import (
            convert_wan_dit,
            convert_wan_vae,
            dataclass_from_json,
            load_safetensors_dir,
            wan_config_from_json,
        )
        from sparse_videogen_tpu.io.encoders import CLIPImageEncoder, UMT5Encoder
        from sparse_videogen_tpu.models.wan import vae as WV

        assert args.image_path, "--image_path required for I2V"
        img = _load_image(args.image_path)
        H, W = _fit_resolution(img.shape[2], img.shape[3], args.resolution)

        tdir = os.path.join(args.model_dir, "transformer")
        cfg = wan_config_from_json(tdir)
        assert cfg is not None and cfg.model_type == "i2v", "expected an I2V transformer"
        params = convert_wan_dit(load_safetensors_dir(tdir), cfg)

        t5 = UMT5Encoder.from_dir(args.model_dir, text_len=cfg.text_len)
        ctx = t5([args.prompt]).astype(jnp.bfloat16)
        ctx_null = t5([args.neg_prompt]).astype(jnp.bfloat16)
        del t5

        clip = CLIPImageEncoder.from_dir(args.model_dir)
        clip_fea = clip(img).astype(jnp.bfloat16)
        del clip

        vae_dir = os.path.join(args.model_dir, "vae")
        vae_cfg = dataclass_from_json(vae_dir, WV.WanVAEConfig) or WV.WanVAEConfig()
        vae_params = convert_wan_vae(load_safetensors_dir(vae_dir), vae_cfg)
        # [image, zeros] pixel video -> normalized latents (prepare_latents)
        import jax.image as jimg

        img_r = jax.image.resize(jnp.asarray(img), (1, 3, H, W), method="cubic")
        vid = jnp.concatenate(
            [img_r[:, :, None], jnp.zeros((1, 3, args.num_frames - 1, H, W))], axis=2
        )
        img_lat = WV.vae_encode(vae_params, vae_cfg, vid)
        vae_decode = make_vae_decoder(args, WV, vae_params, vae_cfg, logger)

    latent_cond = build_i2v_condition(img_lat)

    from sparse_videogen_tpu.cli._parallel import mesh_and_shard

    mesh, params = mesh_and_shard(args, params, logger)
    pipe = WanPipeline(cfg, params)
    lat = pipe.generate_latents(
        ctx, ctx_null,
        mesh=mesh,
        height=H, width=W, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, flow_shift=flow_shift,
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
        clip_fea=clip_fea,
        latent_cond=latent_cond,
    )
    if vae_decode is not None:
        from sparse_videogen_tpu.pipelines.wan import export_video

        video = vae_decode(lat)
        out = args.output_file
        if not out.endswith(".y4m"):
            out = os.path.splitext(out)[0] + ".y4m"
        export_video(np.asarray(video), out, fps=16)
        logger.info(f"saved video -> {out}")
    else:
        np.savez(args.output_file, latents=np.asarray(lat))
        logger.info(f"saved latents {lat.shape} -> {args.output_file}")


if __name__ == "__main__":
    main()
