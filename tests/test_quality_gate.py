"""End-to-end quality mechanism: PSNR between dense and sparse generations.

The reference's acceptance criterion is PSNR/SSIM of the sparse video vs the
dense video (svg/utils/metric.py; papers report ~29+ dB for SVG1). Real
checkpoints aren't available in this environment, so this test validates the
*pipeline*: same seed, same (random) weights, dense vs SVG1 vs SAP latents
must be close (warm-up steps identical; sparse steps bounded drift), and the
metric utilities consume the outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_videogen_tpu.config import SAPConfig, SVGConfig
from sparse_videogen_tpu.models.wan.model import WanConfig, init_wan_params
from sparse_videogen_tpu.pipelines import WanPipeline
from sparse_videogen_tpu.utils.metric import psnr, video_metrics

import pytest

# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = WanConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=3,
                freq_dim=32, text_dim=48, text_len=8)


def make_pipe():
    params = init_wan_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    return WanPipeline(CFG, params, dtype=jnp.float32)


def gen(pipe, pattern, **kw):
    rng = np.random.default_rng(7)
    ctx = jnp.asarray(rng.standard_normal((1, CFG.text_len, CFG.text_dim)), jnp.float32)
    return np.asarray(
        pipe.generate_latents(
            ctx, ctx * 0,
            height=96, width=128, num_frames=9, num_inference_steps=4,
            guidance_scale=5.0, pattern=pattern, seed=11,
            first_times_fp=0.25, first_layers_fp=0.0, **kw,
        )
    )


def test_sparse_generations_track_dense():
    pipe = make_pipe()
    dense = gen(pipe, "dense")
    svg = gen(pipe, "SVG", svg=SVGConfig(sparsity=0.3, num_sampled_rows=16))
    sap = gen(pipe, "SAP", sap=SAPConfig(num_q_centroids=4, num_k_centroids=6,
                                         top_p_kmeans=0.85, kmeans_iter_init=6,
                                         kmeans_iter_step=2))
    rng_scale = float(np.abs(dense).max())
    p_svg = psnr(svg, dense, max_val=rng_scale)
    p_sap = psnr(sap, dense, max_val=rng_scale)
    # warm-up step identical + bounded sparse drift: far above noise floor
    noise = np.random.default_rng(0).standard_normal(dense.shape) * np.abs(dense).std()
    p_noise = psnr(dense + noise.astype(np.float32), dense, max_val=rng_scale)
    assert p_svg > p_noise + 10, (p_svg, p_noise)
    assert p_sap > p_noise + 10, (p_sap, p_noise)
    assert np.isfinite(svg).all() and np.isfinite(sap).all()

    # the metric CLI path consumes (T, H, W, C) videos
    vid_a = np.transpose(dense[0], (1, 2, 3, 0))
    vid_b = np.transpose(svg[0], (1, 2, 3, 0))
    frames, mean = video_metrics(vid_a, vid_b, max_val=rng_scale)
    assert len(frames) == vid_a.shape[0] and np.isfinite(mean["ssim"])
