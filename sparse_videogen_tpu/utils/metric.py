"""Video quality metrics: per-frame MSE / PSNR / SSIM / perceptual (+ JSONL).

Port of the reference metric CLI (svg/utils/metric.py:58-221). True LPIPS
needs a pretrained net (lpips package) and is reported when importable; the
always-available perceptual column is `lpips_rf`, the self-contained
LPIPS-structured random-feature distance (utils/perceptual.py).
"""

from __future__ import annotations

import json

import numpy as np


def mse(a, b):
    return float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))


def psnr(a, b, max_val: float = 1.0):
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val**2 / m))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim(a, b, max_val: float = 1.0):
    """Single-channel or RGB (H, W[, C]) SSIM, gaussian window 11x1.5."""
    from scipy.signal import convolve2d  # scipy ships with the base env

    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], max_val) for c in range(a.shape[-1])]))
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    k = _gaussian_kernel()
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    mu_a = convolve2d(a, k, mode="valid")
    mu_b = convolve2d(b, k, mode="valid")
    s_aa = convolve2d(a * a, k, mode="valid") - mu_a**2
    s_bb = convolve2d(b * b, k, mode="valid") - mu_b**2
    s_ab = convolve2d(a * b, k, mode="valid") - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * s_ab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (s_aa + s_bb + c2)
    return float(np.mean(num / den))


def video_metrics(video_a, video_b, *, max_val: float = 1.0):
    """(T, H, W, C) videos -> list of per-frame metric dicts + means."""
    assert video_a.shape == video_b.shape, (video_a.shape, video_b.shape)
    frames = []
    for t in range(video_a.shape[0]):
        frames.append(
            {
                "frame": t,
                "mse": mse(video_a[t], video_b[t]),
                "psnr": psnr(video_a[t], video_b[t], max_val),
                "ssim": ssim(video_a[t], video_b[t], max_val),
            }
        )
    mean = {
        k: float(np.mean([f[k] for f in frames])) for k in ("mse", "psnr", "ssim")
    }
    return frames, mean


def write_jsonl(path: str, frames, mean):
    with open(path, "w") as f:
        for fr in frames:
            f.write(json.dumps(fr) + "\n")
        f.write(json.dumps({"mean": mean}) + "\n")


def metrics_mean(dir_path: str) -> dict:
    """Mean of per-video metric JSONLs in a directory (the reference's
    svg/utils/metrics_get_mean.py over metric.py outputs)."""
    import glob
    import os

    means = []
    for p in sorted(glob.glob(os.path.join(dir_path, "*.jsonl"))):
        with open(p) as f:
            for line in f:
                d = json.loads(line)
                if "mean" in d:
                    means.append(d["mean"])
    if not means:
        return {}
    keys = means[0].keys()
    return {k: float(np.mean([m[k] for m in means])) for k in keys}


def main(argv=None):
    """CLI: compare two videos (.y4m or .npz/.npy), print + optionally write
    JSONL — the svg/utils/metric.py entry surface. With one directory
    argument, aggregate means instead (metrics_get_mean.py surface)."""
    import argparse
    import os

    from sparse_videogen_tpu.io.native import load_video

    p = argparse.ArgumentParser("metric")
    p.add_argument("video_a")
    p.add_argument("video_b", nargs="?", default=None)
    p.add_argument("--output_jsonl", default=None)
    args = p.parse_args(argv)

    if args.video_b is None:
        assert os.path.isdir(args.video_a), "single arg must be a JSONL dir"
        print(json.dumps(metrics_mean(args.video_a)))
        return

    a = load_video(args.video_a)
    b = load_video(args.video_b)
    t = min(a.shape[0], b.shape[0])
    frames, mean = video_metrics(a[:t], b[:t])
    if a.shape[-1] == 3:
        from sparse_videogen_tpu.utils.perceptual import lpips_rf

        mean["lpips_rf"] = lpips_rf(a[:t], b[:t])
        # true LPIPS(alex) when local weights are supplied
        # ($SVT_LPIPS_WEIGHTS or <repo>/weights/lpips_alex.npz): exact
        # AlexNet-LPIPS forward in JAX — absolutely comparable with the
        # reference's lpips-package numbers (utils/lpips_jax.py)
        from sparse_videogen_tpu.utils.lpips_jax import load_lpips_weights, lpips_alex

        try:
            w = load_lpips_weights()
            if w is not None:
                mean["lpips"] = lpips_alex(a[:t], b[:t], w)
        except Exception as e:  # bad $SVT_LPIPS_WEIGHTS must not kill the CLI
            import sys as _sys

            print(f"[metric] lpips weights unusable ({e}); reporting lpips_rf only",
                  file=_sys.stderr)
    if "lpips" not in mean:
        try:  # optional true LPIPS via the reference's own package, if present
            import lpips  # noqa: F401
            import torch

            net = lpips.LPIPS(net="alex")
            ta = torch.tensor(a[:t].transpose(0, 3, 1, 2) * 2 - 1, dtype=torch.float32)
            tb = torch.tensor(b[:t].transpose(0, 3, 1, 2) * 2 - 1, dtype=torch.float32)
            with torch.no_grad():
                mean["lpips"] = float(net(ta, tb).mean())
        except ImportError:
            pass
    print(json.dumps({"mean": mean}))
    if args.output_jsonl:
        write_jsonl(args.output_jsonl, frames, mean)


if __name__ == "__main__":
    main()
