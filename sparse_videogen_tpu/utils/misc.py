"""Debug/observability helpers (ports of svg/utils/misc.py and the
per-model misc.py qkv dumpers)."""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass(frozen=True)
class Color:
    black = "\033[30m"
    red = "\033[31m"
    green = "\033[32m"
    yellow = "\033[33m"
    blue = "\033[34m"
    magenta = "\033[35m"
    cyan = "\033[36m"
    white = "\033[37m"
    reset = "\033[39m"
    orange = "\033[38;2;180;60;0m"


def print_memory_usage(prefix: str = ""):
    """Device HBM usage via jax memory_stats (the TPU analog of
    torch.cuda.memory_allocated)."""
    import jax

    d = jax.devices()[0]
    stats = d.memory_stats() or {}
    used = stats.get("bytes_in_use", 0) // 1024**2
    peak = stats.get("peak_bytes_in_use", used) // 1024**2
    print(f"{Color.orange}{prefix} Memory: {used} / {peak} MB{Color.reset}")


def print_args(args):
    print(f"{Color.magenta}Args:{Color.reset}")
    for key, value in vars(args).items():
        print(f"{Color.magenta}{key}: {value}{Color.reset}")


def save_qkv(q, k, v, save_dir, layer_idx, timestep, x=None):
    """Dump attention inputs for offline analysis (reference
    svg/models/wan/misc.py save_qkv/save_qkvx; .npz instead of .pt)."""
    os.makedirs(save_dir, exist_ok=True)
    tag = "qkvx" if x is not None else "qkv"
    path = os.path.join(save_dir, f"sparse_{tag}_layer{layer_idx}_ts{timestep}.npz")
    data = {"q": np.asarray(q), "k": np.asarray(k), "v": np.asarray(v),
            "timestep": timestep, "layer_idx": layer_idx}
    if x is not None:
        data["x"] = np.asarray(x)
    np.savez(path, **data)
    return path
