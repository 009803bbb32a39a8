"""SAP density telemetry: JSONL logging + aggregation.

Port of the reference's per-(timestep, layer) density log
(svg/models/wan/attention.py:540-557) and the aggregation CLIs
(svg/utils/density.py:27-47, densities_get_mean.py).
"""

from __future__ import annotations

import json
import os

import numpy as np


class DensityLogger:
    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            open(path, "w").close()

    def log(self, timestep, layer: int, densities):
        if not self.path:
            return
        d = np.asarray(densities, np.float64).ravel()
        entry = {
            "timestep": float(timestep),
            "layer": int(layer),
            "avg_density": float(d.mean()),
            "density": d.tolist(),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")


def log_sap_states(dlog: "DensityLogger", timestep, states) -> None:
    """Log per-layer SAP densities from stacked attention states.

    states.last_density is (n_layers, B*H); dense/warm-up layers leave
    zeros and are skipped (the reference logs sparse steps only).
    """
    if dlog.path is None:
        return
    dens = np.asarray(states.last_density)
    for li in range(dens.shape[0]):
        if dens[li].any():
            dlog.log(timestep, li, dens[li])


def mean_density(path: str) -> float:
    vals = []
    with open(path) as f:
        for line in f:
            vals.append(json.loads(line)["avg_density"])
    return float(np.mean(vals)) if vals else float("nan")


def densities_mean(dir_path: str) -> float:
    """Mean density over every JSONL in a directory (the reference's
    svg/utils/densities_get_mean.py)."""
    import glob
    import os

    vals = [mean_density(p) for p in sorted(glob.glob(os.path.join(dir_path, "*.jsonl")))]
    return float(sum(vals) / len(vals)) if vals else 0.0


if __name__ == "__main__":
    import sys

    print(densities_mean(sys.argv[1]))
