"""Device mesh construction.

Axes:
  dp: data parallel — CFG cond/uncond batching (the reference computes both
      in one batch, wan_t2v_inference.py) and weight sharding (FSDP analog,
      wan_orig/distributed/fsdp.py).
  sp: sequence parallel — Ulysses head-sharding for attention, token-sharding
      elsewhere (analog of xfuser's ulysses_degree,
      wan_orig/distributed/xdit_context_parallel.py:63-169).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, *, dp: int = 1, sp: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if sp is None:
        sp = n_devices // dp
    assert dp * sp == n_devices, (dp, sp, n_devices)
    arr = np.array(devices[:n_devices]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))
