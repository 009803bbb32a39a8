"""Device mesh construction.

Axes (analog of the reference's parallel flag group,
hyvideo_orig/config.py:351-369 --ulysses-degree/--ring-degree +
wan_orig/text2video.py dit_fsdp):
  dp: data parallel — CFG cond/uncond batching (the reference computes both
      in one batch, wan_t2v_inference.py) and weight sharding (FSDP analog,
      wan_orig/distributed/fsdp.py).
  rp: ring / context parallel — token axis sharded, KV rotating over ICI
      (parallel/ring.py; xfuser ring_degree analog).
  sp: Ulysses — head-sharded attention (xfuser ulysses_degree analog,
      wan_orig/distributed/xdit_context_parallel.py:63-169).

Weight sharding (parallel/sharding.py) always spreads over ALL axes, so any
mesh shape gives the FSDP memory win.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    *,
    dp: int = 1,
    sp: int | None = None,
    rp: int = 1,
) -> Mesh:
    """dp x rp x sp mesh ('sp' fills the remainder when omitted)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if sp is None:
        assert n_devices % (dp * rp) == 0, (n_devices, dp, rp)
        sp = n_devices // (dp * rp)
    assert dp * sp * rp == n_devices, (dp, sp, rp, n_devices)
    arr = np.array(devices[:n_devices]).reshape(dp, rp, sp)
    return Mesh(arr, ("dp", "rp", "sp"))
