"""SVG1 full-coverage exactness fuzz (companion to tests/test_sap_fuzz.py).

Property: when the sliding-window width spans the whole sequence, the SVG1
runtime (profiler -> per-head placement -> masked kernel -> inverse) must be
EXACTLY dense attention regardless of the profiler's spatial/temporal pick —
placement is a permutation and a full band is layout-invariant.

Width bookkeeping caveats baked into the cases (both reference parity):
  - sparsity_to_width discounts the always-on text columns
    (core/masks.py:28-34), so full video coverage with context_length > 0
    needs sparsity = 1 - (ctx/S)^2 + 2*ctx/S, not 1.0;
  - the hyvideo mask FLOOR-rounds the width to 128-token multiples
    (hyvideo/utils.py:23-33 -> sparse/svg1.py mask_spec), so exact full
    coverage is only reachable when video_length % 128 == 0.
Text-last oracle: dense over the real prefix (video + prompt_len) — the
reference replaces masked SDPA with varlen flash over real tokens
(hyvideo/attention.py:35-44)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.config import SVGConfig, VideoLayout, WarmupSchedule
from sparse_videogen_tpu.core.attention_ref import dense_attention
from sparse_videogen_tpu.sparse.runtimes import SVG1Runtime
from sparse_videogen_tpu.sparse.svg1 import make_svg1_plan


# interpret-mode Pallas at production-ish shapes / full pipeline drives:
# excluded from the fast CI gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CASES = [
    # (nf, fs, ctx, prompt_len, H)
    (5, 40, 0, 0, 1),
    (3, 40, 0, 0, 2),
    (5, 64, 0, 0, 4),
    (4, 96, 0, 0, 1),
    (4, 32, 24, 11, 2),    # text-last, vl=128
    (4, 64, 256, 143, 1),  # hyvideo-like, vl=256
    (2, 64, 24, 23, 4),    # nearly-full prompt
    (8, 32, 96, 2, 2),     # nearly-empty prompt
]


@pytest.mark.parametrize("nf,fs,ctx,pl,H", CASES)
def test_svg1_full_coverage_equals_dense(nf, fs, ctx, pl, H):
    D = 64
    S = nf * fs + ctx
    s_full = 1.0 - (ctx / S) ** 2 + 2 * ctx / S
    if ctx:
        layout = VideoLayout(num_frames=nf, frame_size=fs, context_length=ctx,
                             text_position="last", prompt_length=pl)
    else:
        layout = VideoLayout(num_frames=nf, frame_size=fs)
    plan = make_svg1_plan(layout, SVGConfig(sparsity=s_full, num_sampled_rows=8),
                          WarmupSchedule(first_layers=0, first_times=1001.0))
    rt = SVG1Runtime(plan, prompt_length=pl) if ctx else SVG1Runtime(plan)
    consts = rt.consts()
    key = jax.random.PRNGKey(hash((nf, fs, ctx, H)) % (2**31))
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (1, H, S, D), jnp.float32)
    v = jax.random.normal(kv_, (1, H, S, D), jnp.float32)
    state = jax.tree.map(lambda x: x[0], rt.init_state(H, D, 1))
    out, _ = rt(q, k, v, jnp.float32(500.0), key, 0, state, consts)

    real = nf * fs + pl
    ref = dense_attention(q[:, :, :real], k[:, :, :real], v[:, :, :real])
    err = float(jnp.max(jnp.abs(out[:, :, :real] - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 3e-5, err
