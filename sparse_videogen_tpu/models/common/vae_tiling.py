"""Spatially tiled VAE decode (reference: `pipe.vae.enable_tiling()`,
/root/reference/hyvideo_t2v_inference.py:81, backed by diffusers'
AutoencoderKLCausal3D.tiled_decode; also used by CogVideoX).

Whole-sequence 720p x 129f decode materializes ~60 GB of full-resolution
activations (128 ch x 129 f x 720 x 1280 f32) — far beyond a 16 GB v5e.
Tiling decodes fixed-size latent tiles independently and blends the
overlaps, bounding peak memory by the tile footprint.

TPU-first design choices vs the diffusers implementation:
  - every tile has the SAME latent shape (starts are clamped so edge tiles
    slide back instead of shrinking) -> ONE compiled decode executable for
    all tiles instead of up to four shapes;
  - blending is weighted accumulation with separable linear ramps over the
    overlap (value += w * tile; weight += w; out = value / weight), which is
    seam-free for any overlap pattern, rather than diffusers' pairwise
    row/column blend;
  - the loop over tiles is a host loop (tile count is static and small);
    each iteration is one jit-compiled decode + accumulate.

Tiles see zero padding instead of their true neighborhood at tile borders
(identical to diffusers tiling) — the overlap ramp hides the seam; parity
with the reference's quality behavior, not bit-equality with whole decode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _starts(size: int, tile: int, stride: int):
    """Clamped tile starts covering [0, size) with a fixed tile size."""
    if size <= tile:
        return [0]
    s = list(range(0, size - tile, stride))
    s.append(size - tile)
    return s


def _ramp_weight(n: int, ov: int, has_before: bool, has_after: bool):
    """Separable 1-D blend weight for a tile edge: linear ramp over the
    ov-pixel overlap on sides that have a neighboring tile, 1 elsewhere."""
    w = np.ones((n,), np.float32)
    ov = min(ov, n)
    if ov > 0:
        ramp = (np.arange(1, ov + 1, dtype=np.float32)) / (ov + 1)
        if has_before:
            w[:ov] = ramp
        if has_after:
            w[n - ov:] = ramp[::-1]
    return w


def spatial_tiled_decode(decode_fn, z, *, tile: int = 32, overlap: int = 8,
                         scale: int = 8):
    """Decode latents ``z (B, C, T, h, w)`` through ``decode_fn`` tile by tile.

    Args:
      decode_fn: whole-decode function, ``(B, C, T, th, tw) -> (B, 3, T',
        th*scale, tw*scale)`` (jit it outside for one compiled executable).
      tile: latent tile edge (pixels tile = tile*scale).
      overlap: latent overlap between adjacent tiles (blend region).
      scale: spatial upsampling factor of the decoder (8 for all VAEs here).

    Returns the blended video, same as whole decode up to tile-border
    context differences.
    """
    B, C, T, h, w = z.shape
    th, tw = min(int(tile), h), min(int(tile), w)
    stride_y, stride_x = max(th - overlap, 1), max(tw - overlap, 1)
    ys = _starts(h, th, stride_y)
    xs = _starts(w, tw, stride_x)
    if len(ys) == 1 and len(xs) == 1:
        return decode_fn(z)

    ov_px = overlap * scale
    out = None
    wsum = None
    for yi, y0 in enumerate(ys):
        wy = _ramp_weight(th * scale, ov_px, yi > 0, yi < len(ys) - 1)
        for xi, x0 in enumerate(xs):
            wx = _ramp_weight(tw * scale, ov_px, xi > 0, xi < len(xs) - 1)
            tile_z = z[:, :, :, y0:y0 + th, x0:x0 + tw]
            v = decode_fn(tile_z)
            if out is None:
                Tp = v.shape[2]
                out = jnp.zeros((B, v.shape[1], Tp, h * scale, w * scale), v.dtype)
                wsum = jnp.zeros((h * scale, w * scale), jnp.float32)
            wt2 = wy[:, None] * wx[None, :]  # (th*scale, tw*scale) numpy
            out = out.at[:, :, :, y0 * scale:(y0 + th) * scale,
                         x0 * scale:(x0 + tw) * scale].add(
                v * jnp.asarray(wt2, v.dtype))
            wsum = wsum.at[y0 * scale:(y0 + th) * scale,
                           x0 * scale:(x0 + tw) * scale].add(jnp.asarray(wt2))
    return out / jnp.maximum(wsum.astype(out.dtype), 1e-6)


def temporal_context_decode(decode_fn, z, *, tile_t: int, context_t: int = 4,
                            rate: int = 4):
    """Decode latents in `tile_t`-frame temporal chunks, each with
    `context_t` latent frames of true history prepended and the context's
    pixels dropped (diffusers' tile_sample_min_num_frames analog, but
    context-based instead of blend-based).

    Causal-decoder frame bookkeeping: a chunk whose first latent is treated
    as clip head emits 1 + rate*(n-1) pixels; latent j >= 1 of a chunk spans
    local pixels [rate*(j-1)+1, rate*j]. Keeping latents [a, b) from a chunk
    decoded over [a-c, b) means dropping the first rate*(c-1)+1 local pixels
    (c >= 1). Exact for finite-receptive-field decoders with c >= RF; for
    decoders with temporally-global statistics (GroupNorm over T, causal
    temporal attention) it is approximate at chunk starts — the same
    property as diffusers' blended temporal tiling. For the Wan VAE prefer
    `vae_decode_streamed` (per-conv cache, bit-exact).

    decode_fn: (B, C, t, h, w) latents -> (B, 3, 1 + rate*(t-1), H, W).
    """
    B, C, T, h, w = z.shape
    assert context_t >= 1, "context_t must be >= 1 (the drop-count math needs c >= 1)"
    if T <= tile_t:
        return decode_fn(z)
    outs = [decode_fn(z[:, :, :tile_t])]
    for a in range(tile_t, T, tile_t):
        c = min(context_t, a)
        b = min(a + tile_t, T)
        y = decode_fn(z[:, :, a - c:b])
        outs.append(y[:, :, rate * (c - 1) + 1:])
    import jax.numpy as _jnp

    return _jnp.concatenate(outs, axis=2)


def jit_tiled_decode(decode, params, cfg, z, *, tile=32, overlap=8, scale=8):
    """Shared body of the per-model vae_decode_tiled wrappers: jit the whole
    decode once (one executable for every same-shape tile) and run it
    through spatial_tiled_decode."""
    import jax

    f = jax.jit(lambda p, zt: decode(p, cfg, zt))
    return spatial_tiled_decode(lambda zt: f(params, zt), z,
                                tile=tile, overlap=overlap, scale=scale)
