"""Contrast-Limited Adaptive Histogram Equalization (JAX).

Replaces cv2.createCLAHE for the stabilization preprocessing path
(SURVEY.md §2.3 N12; cfg stabilo.clahe, enabled by the 'stable' preset).
Algorithm (cv2-equivalent structure): the image is split into a tile grid,
each tile's 256-bin histogram is clipped at ``clip_limit`` (excess
redistributed uniformly), turned into a CDF mapping, and each output pixel
bilinearly blends the mappings of its 4 surrounding tile centers. All steps
are vectorized: histograms via one-hot segment sums, the final gather blends
run on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("tiles", "clip_limit", "n_bins"))
def clahe(gray: jnp.ndarray, tiles: int = 8, clip_limit: float = 2.0,
          n_bins: int = 256) -> jnp.ndarray:
    """(H,W) float/uint8 grayscale in [0,255] -> equalized float32 [0,255].

    ``tiles`` is the grid size per dimension (cv2 default 8x8); H and W are
    padded up to tile multiples internally.
    """
    gray = gray.astype(jnp.float32)
    h, w = gray.shape
    tile_h = -(-h // tiles)
    tile_w = -(-w // tiles)
    pad_h, pad_w = tile_h * tiles - h, tile_w * tiles - w
    padded = jnp.pad(gray, ((0, pad_h), (0, pad_w)), mode="symmetric")

    bins = jnp.clip(padded.astype(jnp.int32), 0, n_bins - 1)
    tiled = bins.reshape(tiles, tile_h, tiles, tile_w).transpose(0, 2, 1, 3)
    tiled = tiled.reshape(tiles * tiles, tile_h * tile_w)

    # per-tile histogram via one-hot sum
    hist = jax.vmap(lambda t: jnp.bincount(t, length=n_bins))(tiled).astype(jnp.float32)

    # clip + uniform redistribution of the excess (cv2 semantics)
    limit = clip_limit * (tile_h * tile_w) / n_bins
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    mapping = (cdf * (n_bins - 1)).reshape(tiles, tiles, n_bins)

    # bilinear blend of the 4 surrounding tile mappings
    ph, pw = padded.shape
    ys = jnp.arange(ph, dtype=jnp.float32)
    xs = jnp.arange(pw, dtype=jnp.float32)
    ty = (ys - tile_h / 2.0) / tile_h
    tx = (xs - tile_w / 2.0) / tile_w
    y0 = jnp.clip(jnp.floor(ty), 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(tx), 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(ty - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(tx - x0, 0.0, 1.0)[None, :]

    b = bins
    m00 = mapping[y0[:, None], x0[None, :], b]
    m01 = mapping[y0[:, None], x1[None, :], b]
    m10 = mapping[y1[:, None], x0[None, :], b]
    m11 = mapping[y1[:, None], x1[None, :], b]
    out = (
        m00 * (1 - fy) * (1 - fx) + m01 * (1 - fy) * fx
        + m10 * fy * (1 - fx) + m11 * fy * fx
    )
    return out[:h, :w]
