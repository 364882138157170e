"""Perspective image warping on-device (JAX gather; Pallas-ready layout).

Replaces cv2.warpPerspective (SURVEY.md §2.3 N11; reference visualize.py:289).
The warp is a bilinear gather: for each destination pixel, map through the
inverse homography and blend 4 neighbours. XLA lowers the gather + fma chain
efficiently; a dedicated Pallas kernel slots in behind the same signature if
gather bandwidth ever becomes the bottleneck.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_height", "out_width"))
def warp_perspective(
    image: jnp.ndarray,
    h_matrix: jnp.ndarray,
    out_height: int,
    out_width: int,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Warp (H,W,C) image by the 3x3 ``h_matrix`` (src->dst convention, like
    cv2.warpPerspective): output pixel p_dst samples src at H^-1 @ p_dst.
    Bilinear interpolation, constant border."""
    h_inv = jnp.linalg.inv(h_matrix)
    ys, xs = jnp.mgrid[0:out_height, 0:out_width]
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1).astype(jnp.float32)  # (H,W,3)
    with jax.default_matmul_precision("highest"):
        src = dst @ h_inv.T.astype(jnp.float32)
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]

    in_h, in_w = image.shape[0], image.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < in_w) & (yi >= 0) & (yi < in_h)
        xi_c = jnp.clip(xi, 0, in_w - 1)
        yi_c = jnp.clip(yi, 0, in_h - 1)
        vals = image[yi_c, xi_c].astype(jnp.float32)
        return jnp.where(valid[..., None], vals, fill_value)

    top = sample(y0i, x0i) * (1 - fx)[..., None] + sample(y0i, x0i + 1) * fx[..., None]
    bot = sample(y0i + 1, x0i) * (1 - fx)[..., None] + sample(y0i + 1, x0i + 1) * fx[..., None]
    out = top * (1 - fy)[..., None] + bot * fy[..., None]
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.round(out).clip(0, 255)
    return out.astype(image.dtype)
