"""1-D smoothing with exact scipy semantics (JAX).

Replaces scipy.ndimage.gaussian_filter1d / scipy.signal.savgol_filter
(SURVEY.md §2.3 N13) as used by the georeferencing and visualization stages:
  - gaussian: sigma = cfg kernel_size, mode='reflect', truncate=3.0
    (reference georeference.py:788-793)
  - savgol: window = kernel|kernel+1 (odd), polyorder 2, mode='nearest'
    (reference georeference.py:794-797)
  - np.gradient-style central differences for headings
    (reference visualize.py:513-515)

scipy's 'reflect' boundary is symmetric-with-edge-duplication
(d c b a | a b c d | d c b a); the index mapping below handles pads wider
than the signal (radius 3*14=42 routinely exceeds short-track lengths) by
tiling reflections, matching np.pad(mode='symmetric') and scipy exactly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _reflect_index(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Map arbitrary (possibly negative / out-of-range) indices onto [0, n)
    with symmetric reflection: ... 1 0 | 0 1 .. n-1 | n-1 n-2 ..."""
    period = 2 * n
    j = jnp.mod(idx, period)
    return jnp.where(j < n, j, period - 1 - j)


def _nearest_index(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.clip(idx, 0, n - 1)


def correlate1d(x: jnp.ndarray, weights: jnp.ndarray, mode: str = "reflect") -> jnp.ndarray:
    """scipy.ndimage.correlate1d over the last axis with centered origin."""
    n = x.shape[-1]
    k = weights.shape[0]
    radius = k // 2
    offsets = jnp.arange(k) - radius
    idx = jnp.arange(n)[:, None] + offsets[None, :]
    mapper = _reflect_index if mode == "reflect" else _nearest_index
    gathered = jnp.take(x, mapper(idx, n), axis=-1)
    with jax.default_matmul_precision("highest"):
        return jnp.einsum("...nk,k->...n", gathered, weights)


@lru_cache(maxsize=64)
def _gaussian_weights(sigma: float, truncate: float = 3.0) -> np.ndarray:
    """scipy's kernel: exp(-0.5 x²/σ²) over [-r, r], r = int(truncate*σ+0.5),
    normalized to sum 1 (returned reversed-for-correlate like scipy does;
    symmetric so identical)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return (phi / phi.sum()).astype(np.float64)


def gaussian_filter1d(x, sigma: float, mode: str = "reflect", truncate: float = 3.0):
    """Gaussian smoothing along the last axis; parity with
    scipy.ndimage.gaussian_filter1d(data, sigma, mode, truncate)."""
    weights = jnp.asarray(_gaussian_weights(float(sigma), float(truncate)), dtype=jnp.float64
                          if jax.config.jax_enable_x64 else jnp.float32)
    return correlate1d(jnp.asarray(x, dtype=weights.dtype), weights, mode)


@lru_cache(maxsize=64)
def _savgol_weights(window_length: int, polyorder: int) -> np.ndarray:
    """Savitzky-Golay smoothing coefficients (derivative 0, centered):
    the center row of the least-squares polynomial projection."""
    half = window_length // 2
    pos = np.arange(-half, window_length - half, dtype=np.float64)
    a = pos[:, None] ** np.arange(polyorder + 1)[None, :]
    # value at 0 of the fitted polynomial = e0' (A'A)^-1 A' y
    proj = np.linalg.pinv(a)  # (polyorder+1, window)
    return proj[0][::-1].copy()  # reversed: correlate vs convolve convention


def savgol_filter(x, window_length: int, polyorder: int = 2, mode: str = "nearest"):
    """Savitzky-Golay smoothing along the last axis; parity with
    scipy.signal.savgol_filter(..., mode='nearest')."""
    if window_length % 2 == 0:
        window_length += 1
    weights = jnp.asarray(_savgol_weights(int(window_length), int(polyorder)),
                          dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    return correlate1d(jnp.asarray(x, dtype=weights.dtype), weights, mode)


def gaussian_filter1d_np(x: np.ndarray, sigma: float, mode: str = "reflect",
                         truncate: float = 3.0) -> np.ndarray:
    """Float64 host variant (used by the georeferencing stage, where values
    feed fixed-decimal CSV rounding and f32 noise could flip a digit)."""
    return _correlate1d_np(np.asarray(x, np.float64), _gaussian_weights(float(sigma), float(truncate)), mode)


def savgol_filter_np(x: np.ndarray, window_length: int, polyorder: int = 2,
                     mode: str = "nearest") -> np.ndarray:
    if window_length % 2 == 0:
        window_length += 1
    return _correlate1d_np(np.asarray(x, np.float64), _savgol_weights(int(window_length), int(polyorder)), mode)


def _correlate1d_np(x: np.ndarray, weights: np.ndarray, mode: str) -> np.ndarray:
    n = x.shape[-1]
    k = weights.shape[0]
    radius = k // 2
    idx = np.arange(n)[:, None] + (np.arange(k) - radius)[None, :]
    if mode == "reflect":
        period = 2 * n
        j = np.mod(idx, period)
        idx = np.where(j < n, j, period - 1 - j)
    else:
        idx = np.clip(idx, 0, n - 1)
    return (x[..., idx] * weights).sum(-1)


def gradient(x: jnp.ndarray) -> jnp.ndarray:
    """np.gradient for a 1-D series: central differences inside, one-sided at
    the ends (requires length >= 2)."""
    interior = (x[2:] - x[:-2]) / 2.0
    first = x[1:2] - x[0:1]
    last = x[-1:] - x[-2:-1]
    return jnp.concatenate([first, interior, last])
