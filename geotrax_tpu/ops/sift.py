"""SIFT-class scale-space gradient features (RootSIFT) in JAX, TPU-first.

The reference's single accuracy-critical match — BEV master frame to
orthophoto — runs RootSIFT at a 250k-feature budget through OpenCV
(reference utils/registration.py:59-77, cfg/default.yaml:158-168). Binary
FAST/BRIEF descriptors cannot survive that cross-domain gap (different
sensors, seasons, illumination, 1.5-2.5x scale, rotation); gradient-
histogram descriptors do. This module rebuilds that capability the TPU way:

- scale space: Gaussian octave pyramid, difference-of-Gaussian response,
  per-level 3x3 NMS + top-k budgets (fixed shapes; no irregular 3D extrema
  walk — per-level budgets make the selection compile-time static),
- orientation: gradient-direction histogram planes smoothed at the
  keypoint scale; peak + parabolic refinement per keypoint,
- descriptor: 8 orientation planes with linear bin interpolation, tent
  (SIFT trilinear) spatial smoothing per cell, 4x4 rotated cell grid
  sampled bilinearly -> 128-D; L2-normalize, clip 0.2, renormalize, then
  the RootSIFT map (L1 normalize + sqrt) so L2 distance approximates the
  Hellinger kernel,
- matching: blockwise L2 distance on the MXU with running top-2 + mutual
  cross-check, so a 250k x 250k match streams through memory instead of
  materializing a 250 GB distance matrix.

Everything is deterministic and fixed-shape per (image size, budget).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from geotrax_tpu.ops.features import Matches, _gaussian_blur

N_BINS = 8
N_CELLS = 4          # 4x4 spatial cells
DESC_DIM = N_BINS * N_CELLS * N_CELLS  # 128


class SiftFeatures(NamedTuple):
    xy: jnp.ndarray      # (K, 2) level-0 pixel coords
    score: jnp.ndarray   # (K,)
    angle: jnp.ndarray   # (K,) radians
    valid: jnp.ndarray   # (K,)
    desc: jnp.ndarray    # (K, 128) RootSIFT


def _triangle_blur(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable tent filter (SIFT's trilinear spatial weighting): triangle
    taps of half-width ``radius`` per axis, zero-padded borders."""
    taps = np.arange(-radius, radius + 1)
    k = (1.0 - np.abs(taps) / (radius + 1)).astype(np.float32)
    k = k / k.sum()
    h, w = img.shape
    n = 2 * radius + 1
    rows = jnp.pad(img, ((0, 0), (radius, radius)))
    out = sum(k[i] * rows[:, i:i + w] for i in range(n))
    cols = jnp.pad(out, ((radius, radius), (0, 0)))
    return sum(k[i] * cols[i:i + h, :] for i in range(n))


def _orientation_planes(level_img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient magnitude/orientation -> (H,W,8) linearly-interpolated
    orientation-bin planes (each pixel contributes m*(1-f) and m*f to its
    two adjacent bins)."""
    gx = 0.5 * (jnp.roll(level_img, -1, axis=1) - jnp.roll(level_img, 1, axis=1))
    gy = 0.5 * (jnp.roll(level_img, -1, axis=0) - jnp.roll(level_img, 1, axis=0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    theta = jnp.arctan2(gy, gx)  # (-pi, pi]
    b = (theta / (2 * np.pi) * N_BINS) % N_BINS
    b0 = jnp.floor(b)
    frac = b - b0
    b0 = b0.astype(jnp.int32) % N_BINS
    b1 = (b0 + 1) % N_BINS
    planes = jnp.zeros(level_img.shape + (N_BINS,), jnp.float32)
    oh = jax.nn.one_hot(b0, N_BINS) * (mag * (1 - frac))[..., None]
    oh1 = jax.nn.one_hot(b1, N_BINS) * (mag * frac)[..., None]
    return planes + oh + oh1, mag


def _bilinear_planes(planes: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """planes (H,W,B); x,y (...,) float -> (..., B) bilinear samples
    (clamped borders)."""
    h, w = planes.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = planes[y0i, x0i]
    v01 = planes[y0i, x1i]
    v10 = planes[y1i, x0i]
    v11 = planes[y1i, x1i]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _circular_shift_bins(vals: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """vals (..., B) circularly resampled by a fractional bin ``shift``
    (broadcast over leading dims): rotation invariance of the histogram."""
    base = jnp.arange(N_BINS, dtype=jnp.float32)
    pos = (base + shift[..., None]) % N_BINS
    p0 = jnp.floor(pos)
    frac = pos - p0
    p0 = p0.astype(jnp.int32) % N_BINS
    p1 = (p0 + 1) % N_BINS
    v0 = jnp.take_along_axis(vals, p0, axis=-1)
    v1 = jnp.take_along_axis(vals, p1, axis=-1)
    return v0 * (1 - frac) + v1 * frac


@partial(jax.jit, static_argnames=("budget", "cell"))
def _level_features(level_img: jnp.ndarray, budget: int, cell: int = 4,
                    dog_sigma: float = 1.6, edge_thresh: float = 12.0,
                    row_bounds=None, mask: jnp.ndarray | None = None):
    """Detect + describe on one pyramid level.

    Returns (xy_level (K,2), score, angle, valid, desc (K,128)). xy are in
    THIS level's pixel coordinates; the caller rescales to level 0.
    ``row_bounds`` (lo, hi) restricts keypoints to a core row interval —
    the band-streamed path uses it to drop overlap-halo duplicates.
    ``mask`` (this level's shape, True = usable) zeroes scores BEFORE the
    top-``budget`` selection so masked-out regions don't consume the
    feature budget (matching the fast_detect path's semantics).
    """
    h, w = level_img.shape
    g1 = _gaussian_blur(level_img, dog_sigma)
    g2 = _gaussian_blur(level_img, dog_sigma * 1.6)
    dog = g1 - g2

    # keypoint score: |DoG| with an edge suppression (Harris-style ratio of
    # principal curvatures via the DoG Hessian)
    dxx = jnp.roll(dog, -1, 1) + jnp.roll(dog, 1, 1) - 2 * dog
    dyy = jnp.roll(dog, -1, 0) + jnp.roll(dog, 1, 0) - 2 * dog
    dxy = 0.25 * (jnp.roll(jnp.roll(dog, -1, 0), -1, 1)
                  + jnp.roll(jnp.roll(dog, 1, 0), 1, 1)
                  - jnp.roll(jnp.roll(dog, -1, 0), 1, 1)
                  - jnp.roll(jnp.roll(dog, 1, 0), -1, 1))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr / jnp.maximum(det, 1e-12)
                           < (edge_thresh + 1) ** 2 / edge_thresh)
    score = jnp.where(edge_ok, jnp.abs(dog), 0.0)

    border = 4 * cell  # descriptor support fits inside the image
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    if row_bounds is not None:
        lo, hi = row_bounds
        inside = inside & (ys >= lo) & (ys < hi)
    if mask is not None:
        inside = inside & mask
    score = jnp.where(inside, score, 0.0)
    neighborhood = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    score = jnp.where(score >= neighborhood, score, 0.0)
    from geotrax_tpu.ops.topk import exact_top_k

    # exact PartialReduce beats the full sort on multi-megapixel levels;
    # k capped on very large inputs (see TOPK_CAP)
    k_eff = min(budget, TOPK_CAP) if score.size > TOPK_CAP_MIN_INPUT else budget
    top, flat = exact_top_k(score.reshape(-1), k_eff)
    kx = (flat % w).astype(jnp.float32)
    ky = (flat // w).astype(jnp.float32)
    valid = top > 1e-6

    planes, _mag = _orientation_planes(g1)

    # orientation assignment: bins of the scale-smoothed planes at the kp
    ori_planes = jax.vmap(
        lambda p: _gaussian_blur(p, 1.5 * dog_sigma), in_axes=2, out_axes=2
    )(planes)
    hist = _bilinear_planes(ori_planes, kx, ky)  # (K,8)
    peak = jnp.argmax(hist, axis=-1)
    left = jnp.take_along_axis(hist, ((peak - 1) % N_BINS)[:, None], 1)[:, 0]
    right = jnp.take_along_axis(hist, ((peak + 1) % N_BINS)[:, None], 1)[:, 0]
    center = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
    denom = left - 2 * center + right
    offset = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (left - right) / denom, 0.0)
    angle = (peak + offset) * (2 * np.pi / N_BINS)

    # descriptor: tent-smoothed orientation planes sampled on a rotated
    # 4x4 cell grid, bins rotated into the keypoint frame
    cell_planes = jax.vmap(
        lambda p: _triangle_blur(p, cell), in_axes=2, out_axes=2
    )(planes)
    centers = (np.arange(N_CELLS) - (N_CELLS - 1) / 2.0) * cell  # {-6,-2,2,6}*...
    gy_, gx_ = np.meshgrid(centers, centers, indexing="ij")
    grid = np.stack([gx_.ravel(), gy_.ravel()], -1)  # (16,2)
    cosA = jnp.cos(angle)
    sinA = jnp.sin(angle)
    gx_r = cosA[:, None] * grid[None, :, 0] - sinA[:, None] * grid[None, :, 1]
    gy_r = sinA[:, None] * grid[None, :, 0] + cosA[:, None] * grid[None, :, 1]
    sx = kx[:, None] + gx_r  # (K,16)
    sy = ky[:, None] + gy_r
    cell_vals = _bilinear_planes(cell_planes, sx, sy)  # (K,16,8)
    shift = angle / (2 * np.pi / N_BINS)
    cell_vals = _circular_shift_bins(cell_vals, shift[:, None])

    desc = cell_vals.reshape(-1, DESC_DIM)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.clip(desc, 0.0, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    # RootSIFT (reference cfg rsift_eps): L1 normalize + sqrt
    desc = jnp.sqrt(desc / jnp.maximum(desc.sum(-1, keepdims=True), 1e-8))
    return jnp.stack([kx, ky], -1), top, angle, valid, desc


# Levels above this pixel count stream through horizontal bands: the
# (H,W,8) orientation-plane working set is 32 B/px x ~3 copies, so a
# 15000^2 ortho cutout (225 Mpx, reference cfg georef.cutout_width_px)
# would need >20 GB monolithically — over a single chip's HBM.
BAND_PIXEL_LIMIT = 32_000_000
BAND_OVERLAP = 32  # blur/descriptor halo (DoG r8 + orientation r7 + grid 7)
# Largest ApproxTopK k validated on >16M-element inputs on this hardware:
# the round-5 budget hedge pushed per-level selections to 27.6k-39k on
# 28M-element score maps and the TPU worker reproducibly crashed with a
# kernel fault (15000^2/250k regime, twice); k<=23.5k on 28.6M ran clean
# across round 4's full harness. Selections above the cap keep the
# strongest-score semantics, just slightly under the requested share.
# (k=188k on 8.3M elements is green — the envelope is input-size-dependent,
# hence the conditional in _level_features.)
TOPK_CAP = 24_000
TOPK_CAP_MIN_INPUT = 16_000_000


def _level_features_banded(level_img: jnp.ndarray, budget: int,
                           mask: jnp.ndarray | None = None) -> tuple:
    """Band-streamed _level_features for levels too large to hold the
    orientation planes in HBM: horizontal bands with a BAND_OVERLAP halo run
    sequentially under lax.map (one band's working set live at a time);
    keypoints are restricted to each band's core rows, then the per-band
    results are concatenated and cut to the global ``budget`` by score.

    Selection semantics: per-band quotas with a 2x contrast oversample —
    each band detects up to 2x its budget/n_bands share, then the global
    ``budget`` cut keeps the strongest scores across ALL bands. The
    oversample lets contrast-rich bands reclaim quota a flat-texture band
    (sea, forest) would waste on near-zero scores, while still bounding any
    one band to 2x its share, so the selection stays spatially more uniform
    than OpenCV SIFT's whole-image contrast ordering (better RANSAC
    conditioning on large orthos) without the hard-tail starvation a strict
    per-band cap produced (docs/GEOREF_ACCURACY.md, 15000^2 trial 1).
    """
    h, w = level_img.shape
    n_bands = int(np.ceil(h * w / BAND_PIXEL_LIMIT))
    core = int(np.ceil(h / n_bands))
    band_h = min(core + 2 * BAND_OVERLAP, h)
    # 2x contrast oversample, capped at TOPK_CAP: the oversample must not
    # push the per-band ApproxTopK past the largest k validated on this
    # hardware — k=39k selections at the 15000^2/250k regime reproducibly
    # CRASHED the TPU worker ("kernel fault"), while <=24k (the round-4
    # regime) ran clean; see docs/GEOREF_ACCURACY.md
    band_budget = int(min(np.ceil(2 * budget / n_bands), TOPK_CAP))

    starts, bounds = [], []
    for i in range(n_bands):
        c0 = i * core
        c1 = min(c0 + core, h)
        s0 = min(max(c0 - BAND_OVERLAP, 0), h - band_h)
        starts.append(s0)
        bounds.append((c0 - s0, c1 - s0))
    bands = jnp.stack([
        jax.lax.dynamic_slice(level_img, (s0, 0), (band_h, w)) for s0 in starts
    ])
    bounds_arr = jnp.asarray(bounds, jnp.int32)          # (nb, 2)
    starts_arr = jnp.asarray(starts, jnp.float32)
    mask_bands = None
    if mask is not None:
        mask_bands = jnp.stack([
            jax.lax.dynamic_slice(mask, (s0, 0), (band_h, w)) for s0 in starts
        ])

    def one(band_and_meta):
        band, bnd, s0, mb = band_and_meta
        xy, sc, an, va, de = _level_features(
            band, band_budget, row_bounds=(bnd[0], bnd[1]), mask=mb
        )
        xy = xy + jnp.stack([jnp.float32(0.0), s0])
        return xy, sc, an, va, de

    if mask_bands is None:
        def one_nomask(band_and_meta):
            band, bnd, s0 = band_and_meta
            return one((band, bnd, s0, None))

        xy, sc, an, va, de = jax.lax.map(
            one_nomask, (bands, bounds_arr, starts_arr))
    else:
        xy, sc, an, va, de = jax.lax.map(
            one, (bands, bounds_arr, starts_arr, mask_bands))
    xy = xy.reshape(-1, 2)
    sc = sc.reshape(-1)
    an = an.reshape(-1)
    va = va.reshape(-1)
    de = de.reshape(-1, DESC_DIM)
    if sc.shape[0] > budget:
        top_sc, idx = jax.lax.top_k(jnp.where(va, sc, 0.0), budget)
        xy, sc, an, va, de = xy[idx], sc[idx], an[idx], va[idx] & (top_sc > 0), de[idx]
    return xy, sc, an, va, de


def detect_and_describe(
    gray: jnp.ndarray,
    max_features: int,
    n_octaves: int = 4,
    scales_per_octave: int = 2,
    mask: jnp.ndarray | None = None,
) -> SiftFeatures:
    """Multi-octave RootSIFT features with a total ``max_features`` budget
    (split across octaves proportional to pixel counts, like OpenCV SIFT's
    natural distribution). Octave o, scale s sits at 2^o * r^s downsampling
    with r = 2^(1/scales_per_octave)."""
    h, w = gray.shape
    n_levels = n_octaves * scales_per_octave
    r = 2.0 ** (1.0 / scales_per_octave)
    # decide the usable levels FIRST (min dim >= 64; level 0 always kept so
    # tiny inputs return features instead of crashing on an empty concat),
    # then split the budget across only those — otherwise the shares of
    # skipped deep levels would silently vanish from max_features
    all_scales = [r ** i for i in range(n_levels)]
    level_scales = [
        s for i, s in enumerate(all_scales)
        if i == 0 or min(int(round(h / s)), int(round(w / s))) >= 64
    ]
    # Budget shares ~ 1/s per level, NOT 1/s^2 (pixel counts). Area-
    # proportional shares starve the deep octaves that carry ALL the
    # matchable structure under a large scale ratio: registering a 4K master
    # frame against a 15000^2 ortho (reference regime, 3.2-3.7x zoom,
    # cfg/default.yaml:158-168) matches frame level 0 against ortho levels
    # 3-5, which under 1/s^2 held only ~11% of a 250k budget — measured 40
    # raw matches / 29 inliers on the hard tail (docs/GEOREF_ACCURACY.md
    # r4 trial 1, below the reference's 50-inlier gate,
    # /root/reference/geotrax/georeference.py:592). 1/s keeps fine levels
    # densest (same-scale runs keep thousands of inliers) while giving the
    # deep levels ~2.2x more density, hedging across unknown scale ratios
    # the way OpenCV SIFT's exhaustive contrast-ordered detection does.
    weights = np.array([1.0 / s for s in level_scales])
    budgets = np.maximum((max_features * weights / weights.sum()).astype(int), 16)

    xs, scores, angles, valids, descs = [], [], [], [], []
    for i, s in enumerate(level_scales):
        lh, lw = int(round(h / s)), int(round(w / s))
        level = gray if s == 1.0 else jax.image.resize(
            gray, (lh, lw), method="linear"
        )
        level_mask = None
        if mask is not None:
            level_mask = mask if s == 1.0 else jax.image.resize(
                mask.astype(jnp.float32), (lh, lw), method="nearest"
            ) > 0.5
        if lh * lw > BAND_PIXEL_LIMIT:
            xy, sc, an, va, de = _level_features_banded(
                level, int(budgets[i]), mask=level_mask)
        else:
            xy, sc, an, va, de = _level_features(
                level, int(budgets[i]), mask=level_mask)
        # Per-axis rescale: int rounding makes h/lh != w/lw on non-square
        # frames — a shared factor would skew x by several px at the far
        # corner of a large level (inside the 3 px MAGSAC budget).
        # Half-pixel centers: jax.image.resize('linear') maps level pixel i
        # to source coordinate (i+0.5)*ratio-0.5 (verified: a 64->16 ramp
        # reads 5.5/9.5/13.5 at i=1..3, not 4/8/12), so a bare xy*ratio
        # biases every keypoint by 0.5*(ratio-1) px — ~5 px at the deepest
        # octave, which alone blows the 3 px registration budget.
        ratio = jnp.asarray([w / lw, h / lh], xy.dtype)
        xs.append((xy + 0.5) * ratio - 0.5)
        scores.append(sc)
        angles.append(an)
        valids.append(va)
        descs.append(de)

    return SiftFeatures(
        xy=jnp.concatenate(xs),
        score=jnp.concatenate(scores),
        angle=jnp.concatenate(angles),
        valid=jnp.concatenate(valids),
        desc=jnp.concatenate(descs),
    )


@partial(jax.jit, static_argnames=("block",))
def match_l2(desc_a, valid_a, desc_b, valid_b, ratio: float = 0.55,
             block: int = 4096) -> Matches:
    """Blockwise L2 matching with Lowe ratio + mutual cross-check.

    Streams (block x Kb) distance tiles on the MXU with running top-2 per A
    row and running best per B column — O(Ka*Kb) compute, O(block*Kb)
    memory, so the reference's 250k-feature budget fits."""
    ka = desc_a.shape[0]
    kb = desc_b.shape[0]
    big = jnp.float32(1e9)
    pad_a = (-ka) % block
    desc_ap = jnp.pad(desc_a, ((0, pad_a), (0, 0)))
    valid_ap = jnp.pad(valid_a, (0, pad_a))
    n_blocks = (ka + pad_a) // block

    # validity folded into the NORM VECTORS, not a (block,Kb) where-mask:
    # an invalid row/col gets +big on its squared norm, which pushes every
    # one of its distances past the sentinel threshold in the same fused
    # epilogue that forms d2 — one (Ka,)+(Kb,) add instead of a full
    # boolean matrix broadcast pass over the distance tile.
    nb2 = jnp.sum(desc_b * desc_b, axis=-1) + jnp.where(valid_b, 0.0, big)

    def a_block(carry, i):
        b_best, b_row = carry  # (Kb,) running best dist² + owning A row
        a = jax.lax.dynamic_slice(desc_ap, (i * block, 0), (block, desc_a.shape[1]))
        av = jax.lax.dynamic_slice(valid_ap, (i * block,), (block,))
        # f32 DEFAULT matmul precision: descriptors are unit-norm, so the
        # single-pass bf16 dot's ~0.4% error is far inside the Lowe-ratio
        # margin — HIGHEST would spend 6 MXU passes on the dominant matmul.
        dots = a @ desc_b.T
        na2 = jnp.sum(a * a, axis=-1) + jnp.where(av, 0.0, big)
        # SQUARED distances throughout: sqrt is monotonic, so the argmins,
        # the mutual cross-check and the Lowe test (compared against
        # ratio²·second²) are decided identically — and the (block,Kb) sqrt
        # materialization pass disappears.
        d2 = jnp.maximum(na2[:, None] + nb2[None, :] - 2.0 * dots, 0.0)

        # top-2 smallest via min/argmin passes: approx_max_k(k=2) here runs
        # 13x slower under the chunk vmap (measured 0.60 -> 7.8 ms/frame)
        best_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        best = jnp.min(d2, axis=1)
        cols = jnp.arange(kb, dtype=jnp.int32)
        second = jnp.min(jnp.where(cols[None, :] == best_idx[:, None], big, d2), axis=1)

        col_best = jnp.min(d2, axis=0)
        col_row = jnp.argmin(d2, axis=0).astype(jnp.int32) + i * block
        better = col_best < b_best
        b_best = jnp.where(better, col_best, b_best)
        b_row = jnp.where(better, col_row, b_row)
        return (b_best, b_row), (best, second, best_idx)

    (b_best, b_row), (best, second, best_idx) = jax.lax.scan(
        a_block,
        (jnp.full((kb,), big), jnp.full((kb,), -1, jnp.int32)),
        jnp.arange(n_blocks),
    )
    best = best.reshape(-1)[:ka]
    second = second.reshape(-1)[:ka]
    best_idx = best_idx.reshape(-1)[:ka]

    ratio_ok = best < (ratio * ratio) * second
    mutual = b_row[best_idx] == jnp.arange(ka, dtype=jnp.int32)
    valid = valid_a & ratio_ok & mutual & (best < big / 2)
    return Matches(idx_a=jnp.arange(ka), idx_b=best_idx, valid=valid)
