"""Keypoint detection, binary descriptors, and matching (JAX, TPU-first).

Replaces OpenCV's ORB detect/describe + brute-force matching
(SURVEY.md §2.3 N8/N9) used by the stabilization engine and image
registration. Everything is fixed-shape:

- FAST-style corner test: the 16-pixel Bresenham circle is materialized as
  16 shifted copies of the image (pure VPU elementwise work); a corner needs
  >= 9 contiguous brighter or darker pixels (run-length via a doubled-mask
  trick). Harris-like score for ranking, 3x3 non-max suppression, global
  top-K -> exactly ``max_features`` keypoints with a validity mask.
- Orientation by intensity centroid (ORB): patch moments within a radius-15
  disc -> atan2(m01, m10).
- Steered binary descriptor: 256 pixel-pair tests (deterministic Gaussian
  pattern) on a Gaussian-smoothed image, test offsets rotated per keypoint.
- Matching: Hamming distance of {0,1} descriptors via one matmul on the MXU
  (|a XOR b| = sum a + sum b - 2 a.b), top-2 + Lowe ratio test.

Descriptors are bit-compatible only with themselves (both sides of every
match come from this module), so the pattern choice is free; what matters —
and what tests pin — is registration accuracy of the downstream RANSAC fit
on known warps.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# 16 offsets of the radius-3 Bresenham circle, clockwise from 12 o'clock.
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], dtype=np.int32)  # (dx, dy)


class Keypoints(NamedTuple):
    xy: jnp.ndarray      # (K, 2) float, x then y (full-resolution pixels)
    score: jnp.ndarray   # (K,)
    angle: jnp.ndarray   # (K,) radians
    valid: jnp.ndarray   # (K,) bool


def rgb_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) uint8/float RGB -> (H,W) float32 luma (ITU-R BT.601)."""
    img = image.astype(jnp.float32)
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def downsample(gray: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Canonical behavior at ratio 0.5 with even dims is the 2x2 box mean
    (== cv2 INTER_LINEAR 0.5x exactly); other ratios / odd dims fall back to
    jax.image.resize's triangle-weighted linear kernel, whose numerics
    differ slightly. Downstream only consumes this for keypoint detection,
    where either kernel is fine — but the two paths are NOT interchangeable
    per-video: a 1920x1080 and a 1921x1081 video take different paths."""
    if ratio >= 1.0:
        return gray
    h, w = gray.shape
    if ratio == 0.5 and h % 2 == 0 and w % 2 == 0:
        # 2x2 mean via reduce_window: ~2.5x faster than the gather-based
        # resize at 4K (strided-slice and reshape-mean forms hit pathological
        # TPU layouts — measured 15-320 ms/frame vs 0.6 ms for this).
        s = jax.lax.reduce_window(gray, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID")
        return s * 0.25
    return jax.image.resize(gray, (int(h * ratio), int(w * ratio)), method="linear")


def boxes_mask(shape: tuple, boxes_xywh, margin_ratio: float = 0.15) -> jnp.ndarray:
    """(H,W) bool mask that is False inside each (cx,cy,w,h) box inflated by
    ``margin_ratio`` — the stabilizer's moving-object exclusion
    (reference cfg stabilo.mask_use/mask_margin_ratio). Zero-width rows are
    ignored, so fixed-slot padded box arrays work directly.

    Axis-aligned boxes separate into row and column interval indicators, so
    the union is one (H,N)@(N,W) matmul on the MXU instead of a sequential
    N-step scan over full-image comparisons."""
    h, w = shape
    boxes = jnp.asarray(boxes_xywh, jnp.float32)
    cx, cy = boxes[:, 0], boxes[:, 1]
    bw = boxes[:, 2] * (1 + margin_ratio)
    bh = boxes[:, 3] * (1 + margin_ratio)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    rows = (
        (ys[None, :] >= (cy - bh / 2)[:, None])
        & (ys[None, :] <= (cy + bh / 2)[:, None])
        & (boxes[:, 2] > 0)[:, None]
    ).astype(jnp.float32)  # (N,H)
    cols = (
        (xs[None, :] >= (cx - bw / 2)[:, None])
        & (xs[None, :] <= (cx + bw / 2)[:, None])
    ).astype(jnp.float32)  # (N,W)
    inside = rows.T @ cols  # (H,W) — count of covering boxes
    return inside < 0.5


RADIUS_FAST = 3


def _shifted(padded, h, w, pad, dx, dy):
    """Static window into a pre-padded image: out[y,x] = img[y+dy, x+dx]
    (zero border). Static slices fuse into elementwise consumers — no
    materialized shifted copies."""
    return jax.lax.dynamic_slice(padded, (pad + dy, pad + dx), (h, w))


def fast_score_map_xla(gray: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner score map in pure fused XLA via bit packing.

    The 16 ring comparisons pack into one int32 bitmask plane (16 weighted
    adds); the >=9-contiguous-run test is log-doubling shift-ANDs on the
    doubled mask (b | b<<16) — ~10 integer ops per pixel on one plane,
    instead of a materialized (16,H,W) boolean tensor. Numerically identical
    to fast_score_map_reference; batches under vmap with no per-frame
    serialization (unlike a Pallas dispatch)."""
    center = gray.astype(jnp.float32)
    h, w = center.shape
    pad = RADIUS_FAST
    padded = jnp.pad(center, pad)
    hi = center + threshold
    lo = center - threshold

    bits_b = jnp.zeros((h, w), jnp.int32)
    bits_d = jnp.zeros((h, w), jnp.int32)
    score = jnp.zeros((h, w), jnp.float32)
    for k, (dx, dy) in enumerate(_CIRCLE):
        ring = _shifted(padded, h, w, pad, int(dx), int(dy))
        bits_b = bits_b + ((ring > hi).astype(jnp.int32) << k)
        bits_d = bits_d + ((ring < lo).astype(jnp.int32) << k)
        score = score + jnp.abs(ring - center)

    def has_run9(bits):
        dbl = bits | (bits << 16)
        r = dbl & (dbl >> 1)
        r = r & (r >> 2)
        r = r & (r >> 4)
        r = r & (dbl >> 8)
        return (r & 0xFFFF) != 0

    is_corner = has_run9(bits_b) | has_run9(bits_d)
    return jnp.where(is_corner, score, 0.0)


def _gaussian_blur(gray: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable blur as static-slice tap sums (zero-padded borders, matching
    jnp.convolve mode='same').

    TPU benchmarks at 1080p: lax.conv forces whole-image layout transposes
    (+55 ms/frame); vmapped jnp.convolve lowers to a slow per-row gather
    (~59 ms/frame); this tap-sum form is pure shifted elementwise adds that
    XLA fuses into one pass per axis (~0.5 ms/frame)."""
    radius = int(3 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    taps = 2 * radius + 1
    h, w = gray.shape
    rows = jnp.pad(gray, ((0, 0), (radius, radius)))
    blurred = sum(k[i] * rows[:, i:i + w] for i in range(taps))
    cols = jnp.pad(blurred, ((radius, radius), (0, 0)))
    return sum(k[i] * cols[i:i + h, :] for i in range(taps))


@partial(jax.jit, static_argnames=("max_features", "threshold", "oriented"))
def fast_detect(gray: jnp.ndarray, max_features: int, threshold: float = 20.0,
                mask: jnp.ndarray | None = None, oriented: bool = True) -> Keypoints:
    """FAST-9/16 corners with contiguity test + Harris-style score, 3x3 NMS,
    and top-``max_features`` selection.

    ``oriented=False`` skips the intensity-centroid pass (angle = 0): the
    per-frame stabilization match is same-scale and near-same-rotation
    (consecutive frames of a hovering drone), where steering buys nothing
    and the K-patch moment gather costs ~4 ms/frame at K=2000."""
    h, w = gray.shape
    # bit-packed fused-XLA scoring (identical to the roll-based reference and
    # the Pallas kernel in ops/pallas_fast.py; unlike the Pallas dispatch it
    # batches natively under vmap — the fused chunk step runs 16 frames)
    score = fast_score_map_xla(gray, threshold)

    # Exclude borders and masked (vehicle) regions.
    border = 16
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ok = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    if mask is not None:
        ok = ok & mask
    score = jnp.where(ok, score, 0.0)

    # 3x3 non-max suppression.
    neighborhood = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    score = jnp.where(score >= neighborhood, score, 0.0)

    from geotrax_tpu.ops.topk import approx_top_k

    # approximate top-k (recall ~0.95 among equal-score tails) is ~10x
    # faster than the full 2M-element sort; feature selection tolerates
    # swapping the weakest corners for near-equals
    top_scores, flat_idx = approx_top_k(score.reshape(-1), max_features)
    kp_y = (flat_idx // w).astype(jnp.float32)
    kp_x = (flat_idx % w).astype(jnp.float32)
    valid = top_scores > 0.0

    # Orientation: intensity centroid over a radius-15 disc.
    angle = _orientation(gray, kp_x, kp_y) if oriented else jnp.zeros_like(kp_x)
    return Keypoints(
        xy=jnp.stack([kp_x, kp_y], axis=-1),
        score=top_scores,
        angle=angle,
        valid=valid,
    )


@lru_cache(maxsize=4)
def _disc_offsets(radius: int = 15):
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    inside = xs**2 + ys**2 <= radius**2
    return (np.stack([xs[inside], ys[inside]], axis=-1)).astype(np.int32)


def _orientation(gray, kp_x, kp_y, radius: int = 15):
    """Intensity-centroid orientation (ORB flavor).

    The K*709 disc reads were one scattered gather (~14 ms/frame on TPU at
    K=2000); keypoints come from top_k on the pixel grid with a 16 px border
    exclusion, so each disc fits in one contiguous (2R+1)^2 block slice —
    extracted with a block gather (fast DMAs) and reduced against a constant
    disc-weight stencil. Identical pixels for in-border keypoints; only the
    f32 summation order differs from the scattered form."""
    h, w = gray.shape
    p = 2 * radius + 1
    x0 = jnp.clip(kp_x.astype(jnp.int32) - radius, 0, w - p)
    y0 = jnp.clip(kp_y.astype(jnp.int32) - radius, 0, h - p)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    patch = jax.lax.gather(
        gray, jnp.stack([y0, x0], -1), dn,
        slice_sizes=(p, p), mode=jax.lax.GatherScatterMode.CLIP,
    )  # (K,P,P)
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    inside = (xs**2 + ys**2 <= radius**2).astype(np.float32)
    wx = jnp.asarray((xs * inside).astype(np.float32))
    wy = jnp.asarray((ys * inside).astype(np.float32))
    m10 = jnp.sum(patch * wx[None], axis=(1, 2))
    m01 = jnp.sum(patch * wy[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


@lru_cache(maxsize=4)
def _brief_pattern(n_tests: int = 256, patch: int = 31, seed: int = 7):
    rng = np.random.default_rng(seed)
    sd = patch / 5.0
    pts = rng.normal(0.0, sd, size=(n_tests, 2, 2))
    return np.clip(pts, -(patch // 2), patch // 2).astype(np.float32)


_DESC_PATCH = 48  # covers the rotated +-22 px test extent around a keypoint
_DESC_PATCH_UNORIENTED = 32  # unrotated extent is +-15 px


def patches32(img: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray) -> jnp.ndarray:
    """(H,W) f32 + (K,) int32 pre-clipped corners -> (K,32,32) patches via an
    XLA block gather (ops/pallas_patches.py holds an experimental VMEM-
    resident kernel, kept off the hot path — the descriptor pipeline now
    avoids per-keypoint block gathers entirely, see _packed_test_planes)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    return jax.lax.gather(
        img, jnp.stack([y0, x0], -1), dn,
        slice_sizes=(32, 32), mode=jax.lax.GatherScatterMode.CLIP,
    )


def _packed_test_planes(smoothed: jnp.ndarray, n_tests: int) -> jnp.ndarray:
    """(H,W) smoothed luma -> (H,W,n_tests//32) int32 planes where bit b of
    plane w at pixel p is test t = w*32+b: s(p+o1_t) < s(p+o2_t), offsets
    from the rounded BRIEF pattern (zero padding beyond borders — keypoints
    carry a 16 px border exclusion so in-range bits never see it)."""
    assert n_tests % 32 == 0
    h, w = smoothed.shape
    half = _DESC_PATCH_UNORIENTED // 2  # 16 >= max |offset|
    pts = np.round(_brief_pattern(n_tests)).astype(np.int64)  # (T,2,2)
    padded = jnp.pad(smoothed, half)

    def view(dx, dy):
        return jax.lax.dynamic_slice(padded, (half + dy, half + dx), (h, w))

    planes = []
    for word in range(n_tests // 32):
        acc = jnp.zeros((h, w), jnp.int32)
        for b in range(32):
            (x1, y1), (x2, y2) = pts[word * 32 + b]
            bit = view(int(x1), int(y1)) < view(int(x2), int(y2))
            acc = acc | (bit.astype(jnp.int32) << b)
        planes.append(acc)
    return jnp.stack(planes, axis=-1)


@lru_cache(maxsize=4)
def _unoriented_selection(n_tests: int, patch: int):
    """Constant (patch*patch, n_tests*2) one-hot selection matrix: at angle 0
    the rounded test offsets are fixed integers, so reading all test points
    from a keypoint's patch is a single constant matmul on the MXU."""
    half = patch // 2 - 1  # 15 for patch 32
    pts = np.round(_brief_pattern(n_tests)).astype(np.int64)  # (T,2,2) in [-15,15]
    flat_idx = (pts[..., 1] + half) * patch + (pts[..., 0] + half)  # (T,2)
    sel = np.zeros((patch * patch, n_tests * 2), np.float32)
    sel[flat_idx.reshape(-1), np.arange(n_tests * 2)] = 1.0
    return sel


@partial(jax.jit, static_argnames=("n_tests", "oriented", "method"))
def describe(gray: jnp.ndarray, kps: Keypoints, n_tests: int = 256,
             oriented: bool = True, method: str = "patches") -> jnp.ndarray:
    """Steered binary descriptors (K, n_tests) in {0,1} float32.

    The K*T*2 test-point reads are the hot op. A scattered 2D gather runs on
    the TPU's scalar path (~17 ms/frame at 1080p/K=2000); instead, each
    keypoint's 48x48 neighborhood is pulled out with one block-slice gather
    (contiguous 2D slices lower to fast DMAs) and the test points are
    selected with one-hot matmuls on the MXU (~5 ms/frame). One-hot rows
    have a single nonzero product, so 'highest'-precision selection is
    bit-exact — both paths produce identical descriptors.

    ``oriented=False`` (the per-frame stabilization path, where angles are
    all zero) shrinks the patch to 32x32 and replaces the per-keypoint
    one-hot construction with one constant selection matmul — identical
    descriptors to the oriented path at angle 0, at a fraction of the cost."""
    smoothed = _gaussian_blur(gray, sigma=2.0)
    h_img, w_img = gray.shape
    if not oriented and min(h_img, w_img) >= _DESC_PATCH_UNORIENTED:
        if method == "planes":
            # full-image comparison planes + per-keypoint int gathers.
            # NOTE: measured 22 ms/frame at 1080p on TPU (the 512 shifted
            # views do not fuse) — kept only as a parity oracle; the patch
            # path below is the production route (~1 ms/frame).
            planes = _packed_test_planes(smoothed, n_tests)  # (H,W,T/32) int32
            kx = jnp.clip(kps.xy[:, 0].astype(jnp.int32), 0, w_img - 1)
            ky = jnp.clip(kps.xy[:, 1].astype(jnp.int32), 0, h_img - 1)
            ints = planes[ky, kx]  # (K, T/32)
            shifts = jnp.arange(32, dtype=jnp.int32)
            bits = (ints[:, :, None] >> shifts) & 1
            return bits.reshape(kps.xy.shape[0], n_tests).astype(jnp.float32)
        # block-gather each keypoint's 32x32 patch + one constant selection
        # matmul on the MXU (bit-identical to the planes path)
        p = _DESC_PATCH_UNORIENTED
        k = kps.xy.shape[0]
        half = p // 2 - 1
        x0 = jnp.clip(kps.xy[:, 0].astype(jnp.int32) - half, 0, w_img - p)
        y0 = jnp.clip(kps.xy[:, 1].astype(jnp.int32) - half, 0, h_img - p)
        patches = patches32(smoothed, x0, y0)
        sel = jnp.asarray(_unoriented_selection(n_tests, p))
        with jax.default_matmul_precision("highest"):
            vals = (patches.reshape(k, p * p) @ sel).reshape(k, n_tests, 2)
        return (vals[..., 0] < vals[..., 1]).astype(jnp.float32)
    pattern = jnp.asarray(_brief_pattern(n_tests))  # (T,2,2)
    cos = jnp.cos(kps.angle)
    sin = jnp.sin(kps.angle)
    rot = jnp.stack([jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2)  # (K,2,2)
    # rotate both test points for all keypoints: (K,T,2,2)
    rotated = jnp.einsum("kij,tpj->ktpi", rot, pattern)
    pos = kps.xy[:, None, None, :] + rotated  # (K,T,2,[x,y])
    h, w = gray.shape
    px = jnp.clip(jnp.round(pos[..., 0]), 0, w - 1).astype(jnp.int32)
    py = jnp.clip(jnp.round(pos[..., 1]), 0, h - 1).astype(jnp.int32)
    if jax.devices()[0].platform not in ("tpu", "axon") or min(h, w) < _DESC_PATCH:
        vals = smoothed[py, px]  # (K,T,2) — fast enough off-TPU
        return (vals[..., 0] < vals[..., 1]).astype(jnp.float32)

    p = _DESC_PATCH
    k = kps.xy.shape[0]
    # patch window: x in [floor(x)-23, floor(x)+24] contains every clipped
    # test point (rotated extent +-22, rounding +-0.5), incl. border clamps
    x0 = jnp.clip(jnp.floor(kps.xy[:, 0]).astype(jnp.int32) - 23, 0, w - p)
    y0 = jnp.clip(jnp.floor(kps.xy[:, 1]).astype(jnp.int32) - 23, 0, h - p)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    patches = jax.lax.gather(
        smoothed, jnp.stack([y0, x0], -1), dn,
        slice_sizes=(p, p), mode=jax.lax.GatherScatterMode.CLIP,
    )  # (K,P,P)
    rel_y = (py - y0[:, None, None]).reshape(k, -1)  # (K, T*2)
    rel_x = (px - x0[:, None, None]).reshape(k, -1)
    oy = (rel_y[..., None] == jnp.arange(p)).astype(jnp.float32)  # (K,T2,P)
    ox = (rel_x[..., None] == jnp.arange(p)).astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        rows = jnp.einsum("kts,kso->kto", oy, patches)  # (K,T2,P)
    vals = (rows * ox).sum(-1).reshape(k, n_tests, 2)
    return (vals[..., 0] < vals[..., 1]).astype(jnp.float32)


def detect_and_describe_pyramid(
    gray: jnp.ndarray,
    max_features: int,
    n_levels: int = 4,
    scale: float = 1.25,
    threshold: float = 20.0,
    mask: jnp.ndarray | None = None,
) -> tuple[Keypoints, jnp.ndarray]:
    """Multi-scale detection + description over an image pyramid.

    The per-frame stabilization match is same-scale (1 level suffices), but
    the master-frame -> orthophoto registration crosses a real scale gap
    (reference handles it with SIFT's scale space); a 4-level 1.25x pyramid
    covers ~2.4x relative scale. The feature budget is split evenly across
    levels; keypoint coordinates are mapped back to level-0 pixels, and the
    final set is the global top-``max_features`` by score.
    """
    per_level = max(max_features // n_levels, 32)
    all_xy, all_score, all_angle, all_valid, all_desc = [], [], [], [], []
    current = gray
    h0, w0 = gray.shape
    for level in range(n_levels):
        level_mask = None
        if mask is not None:
            level_mask = (
                mask if level == 0
                else jax.image.resize(
                    mask.astype(jnp.float32), current.shape, method="nearest"
                ) > 0.5
            )
        kps = fast_detect(current, per_level, threshold=threshold, mask=level_mask)
        desc = describe(current, kps)
        # Map back to level-0 pixels with the ACTUAL per-axis ratios (int()
        # truncation makes them drift from the nominal scale^level and differ
        # between axes) and resize's half-pixel-center convention
        # ((i+0.5)*ratio-0.5) — same fix as sift.py's octave rescale; a bare
        # xy*scale^level skews the far corner by >1 px at deep levels.
        lh, lw = current.shape
        ratio = jnp.asarray([w0 / lw, h0 / lh], kps.xy.dtype)
        all_xy.append((kps.xy + 0.5) * ratio - 0.5)
        all_score.append(kps.score)
        all_angle.append(kps.angle)
        all_valid.append(kps.valid)
        all_desc.append(desc)
        if level + 1 < n_levels:
            h, w = current.shape
            current = jax.image.resize(
                current, (int(h / scale), int(w / scale)), method="linear"
            )

    xy = jnp.concatenate(all_xy)
    score = jnp.where(jnp.concatenate(all_valid), jnp.concatenate(all_score), 0.0)
    angle = jnp.concatenate(all_angle)
    desc = jnp.concatenate(all_desc)
    top_scores, idx = jax.lax.top_k(score, min(max_features, score.shape[0]))
    return (
        Keypoints(xy=xy[idx], score=top_scores, angle=angle[idx], valid=top_scores > 0),
        desc[idx],
    )


_GRID_OFFS = np.array([-9, -3, 3, 9], dtype=np.int32)
GRID_DESC_DIM = 64  # 16 grid points x 4 channels


def _gaussian_blur_bf16(gray: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """bf16 tap-sum blur: halves the bandwidth of the ~52 dense passes in
    describe_grid (measured 1.88 -> 1.39 ms/frame at 1080p/K=2000, mean
    descriptor dot vs f32 = 0.99). NOT for the SIFT DoG path — differences
    of blurs cancel catastrophically in bf16 (use _gaussian_blur there)."""
    radius = int(3 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    taps = 2 * radius + 1
    h, w = gray.shape
    rows = jnp.pad(gray.astype(jnp.bfloat16), ((0, 0), (radius, radius)))
    blurred = sum(jnp.bfloat16(k[i]) * rows[:, i:i + w] for i in range(taps))
    cols = jnp.pad(blurred, ((radius, radius), (0, 0)))
    return sum(jnp.bfloat16(k[i]) * cols[i:i + h, :] for i in range(taps))


@partial(jax.jit, static_argnames=())
def describe_grid(gray: jnp.ndarray, kps: Keypoints) -> jnp.ndarray:
    """64-D float descriptors for same-scale matching via POINT gathers.

    Two smoothing scales + x/y gradients sampled at a 4x4 grid (offsets
    ±3/±9 px) around each keypoint: 16 points x 4 channels. Point gathers
    from an (H,W,4) plane stack cost ~1.2 ms/frame at K=2048 where the
    32x32 patch block-gather costs ~5.3 ms (DMA-issue/VMEM-movement bound —
    measured under the chained protocol; the Pallas VMEM kernel in
    ops/pallas_patches.py is no faster). Illumination handling: the
    per-keypoint mean brightness is removed from the intensity channels
    (additive shifts) and the vector is L2-normalized (gain); matched with
    L2 distance (ops/sift.py:match_l2), not Hamming. The dense planes are
    bf16 (see _gaussian_blur_bf16); normalization runs in f32.
    """
    h, w = gray.shape
    s2 = _gaussian_blur_bf16(gray, sigma=2.0)
    gx = jnp.bfloat16(0.5) * (jnp.roll(s2, -1, axis=1) - jnp.roll(s2, 1, axis=1))
    gy = jnp.bfloat16(0.5) * (jnp.roll(s2, -1, axis=0) - jnp.roll(s2, 1, axis=0))
    s4 = _gaussian_blur_bf16(s2, sigma=2.0)
    planes = jnp.stack([s2, gx, gy, s4], axis=-1)  # (H,W,4) bf16

    dy, dx = np.meshgrid(_GRID_OFFS, _GRID_OFFS, indexing="ij")
    dy = jnp.asarray(dy.reshape(-1))
    dx = jnp.asarray(dx.reshape(-1))
    ky = jnp.clip(kps.xy[:, 1].astype(jnp.int32)[:, None] + dy[None], 0, h - 1)
    kx = jnp.clip(kps.xy[:, 0].astype(jnp.int32)[:, None] + dx[None], 0, w - 1)
    vals = planes[ky, kx].astype(jnp.float32)  # (K,16,4)

    m2 = vals[..., 0].mean(axis=1, keepdims=True)
    m4 = vals[..., 3].mean(axis=1, keepdims=True)
    desc = jnp.concatenate([
        vals[..., 0] - m2, vals[..., 1], vals[..., 2], vals[..., 3] - m4,
    ], axis=-1)  # (K,64)
    return desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)


class Matches(NamedTuple):
    idx_a: jnp.ndarray   # (M,) indices into A's keypoints
    idx_b: jnp.ndarray   # (M,)
    valid: jnp.ndarray   # (M,) bool


@partial(jax.jit, static_argnames=())
def match_descriptors(desc_a, valid_a, desc_b, valid_b, ratio: float = 0.9) -> Matches:
    """Brute-force Hamming matching with Lowe ratio test.

    dist(a,b) = sum(a) + sum(b) - 2 a.b — one (Ka,Kb) matmul on the MXU.
    Descriptors are {0,1}, so the bf16 matmul with f32 accumulation is
    bit-exact (every product is 0 or 1) at full MXU rate. The second-best
    distance uses an elementwise column-index mask rather than a scatter —
    a vmapped scatter into the (Ka,Kb) distance matrix cost ~9 ms/frame.
    Returns one candidate match per A keypoint (fixed shape Ka) with a
    validity mask (ratio-test pass + both endpoints valid) and mutual
    cross-check (B's best must be A).
    """
    dots = jax.lax.dot_general(
        desc_a.astype(jnp.bfloat16), desc_b.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = desc_a.sum(axis=1, keepdims=True) + desc_b.sum(axis=1)[None, :] - 2.0 * dots
    big = jnp.float32(1e9)
    dist = jnp.where(valid_a[:, None] & valid_b[None, :], dist, big)

    best_b = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_d = jnp.min(dist, axis=1)
    cols = jnp.arange(dist.shape[1], dtype=jnp.int32)
    second_d = jnp.min(
        jnp.where(cols[None, :] == best_b[:, None], big, dist), axis=1
    )
    ratio_ok = best_d < ratio * second_d

    # mutual cross-check
    best_a_of_b = jnp.argmin(dist, axis=0).astype(jnp.int32)
    mutual = best_a_of_b[best_b] == jnp.arange(dist.shape[0], dtype=jnp.int32)

    valid = valid_a & ratio_ok & mutual & (best_d < big / 2)
    return Matches(
        idx_a=jnp.arange(dist.shape[0]),
        idx_b=best_b,
        valid=valid,
    )
