"""Projective geometry: point transforms and homography estimation (JAX).

Replaces cv2.perspectiveTransform and the deterministic parts of
cv2.findHomography (SURVEY.md §2.3 N10/N11): applying a 3x3 homography is a
matmul + divide; fitting one from correspondences is a normalized DLT solved
with an eigendecomposition (4-point exact or N-point least squares). The
robust (RANSAC/MAGSAC) wrapper lives in geotrax_tpu/ops/ransac.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_homography(h: jnp.ndarray, points: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Transform (..., N, 2) points by (..., 3, 3) homographies.

    Unrolled elementwise form (full f32 on the VPU): an einsum here is a
    dot_general with contraction size 3, which the TPU pads to a full MXU
    tile — 40x wasted lanes on RANSAC's (hyps, N) scoring matrices — and
    whose bf16 default is catastrophic for the normalize/denormalize
    cancellations in this geometry path.
    """
    x, y = points[..., 0], points[..., 1]
    hb = h[..., None, :, :]  # broadcast over the points axis
    mx = hb[..., 0, 0] * x + hb[..., 0, 1] * y + hb[..., 0, 2]
    my = hb[..., 1, 0] * x + hb[..., 1, 1] * y + hb[..., 1, 2]
    mw = hb[..., 2, 0] * x + hb[..., 2, 1] * y + hb[..., 2, 2]
    return jnp.stack([mx, my], axis=-1) / (mw[..., None] + eps)


def invert_homography(h: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(h)


def matmul3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3, 3) as unrolled elementwise math.

    A batched tiny dot_general pads each 3x3 operand to an MXU tile; over
    RANSAC's thousands of hypotheses that is ~2.5x slower than 27 fused
    multiply-adds on the VPU (measured 0.38 -> 0.15 ms/frame in the
    1250-hypothesis minimal-fit stage)."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(a[..., i, 0] * b[..., 0, j]
                        + a[..., i, 1] * b[..., 1, j]
                        + a[..., i, 2] * b[..., 2, j])
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def matvec3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3) without dot_general (see matmul3)."""
    return jnp.stack([
        m[..., i, 0] * v[..., 0] + m[..., i, 1] * v[..., 1] + m[..., i, 2] * v[..., 2]
        for i in range(3)
    ], axis=-1)


def compose(h_outer: jnp.ndarray, h_inner: jnp.ndarray) -> jnp.ndarray:
    """Composition: apply h_inner first, then h_outer."""
    return h_outer @ h_inner


def normalize_h(h: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return h / (h[..., 2:3, 2:3] + eps)


def _normalization_transform(points: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Hartley normalization: translate centroid to origin, scale mean
    distance to sqrt(2). points: (..., N, 2) -> (..., 3, 3)."""
    centroid = points.mean(axis=-2, keepdims=True)
    dist = jnp.linalg.norm(points - centroid, axis=-1).mean(axis=-1)
    scale = jnp.sqrt(2.0) / (dist + eps)
    t = jnp.zeros(points.shape[:-2] + (3, 3), dtype=points.dtype)
    t = t.at[..., 0, 0].set(scale)
    t = t.at[..., 1, 1].set(scale)
    t = t.at[..., 0, 2].set(-scale * centroid[..., 0, 0])
    t = t.at[..., 1, 2].set(-scale * centroid[..., 0, 1])
    t = t.at[..., 2, 2].set(1.0)
    return t


def fit_homography(src: jnp.ndarray, dst: jnp.ndarray,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized DLT homography fit from (..., N, 2) correspondences, N >= 4.

    Solves A h = 0 via the smallest right singular vector of A (batched,
    vmappable — static shapes for any N, which is what the
    parallel-hypothesis RANSAC needs). Optional per-point weights.
    Returns (..., 3, 3) normalized so h[2,2] = 1.
    """
    t_src = _normalization_transform(src)
    t_dst = _normalization_transform(dst)
    s = apply_homography(t_src, src)
    d = apply_homography(t_dst, dst)

    x, y = s[..., 0], s[..., 1]
    u, v = d[..., 0], d[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Two rows per correspondence of the standard DLT system.
    row1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    row2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    a = jnp.concatenate([row1, row2], axis=-2)  # (..., 2N, 9)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)[..., None]
        a = a * jnp.sqrt(jnp.maximum(w, 0.0))

    # Smallest right singular vector of A (SVD avoids squaring the condition
    # number the way an eigh of AᵀA would — matters in f32). full_matrices
    # only when the minimal 4-point sample makes A 8x9 (the nullspace vector
    # is then the 9th right singular vector, absent from the thin V); for
    # N-point least-squares fits the thin SVD suffices and the full U would
    # be a catastrophic (2N,2N) allocation.
    with jax.default_matmul_precision("highest"):
        _, _, vt = jnp.linalg.svd(a, full_matrices=a.shape[-2] < 9)
        h_norm = vt[..., -1, :].reshape(src.shape[:-2] + (3, 3))
        h = _sim_inverse(t_dst) @ h_norm @ t_src
    return normalize_h(h)


def adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate of (..., 3, 3): adj(M) @ M = det(M) I.

    For projective entities (defined up to scale) the adjugate IS the
    inverse — no division, no LU, pure elementwise VPU work, which is what
    makes the 4-point fit below vectorize over thousands of hypotheses
    (an 8x8 ``jnp.linalg.solve`` per hypothesis runs on the TPU's scalar
    path: measured 6.5 ms/frame vs ~0.1 ms for this form)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
    ], -2)


def _sim_inverse(t: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a Hartley normalization transform
    [[s,0,tx],[0,s,ty],[0,0,1]] (avoids jnp.linalg.inv's LU path)."""
    s = t[..., 0, 0]
    inv_s = 1.0 / s
    out = jnp.zeros_like(t)
    out = out.at[..., 0, 0].set(inv_s)
    out = out.at[..., 1, 1].set(inv_s)
    out = out.at[..., 0, 2].set(-t[..., 0, 2] * inv_s)
    out = out.at[..., 1, 2].set(-t[..., 1, 2] * inv_s)
    out = out.at[..., 2, 2].set(1.0)
    return out


def _projective_basis(points4: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 2) -> (..., 3, 3) transform B mapping the canonical projective
    basis e1,e2,e3,(1,1,1) to the four points: B = [p1 p2 p3] diag(v) with
    v ∝ [p1 p2 p3]^-1 p4 (scale-free via the adjugate)."""
    p = jnp.concatenate([points4, jnp.ones_like(points4[..., :1])], -1)  # (...,4,3)
    m = jnp.stack([p[..., 0, :], p[..., 1, :], p[..., 2, :]], -1)        # columns
    v = matvec3(adjugate3(m), p[..., 3, :])
    return m * v[..., None, :]


def fit_homography_normal(src: jnp.ndarray, dst: jnp.ndarray,
                          weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted DLT via the 9x9 normal equations: h = smallest eigenvector of
    AᵀWA. One (9,2N)@(2N,9) matmul on the MXU + a tiny eigh, instead of the
    (2N,9) SVD — the IRLS refinement inside RANSAC calls this several times
    per frame and the SVD lowers to the TPU's slow scalar path. Squaring the
    condition number is safe here because Hartley normalization keeps
    cond(A) small and the caller only uses this to polish an already-good
    hypothesis (tests gate the end accuracy)."""
    t_src = _normalization_transform(src)
    t_dst = _normalization_transform(dst)
    s = apply_homography(t_src, src)
    d = apply_homography(t_dst, dst)
    x, y = s[..., 0], s[..., 1]
    u, v = d[..., 0], d[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    row2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    a = jnp.concatenate([row1, row2], axis=-2)  # (..., 2N, 9)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)[..., None]
        a = a * jnp.sqrt(jnp.maximum(w, 0.0))
    with jax.default_matmul_precision("highest"):
        ata = jnp.einsum("...ni,...nj->...ij", a, a)
        _, vecs = jnp.linalg.eigh(ata)           # ascending eigenvalues
        h_norm = vecs[..., :, 0].reshape(src.shape[:-2] + (3, 3))
        h = _sim_inverse(t_dst) @ h_norm @ t_src
    return normalize_h(h)


def fit_homography_minimal(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Exact 4-point homography via the projective-basis method: H maps the
    canonical basis through src and dst as H = B_dst adj(B_src). Entirely
    closed-form 3x3 algebra (adjugates instead of solves/inverses), so it
    vectorizes to thousands of RANSAC hypotheses at VPU speed. Degenerate
    (collinear) samples yield a near-singular B whose adjugate produces a
    wild H — those hypotheses score as outliers downstream, same as the
    reference's cv2 RANSAC discards them. Hartley normalization keeps the
    f32 products conditioned.
    """
    t_src = _normalization_transform(src)
    t_dst = _normalization_transform(dst)
    s = apply_homography(t_src, src)
    d = apply_homography(t_dst, dst)
    b_src = _projective_basis(s)
    b_dst = _projective_basis(d)
    h_norm = matmul3(b_dst, adjugate3(b_src))
    h = matmul3(matmul3(_sim_inverse(t_dst), h_norm), t_src)
    return normalize_h(h)


def fit_affine(src: jnp.ndarray, dst: jnp.ndarray,
               weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Least-squares affine fit from (..., N, 2) correspondences, N >= 3.
    Returned as a 3x3 homography with last row [0, 0, 1]."""
    ones = jnp.ones(src.shape[:-1] + (1,), dtype=src.dtype)
    a = jnp.concatenate([src, ones], axis=-1)  # (..., N, 3)
    with jax.default_matmul_precision("highest"):
        if weights is not None:
            w = jnp.maximum(weights, 0.0)[..., None]
            ata = jnp.einsum("...ni,...nj->...ij", a * w, a)
            atb = jnp.einsum("...ni,...nj->...ij", a * w, dst)
        else:
            ata = jnp.einsum("...ni,...nj->...ij", a, a)
            atb = jnp.einsum("...ni,...nj->...ij", a, dst)
        sol = jnp.linalg.solve(ata + 1e-9 * jnp.eye(3), atb)  # (..., 3, 2)
    h = jnp.zeros(src.shape[:-2] + (3, 3), dtype=src.dtype)
    h = h.at[..., :2, :].set(sol.swapaxes(-1, -2))
    h = h.at[..., 2, 2].set(1.0)
    return h


def reprojection_error(h: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Per-point Euclidean reprojection error (..., N)."""
    return jnp.linalg.norm(apply_homography(h, src) - dst, axis=-1)
