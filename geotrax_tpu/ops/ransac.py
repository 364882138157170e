"""Massively-parallel robust homography estimation (RANSAC / MAGSAC-style).

Replaces cv2.findHomography with USAC_MAGSAC (SURVEY.md §2.3 N10) the TPU
way: instead of a sequential hypothesize-and-verify loop, thousands of
4-point DLT hypotheses are fitted and scored **in parallel** (vmapped
eigensolves + one big reprojection-error matrix), then the best model is
polished by iteratively-reweighted least squares on its soft inliers —
a sigma-marginalized (MAGSAC-like) scoring replaces the hard inlier count so
the threshold acts as a scale rather than a cliff.

All shapes are static: the candidate correspondence set is fixed-size with a
validity mask, and the hypothesis budget is a compile-time constant.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.homography import (
    fit_affine,
    fit_homography_minimal,
    fit_homography_normal,
    normalize_h,
    reprojection_error,
)


class RansacResult(NamedTuple):
    h_matrix: jnp.ndarray   # (3,3)
    inliers: jnp.ndarray    # (N,) bool
    num_inliers: jnp.ndarray  # scalar int
    score: jnp.ndarray      # scalar float (soft inlier score)


def _sample_indices(key, num_hypotheses: int, sample_size: int, n: int,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """(H, S) random correspondence indices, weighted by validity (PROSAC-ish
    weighting hook: pass match-quality weights to bias sampling).

    Sampling is WITH replacement via one inverse-CDF searchsorted over all
    H*S draws — `jax.random.choice(replace=False)` lowers to a full Gumbel
    top-k sort of the weight vector per hypothesis (1250 sorts of the
    candidate set per frame). A within-sample collision produces a
    degenerate minimal fit that scores zero, exactly like a collinear
    sample; with hundreds of valid matches the waste is <1% of hypotheses.
    """
    cum = jnp.cumsum(weights)
    u = jax.random.uniform(key, (num_hypotheses, sample_size)) * cum[-1]
    return jnp.clip(jnp.searchsorted(cum, u), 0, n - 1)


@partial(jax.jit, static_argnames=("num_hypotheses", "transformation", "refine_iters"))
def ransac_fit(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float,
    key: jax.Array,
    num_hypotheses: int = 2048,
    transformation: str = "projective",
    refine_iters: int = 3,
) -> RansacResult:
    """Robust fit of dst ≈ H @ src over (N,2) correspondences with (N,) mask.

    threshold: inlier reprojection error [px] (MAGSAC-style soft scoring uses
    it as the error scale). Hypotheses with degenerate minimal samples score
    zero naturally (their reprojection errors explode).
    """
    n = src.shape[0]
    sample_size = 4 if transformation == "projective" else 3
    # minimal samples: closed-form projective-basis fit; refinement:
    # weighted DLT via 9x9 normal equations (both avoid the scalar path)
    hyp_fit = fit_homography_minimal if transformation == "projective" else fit_affine
    fit_fn = fit_homography_normal if transformation == "projective" else fit_affine

    weights = valid.astype(jnp.float32)
    # degenerate case (no valid correspondences): sample uniformly so the
    # fused pipeline stays NaN-free; callers gate on the match count.
    weights = jnp.where(weights.sum() > 0, weights, jnp.ones_like(weights))
    weights = weights / jnp.maximum(weights.sum(), 1.0)

    idx = _sample_indices(key, num_hypotheses, sample_size, n, weights)  # (H,S)
    src_samples = src[idx]  # (H,S,2)
    dst_samples = dst[idx]

    hyps = jax.vmap(hyp_fit)(src_samples, dst_samples)  # (H,3,3)

    # Score every hypothesis against every correspondence in one batch.
    # Degenerate minimal samples make the 8x8 solve return NaN/Inf — treat
    # those as infinite error so the hypothesis scores zero instead of
    # poisoning the argmax.
    errors = jax.vmap(lambda h: reprojection_error(h, src, dst))(hyps)  # (H,N)
    errors = jnp.where(jnp.isfinite(errors), errors, jnp.inf)
    errors = jnp.where(valid[None, :], errors, jnp.inf)
    # Soft (sigma-marginalized flavor) score: smooth step over the threshold.
    soft = jnp.maximum(0.0, 1.0 - (errors / threshold) ** 2)
    scores = soft.sum(axis=1)
    best = jnp.argmax(scores)
    h_best = hyps[best]

    # Local optimization: IRLS refit on soft inliers of the incumbent model.
    def refine(h, _):
        err = reprojection_error(h, src, dst)
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        w = jnp.where(valid, jnp.maximum(0.0, 1.0 - (err / threshold) ** 2), 0.0)
        h_new = fit_fn(src, dst, weights=w)
        # keep the better of (h, h_new) by soft score
        def score_of(hm):
            e = jnp.where(valid, reprojection_error(hm, src, dst), jnp.inf)
            e = jnp.where(jnp.isfinite(e), e, jnp.inf)
            return jnp.maximum(0.0, 1.0 - (e / threshold) ** 2).sum()
        better = score_of(h_new) >= score_of(h)
        return jnp.where(better, h_new, h), None

    h_final, _ = jax.lax.scan(refine, h_best, None, length=refine_iters)
    h_final = normalize_h(h_final)

    err_final = reprojection_error(h_final, src, dst)
    inliers = valid & (err_final < threshold)
    soft_final = jnp.where(valid, jnp.maximum(0.0, 1.0 - (err_final / threshold) ** 2), 0.0)
    return RansacResult(h_final, inliers, inliers.sum(), soft_final.sum())
