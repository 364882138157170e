"""Video stabilization engine with the Stabilo API surface.

Re-implements the external `stabilo` dependency the reference builds on
(SURVEY.md §2.5; consumed at reference extract.py:139,174-188 and
utils/registration.py:59-86): per-frame homography estimation against a
reference frame, with detected-vehicle masking, downsampled feature work,
ratio-test matching, and robust projective/affine fitting. The compute path
is the JAX feature stack (ops/features.py) + parallel-hypothesis RANSAC
(ops/ransac.py); this class is the thin host-side state holder.

API parity (used by the extraction stage and registration helper):
    Stabilizer(**cfg)                      cfg = the YAML 'stabilo' section
    set_ref_frame(frame, boxes|None)
    stabilize(frame, boxes|None)
    transform_cur_boxes() -> (N,4) boxes in reference coords | None
    get_cur_trans_matrix() -> 3x3 cur->ref homography | None
    get_cur_num_keypoints() -> (ref_count, cur_count)
    get_cur_num_matches() -> int
    get_cur_inliers_count() -> int

Dual use like the reference: (a) per-frame video stabilization during
extraction; (b) one-shot src->dst registration for georeferencing (dst set
as the reference, src 'stabilized' onto it).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LOG = logging.getLogger("geotrax")

from geotrax_tpu.ops import features
from geotrax_tpu.ops.homography import apply_homography
from geotrax_tpu.ops.ransac import ransac_fit


class Stabilizer:
    def __init__(
        self,
        downsample_ratio: float = 0.5,
        max_features: int = 2000,
        ref_multiplier: float = 2.0,
        filter_ratio: float = 0.9,
        transformation_type: str = "projective",
        ransac_epipolar_threshold: float = 2.0,
        ransac_max_iter: int = 5000,
        mask_use: bool = True,
        mask_margin_ratio: float = 0.15,
        clahe: bool = False,
        detector_name: str = "orb",
        min_good_match_count_warning: int = 20,
        min_inliers_match_count_warning: int = 10,
        **_ignored,  # full stabilo config surface accepted
    ):
        self.downsample_ratio = float(downsample_ratio)
        self.max_features = int(max_features)
        self.ref_features = int(max_features * ref_multiplier)
        self.filter_ratio = float(filter_ratio)
        self.transformation_type = transformation_type
        self.ransac_threshold = float(ransac_epipolar_threshold)
        # Parallel hypotheses replace sequential RANSAC iterations; with
        # inverse-CDF weighted sampling + the IRLS polish each hypothesis
        # does far more work than one classic iteration. iterations/8
        # (floored at 512) keeps >100 expected all-inlier samples at the
        # masked-BEV inlier ratios (>=0.5) where same-scale stabilization
        # operates, and RANSAC scoring cost is linear in the budget
        # (measured 1.12 -> 0.55 ms/frame at 625 vs 1250 hypotheses).
        self.num_hypotheses = int(min(max(ransac_max_iter // 8, 512), 4096))
        self.mask_use = bool(mask_use)
        self.mask_margin_ratio = float(mask_margin_ratio)
        self.clahe = bool(clahe)
        self.detector_name = detector_name
        # Detector family dispatch: SIFT-class names run the scale-space
        # gradient (RootSIFT) pipeline with L2 matching — the cross-domain
        # master->ortho registration needs gradient descriptors (reference
        # utils/registration.py:59-77); the ORB-class per-frame stabilization
        # is same-scale and runs the single-level binary pipeline for speed.
        self.use_sift = detector_name in ("sift", "rsift", "kaze", "akaze")
        self.n_levels = 4 if self.use_sift else 1
        self.min_match_warning = min_good_match_count_warning
        self.min_inlier_warning = min_inliers_match_count_warning

        self._ref = None      # (kps, desc)
        # base RNG key; per-frame RANSAC keys are fold_in(base, frame_id)
        # with frame_id counted from the reference frame (= 1). Identical
        # derivation to the fused chunk pipeline (pipeline/device_pipeline),
        # so the two extraction paths draw the same sample streams and agree
        # bit-for-bit.
        self._key = jax.random.PRNGKey(0)
        self._fid = 1
        self._cur_boxes = None
        self._cur_h: Optional[np.ndarray] = None
        self._cur_boxes_ref: Optional[np.ndarray] = None
        self._cur_counts = (0, 0)
        self._cur_matches = 0
        self._cur_inliers = 0
        self._fused = None        # jitted per-frame pipeline (single-level path)
        # fixed box-mask capacity for the fused path: sized to the detector's
        # max_det default (1000) — a smaller cap silently let features on the
        # truncated vehicles bias the homography toward traffic motion
        self.mask_slots = 1024

    # ------------------------------------------------------------------ internals
    def _prepare(self, frame: np.ndarray, boxes, n_features: int):
        gray = features.rgb_to_gray(jnp.asarray(frame))
        gray = features.downsample(gray, self.downsample_ratio)
        if self.clahe:
            from geotrax_tpu.ops.clahe import clahe as clahe_op

            gray = clahe_op(gray)
        mask = None
        if self.mask_use and boxes is not None and len(boxes):
            scaled = jnp.asarray(boxes, jnp.float32) * self.downsample_ratio
            mask = features.boxes_mask(gray.shape, scaled, self.mask_margin_ratio)
        if self.use_sift:
            from geotrax_tpu.ops import sift

            # mask BEFORE the per-level budget selection (like fast_detect):
            # post-hoc invalidation would let vehicle keypoints consume the
            # feature budget and starve the static background
            feats = sift.detect_and_describe(gray, n_features, mask=mask)
            kps = features.Keypoints(
                xy=feats.xy, score=feats.score, angle=feats.angle,
                valid=feats.valid,
            )
            return kps, feats.desc
        if self.n_levels > 1:
            return features.detect_and_describe_pyramid(
                gray, n_features, n_levels=self.n_levels, mask=mask
            )
        # same-scale consecutive-frame matching: float grid descriptors
        # (two smoothing scales + gradients at 16 point samples, L2-matched;
        # consecutive hovering-drone frames rotate < a few degrees)
        kps = features.fast_detect(gray, n_features, mask=mask, oriented=False)
        desc = features.describe_grid(gray, kps)
        return kps, desc

    # ------------------------------------------------------------------ API
    def set_ref_frame(self, frame: np.ndarray, boxes=None) -> None:
        """Fix the reference frame (features extracted once, at the higher
        ref_multiplier budget)."""
        self._ref = self._prepare(frame, boxes, self.ref_features)
        self._fid = 1

    def _build_fused(self, frame_shape):
        """One jitted function for the whole per-frame pipeline (gray ->
        features -> match -> RANSAC): a single device dispatch per frame
        instead of four round trips."""
        ratio = self.downsample_ratio
        n_features = self.max_features
        filter_ratio = self.filter_ratio
        threshold = self.ransac_threshold
        num_hyps = self.num_hypotheses
        transformation = (
            "projective" if self.transformation_type == "projective" else "affine"
        )
        use_clahe = self.clahe
        use_mask = self.mask_use
        margin = self.mask_margin_ratio

        @jax.jit
        def fused(frame_u8, boxes_padded, ref_xy, ref_desc, ref_valid, key):
            gray = features.rgb_to_gray(frame_u8)
            gray = features.downsample(gray, ratio)
            if use_clahe:
                from geotrax_tpu.ops.clahe import clahe as clahe_op

                gray = clahe_op(gray)
            mask = (
                features.boxes_mask(gray.shape, boxes_padded * ratio, margin)
                if use_mask else None
            )
            kps = features.fast_detect(gray, n_features, mask=mask, oriented=False)
            desc = features.describe_grid(gray, kps)
            from geotrax_tpu.ops.sift import match_l2

            matches = match_l2(
                desc, kps.valid, ref_desc, ref_valid, ratio=filter_ratio
            )
            src = kps.xy[matches.idx_a]
            dst = ref_xy[matches.idx_b]
            result = ransac_fit(
                src, dst, matches.valid, threshold=threshold, key=key,
                num_hypotheses=num_hyps, transformation=transformation,
            )
            return (result.h_matrix, result.num_inliers,
                    matches.valid.sum(), kps.valid.sum())

        return fused

    def stabilize(self, frame: np.ndarray, boxes=None) -> None:
        """Estimate the cur->ref homography for this frame."""
        if self._ref is None:
            raise RuntimeError("set_ref_frame must be called before stabilize")
        self._cur_boxes = None if boxes is None else np.asarray(boxes, np.float32)
        ref_kps, ref_desc = self._ref
        self._fid += 1
        sub = jax.random.fold_in(self._key, self._fid)

        if self.n_levels == 1:
            if self._fused is None:
                self._fused = self._build_fused(frame.shape)
            padded = np.zeros((self.mask_slots, 4), np.float32)
            if self._cur_boxes is not None and len(self._cur_boxes):
                n = min(len(self._cur_boxes), self.mask_slots)
                padded[:n] = self._cur_boxes[:n, :4]
            h_ds, n_inliers, n_matches, n_kps = self._fused(
                jnp.asarray(frame), jnp.asarray(padded),
                ref_kps.xy, ref_desc, ref_kps.valid, sub,
            )
            self._cur_counts = (int(ref_kps.valid.sum()), int(n_kps))
            self._cur_matches = int(n_matches)
            if self._cur_matches < 4:
                self._cur_h = None
                self._cur_inliers = 0
                self._cur_boxes_ref = None
                return
            self._cur_inliers = int(n_inliers)
            result_h = np.asarray(h_ds)
        else:
            kps, desc = self._prepare(frame, boxes, self.max_features)
            self._cur_counts = (int(ref_kps.valid.sum()), int(kps.valid.sum()))
            if self.use_sift:
                from geotrax_tpu.ops import sift

                matches = sift.match_l2(
                    desc, kps.valid, ref_desc, ref_kps.valid, ratio=self.filter_ratio
                )
            else:
                matches = features.match_descriptors(
                    desc, kps.valid, ref_desc, ref_kps.valid, ratio=self.filter_ratio
                )
            self._cur_matches = int(matches.valid.sum())
            if self._cur_matches < 4:
                self._cur_h = None
                self._cur_inliers = 0
                self._cur_boxes_ref = None
                return
            result = ransac_fit(
                kps.xy[matches.idx_a], ref_kps.xy[matches.idx_b], matches.valid,
                threshold=self.ransac_threshold, key=sub,
                num_hypotheses=self.num_hypotheses,
                transformation="projective" if self.transformation_type == "projective" else "affine",
            )
            self._cur_inliers = int(result.num_inliers)
            result_h = np.asarray(result.h_matrix)

        if self._cur_matches < self.min_match_warning:
            _LOG.warning(
                f"Low match count ({self._cur_matches} < "
                f"{self.min_match_warning}); homography may be unreliable."
            )
        if self._cur_inliers < self.min_inlier_warning:
            _LOG.warning(
                f"Low inlier count ({self._cur_inliers} < "
                f"{self.min_inlier_warning}); homography may be unreliable."
            )

        # Undo the downsampling: H_full = S^-1 · H_ds · S  (S = scale matrix).
        s = self.downsample_ratio
        scale = np.diag([s, s, 1.0]).astype(np.float32)
        h_full = np.linalg.inv(scale) @ result_h @ scale
        # Degenerate-fit guard: near-collinear matches can leave RANSAC's
        # best hypothesis NaN/Inf or rank-deficient — report failure (None)
        # so callers fall back to identity / retry, exactly like the fused
        # device path's isfinite + |denom| guard (device_pipeline.py).
        if not np.all(np.isfinite(h_full)) or abs(h_full[2, 2]) < 1e-12:
            self._cur_h = None
            self._cur_boxes_ref = None
            return
        self._cur_h = h_full / h_full[2, 2]

        if self._cur_boxes is not None and len(self._cur_boxes):
            # Transform all four corners, re-fit the axis-aligned box.
            cx, cy, w, h = (self._cur_boxes[:, i] for i in range(4))
            corners = np.stack([
                np.stack([cx - w / 2, cy - h / 2], -1),
                np.stack([cx + w / 2, cy - h / 2], -1),
                np.stack([cx + w / 2, cy + h / 2], -1),
                np.stack([cx - w / 2, cy + h / 2], -1),
            ], axis=1)  # (N,4,2)
            flat = corners.reshape(-1, 2)
            moved = np.asarray(
                apply_homography(jnp.asarray(self._cur_h), jnp.asarray(flat)[None])[0]
            ).reshape(-1, 4, 2)
            mins = moved.min(axis=1)
            maxs = moved.max(axis=1)
            out = self._cur_boxes.copy()
            out[:, 0:2] = (mins + maxs) / 2
            out[:, 2:4] = maxs - mins
            self._cur_boxes_ref = out
        else:
            self._cur_boxes_ref = self._cur_boxes

    def transform_cur_boxes(self):
        return self._cur_boxes_ref

    def get_cur_trans_matrix(self):
        return self._cur_h

    def get_cur_num_keypoints(self):
        return self._cur_counts

    def get_cur_num_matches(self):
        return self._cur_matches

    def get_cur_inliers_count(self):
        return self._cur_inliers
