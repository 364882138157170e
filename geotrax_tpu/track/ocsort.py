"""OC-SORT / Deep OC-SORT on the slot-based core.

Capability parity with the reference's ocsort/deepocsort blocks
(SURVEY.md §2.4; cfg tracker.ocsort / tracker.deepocsort): on top of the
BYTE schedule this adds the observation-centric motion cost (OCM) — a
velocity-direction consistency term weighted by ``inertia`` computed from
the observation history over a ``delta_t`` window — and observation-centric
re-update (OCR): a lost track that re-matches is re-anchored on its last
*observation* rather than the drifted KF prediction. ``use_byte`` toggles
the low-confidence second pass. Deep OC-SORT adds optional GMC and (when
with_reid) EMA appearance embeddings; with_reid=false (the pipeline
default, no ReID weights shipped) reduces it to OC-SORT + GMC flags.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.assignment import masked_assignment
from geotrax_tpu.track import base
from geotrax_tpu.track.base import (
    EMPTY,
    HIST,
    LOST,
    TENTATIVE,
    TRACKED,
    TrackerConfig,
    TrackerState,
)


def _velocity_direction(state: TrackerState, delta_t: int):
    """Per-track unit velocity direction from the observation ``delta_t``
    entries back to the newest observation (OCM reference direction)."""
    newest = state.obs_hist[:, HIST - 1, :2]
    lag = max(1, min(delta_t, HIST - 1))
    past = state.obs_hist[:, HIST - 1 - lag, :2]
    has_past = state.hist_frame[:, HIST - 1 - lag] > 0
    d = newest - past
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.where(norm > 1e-6, d / jnp.maximum(norm, 1e-6), 0.0)
    return direction, has_past & (norm[:, 0] > 1e-6)


def _ocm_cost(state: TrackerState, det_boxes, delta_t: int, inertia: float):
    """Angle-consistency cost between each track's historical motion
    direction and the direction toward each candidate detection."""
    direction, valid_dir = _velocity_direction(state, delta_t)
    to_det = det_boxes[None, :, :2] - state.obs_hist[:, None, HIST - 1, :2]
    norm = jnp.linalg.norm(to_det, axis=-1)
    to_det_unit = to_det / jnp.maximum(norm[..., None], 1e-6)
    cos = jnp.sum(direction[:, None, :] * to_det_unit, axis=-1)
    angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0))  # [0, pi]
    cost = inertia * (angle / jnp.pi)
    return jnp.where(valid_dir[:, None] & (norm > 1e-6), cost, 0.0)


def make_ocsort_step(params: dict, common: dict, deep: bool = False):
    delta_t = int(params.get("delta_t", 3))
    inertia = float(params.get("inertia", 0.2))
    use_byte = bool(params.get("use_byte", False))
    use_gmc = deep and params.get("gmc_method", "none") not in (None, "none", "None")
    reid = {}
    if deep:
        # Deep OC-SORT: EMA appearance embeddings with a confidence-adaptive
        # factor (reference cfg tracker.deepocsort.alpha_fixed_emb /
        # appearance_thresh / with_reid)
        reid = dict(
            with_reid=bool(params.get("with_reid", False)),
            proximity_thresh=float(params.get("proximity_thresh", 0.5)),
            appearance_thresh=float(params.get("appearance_thresh", 0.9)),
            emb_alpha=float(params.get("alpha_fixed_emb", 0.95)),
            adaptive_alpha=True,
        )
    cfg = TrackerConfig(kf_fmt="xyah", use_gmc=use_gmc, **common, **reid)

    @partial(jax.jit, static_argnames=("cfg_",))
    def step(state, det_boxes, det_scores, det_cls, det_valid, frame_id, cfg_,
             gmc_h=None, det_emb=None):
        state = base.predict_stage(state, cfg_, gmc_h)

        high = det_valid & (det_scores >= cfg_.track_high_thresh)
        low = det_valid & (det_scores > cfg_.track_low_thresh) & (
            det_scores < cfg_.track_high_thresh
        )

        # stage 1: tracked + lost vs high dets, IoU + OCM velocity cost
        pool = (state.status == TRACKED) | (state.status == LOST)
        was_lost = state.status == LOST
        iou_d = base._iou_cost(state, cfg_, det_boxes)
        cost = iou_d + _ocm_cost(state, det_boxes, delta_t, inertia)
        cost = base._fused(cost, det_scores, cfg_.fuse_score)
        if cfg_.with_reid and det_emb is not None:
            # appearance term: halved cosine distance, gated by the
            # appearance threshold and IoU proximity (Deep OC-SORT flavor of
            # the BoT-SORT fusion)
            emb_d = base._emb_distance(state.emb, base._l2_normalize(det_emb)) / 2.0
            emb_d = jnp.where(emb_d > cfg_.appearance_thresh, 1.0, emb_d)
            emb_d = jnp.where(iou_d > cfg_.proximity_thresh, 1.0, emb_d)
            cost = jnp.minimum(cost, emb_d)
        col1, m1 = masked_assignment(cost, pool, high, cfg_.match_thresh)

        # OCR: re-anchor re-found lost tracks on their last observation before
        # the measurement update, suppressing prediction drift accumulated
        # over the occlusion.
        refound = m1 & was_lost
        from geotrax_tpu.ops import kalman as kf

        re_meas = kf.measurement_from_xywh(state.obs_box, fmt=cfg_.kf_fmt)
        re_init = kf.initiate(re_meas, fmt=cfg_.kf_fmt)
        state = state._replace(
            kf_mean=jnp.where(refound[:, None], re_init.mean, state.kf_mean),
            kf_cov=jnp.where(refound[:, None, None], re_init.cov, state.kf_cov),
        )
        state = base._apply_matches(state, cfg_, det_boxes, det_scores, det_cls,
                                    col1, m1, frame_id, det_emb)
        det_used = jnp.zeros_like(det_valid).at[
            jnp.where(m1, col1, det_boxes.shape[0])
        ].set(True, mode="drop")

        # optional BYTE second pass on low-confidence dets
        if use_byte:
            r_tracked = (state.status == TRACKED) & ~m1 & (state.last_frame < frame_id)
            cost2 = base._iou_cost(state, cfg_, det_boxes)
            col2, m2 = masked_assignment(
                cost2, r_tracked, low & ~det_used, cfg_.second_match_thresh
            )
            state = base._apply_matches(
                state, cfg_, det_boxes, det_scores, det_cls, col2, m2, frame_id
            )
            det_used = det_used.at[jnp.where(m2, col2, det_boxes.shape[0])].set(
                True, mode="drop"
            )

        went_lost = (state.status == TRACKED) & (state.last_frame < frame_id)
        state = state._replace(status=jnp.where(went_lost, LOST, state.status))

        # tentative pass + spawning + pruning identical to the BYTE core
        unconfirmed = state.status == TENTATIVE
        cost3 = base._fused(
            base._iou_cost(state, cfg_, det_boxes), det_scores, cfg_.fuse_score
        )
        col3, m3 = masked_assignment(
            cost3, unconfirmed, high & ~det_used, cfg_.tentative_match_thresh
        )
        state = base._apply_matches(state, cfg_, det_boxes, det_scores, det_cls, col3, m3, frame_id)
        det_used = det_used.at[jnp.where(m3, col3, det_boxes.shape[0])].set(True, mode="drop")
        drop_tent = (state.status == TENTATIVE) & (state.last_frame < frame_id)
        state = state._replace(status=jnp.where(drop_tent, EMPTY, state.status))

        spawn = high & ~det_used & (det_scores >= cfg_.new_track_thresh)
        state = base._spawn_new(state, cfg_, det_boxes, det_scores, det_cls, spawn,
                                frame_id, det_emb)
        expired = (state.status == LOST) & (frame_id - state.last_frame > cfg_.track_buffer)
        state = state._replace(status=jnp.where(expired, EMPTY, state.status))

        active = (state.status == TRACKED) & (state.last_frame == frame_id)
        out = base.FrameOutput(
            track_id=state.track_id,
            box_xywh=base._track_boxes(state, cfg_),
            score=state.score,
            cls=state.cls,
            valid=active,
        )
        return state, out

    return cfg, step
