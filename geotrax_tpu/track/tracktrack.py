"""TrackTrack: multi-cue cost + iterative assignment on the slot-based core.

Capability parity with the reference's tracktrack block (SURVEY.md §2.4;
cfg tracker.tracktrack): the association cost combines Height-Modulated IoU,
an appearance term (HMIoU fallback when ReID is off — the pipeline default),
a confidence-distance term and a corner-angle term with configurable
weights; penalties p/q raise the cost of low-confidence and recovered
detections; assignment iterates from a tight gate that relaxes by
``reduce_step`` per round so confident pairs bind first; track-aware
initialisation (TAI)
suppresses new tracks overlapping surviving detections above ``tai_thr``;
tracks confirm only after ``min_track_len`` hits; still-lost tracks get a
relaxed second chance when ``lost_match_thr`` > 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.assignment import masked_assignment
from geotrax_tpu.ops.boxes import hmiou_matrix, iou_matrix, xywh_to_xyxy
from geotrax_tpu.track import base
from geotrax_tpu.track.base import EMPTY, LOST, TENTATIVE, TRACKED, TrackerConfig


def _corner_angle_cost(track_boxes_xywh, det_boxes_xywh):
    """Angle between the track->det displacement and the track's box diagonal
    orientation — a cheap geometric cue penalising implausible jumps."""
    d = det_boxes_xywh[None, :, :2] - track_boxes_xywh[:, None, :2]
    disp_angle = jnp.arctan2(d[..., 1], d[..., 0])
    diag_angle = jnp.arctan2(track_boxes_xywh[:, 3], track_boxes_xywh[:, 2])[:, None]
    diff = jnp.abs(jnp.mod(disp_angle - diag_angle + jnp.pi, 2 * jnp.pi) - jnp.pi)
    moved = jnp.linalg.norm(d, axis=-1) > 1.0
    return jnp.where(moved, diff / jnp.pi, 0.0)


def make_tracktrack_step(params: dict, common: dict):
    iou_w = float(params.get("iou_weight", 0.5))
    reid_w = float(params.get("reid_weight", 0.5))
    conf_w = float(params.get("conf_weight", 0.1))
    angle_w = float(params.get("angle_weight", 0.05))
    penalty_p = float(params.get("penalty_p", 0.2))
    penalty_q = float(params.get("penalty_q", 0.4))
    reduce_step = float(params.get("reduce_step", 0.05))
    tai_thr = float(params.get("tai_thr", 0.55))
    min_track_len = int(params.get("min_track_len", 3))
    lost_match_thr = float(params.get("lost_match_thr", 0.0))
    use_gmc = params.get("gmc_method", "sparseOptFlow") not in (None, "none", "None")
    cfg = TrackerConfig(
        kf_fmt="xywh", use_gmc=use_gmc,
        with_reid=bool(params.get("with_reid", False)),
        proximity_thresh=float(params.get("proximity_thresh", 0.5)),
        appearance_thresh=float(params.get("appearance_thresh", 0.8)),
        **common,
    )
    num_rounds = max(1, int(round(cfg.match_thresh / max(reduce_step, 1e-3))) // 4)
    num_rounds = min(num_rounds, 4)

    def multi_cue_cost(state, cfg_, det_boxes, det_scores, det_emb=None):
        tb = xywh_to_xyxy(base._track_boxes(state, cfg_))
        db = xywh_to_xyxy(det_boxes)
        hm = 1.0 - hmiou_matrix(tb, db)
        if cfg_.with_reid and det_emb is not None:
            # the reference's default 0.5-weight ReID term (cfg
            # tracker.tracktrack.reid_weight): cosine distance of the
            # on-device appearance embeddings
            appearance = base._emb_distance(state.emb, base._l2_normalize(det_emb))
        else:
            appearance = hm  # ReID off: HMIoU fallback
        conf_dist = jnp.abs(state.score[:, None] - det_scores[None, :])
        angle = _corner_angle_cost(base._track_boxes(state, cfg_), det_boxes)
        cost = iou_w * hm + reid_w * appearance + conf_w * conf_dist + angle_w * angle
        total_w = iou_w + reid_w + conf_w + angle_w
        cost = cost / max(total_w, 1e-6)
        # penalties: low-confidence detections (p), recovered/lost rebinds (q)
        low_det = det_scores[None, :] < cfg_.track_high_thresh
        lost_track = (state.status == LOST)[:, None]
        return cost + penalty_p * low_det + penalty_q * lost_track

    @partial(jax.jit, static_argnames=("cfg_",))
    def step(state, det_boxes, det_scores, det_cls, det_valid, frame_id, cfg_,
             gmc_h=None, det_emb=None):
        state = base.predict_stage(state, cfg_, gmc_h)

        considered = det_valid & (det_scores > cfg_.track_low_thresh)
        pool = (state.status == TRACKED) | (state.status == LOST)

        # Iterative assignment, confident pairs first: round 0 runs at the
        # TIGHTEST gate (match_thresh - (num_rounds-1)*reduce_step) so
        # low-cost pairs bind before a marginal pair can steal a detection;
        # each later round relaxes the gate by reduce_step for the leftovers,
        # ending at match_thresh. (Starting loose and shrinking would make
        # rounds 2+ no-ops: anything feasible at a stricter gate was already
        # feasible at the looser one.)
        det_used = jnp.zeros_like(det_valid)
        track_done = jnp.zeros_like(pool)
        for r in range(num_rounds):
            gate = cfg_.match_thresh - (num_rounds - 1 - r) * reduce_step
            cost = multi_cue_cost(state, cfg_, det_boxes, det_scores, det_emb)
            col, m = masked_assignment(
                cost, pool & ~track_done, considered & ~det_used, gate
            )
            state = base._apply_matches(
                state, cfg_, det_boxes, det_scores, det_cls, col, m, frame_id, det_emb
            )
            det_used = det_used.at[jnp.where(m, col, det_boxes.shape[0])].set(True, mode="drop")
            track_done = track_done | m

        # relaxed rebind for still-lost tracks
        if lost_match_thr > 0.0:
            still_lost = (state.status == LOST) & ~track_done
            cost = multi_cue_cost(state, cfg_, det_boxes, det_scores, det_emb)
            col, m = masked_assignment(cost, still_lost, considered & ~det_used, lost_match_thr)
            state = base._apply_matches(
                state, cfg_, det_boxes, det_scores, det_cls, col, m, frame_id, det_emb
            )
            det_used = det_used.at[jnp.where(m, col, det_boxes.shape[0])].set(True, mode="drop")

        went_lost = (state.status == TRACKED) & (state.last_frame < frame_id)
        state = state._replace(status=jnp.where(went_lost, LOST, state.status))

        # tentative pass (shared semantics: only remaining HIGH-confidence
        # dets may confirm an unconfirmed track, like base.byte_associate —
        # letting 0.1-0.25-score leftovers promote one-hit tracks would put
        # reflections/partial duplicates into the output)
        high = det_valid & (det_scores >= cfg_.track_high_thresh)
        unconfirmed = state.status == TENTATIVE
        cost3 = base._iou_cost(state, cfg_, det_boxes)
        col3, m3 = masked_assignment(
            cost3, unconfirmed, high & ~det_used, cfg_.tentative_match_thresh
        )
        state = base._apply_matches(state, cfg_, det_boxes, det_scores, det_cls, col3, m3, frame_id)
        det_used = det_used.at[jnp.where(m3, col3, det_boxes.shape[0])].set(True, mode="drop")
        drop_tent = (state.status == TENTATIVE) & (state.last_frame < frame_id)
        state = state._replace(status=jnp.where(drop_tent, EMPTY, state.status))

        # TAI: candidate new dets suppressed by NMS against *used* detections
        cand = considered & ~det_used & (det_scores >= cfg_.new_track_thresh)
        db = xywh_to_xyxy(det_boxes)
        overlap = iou_matrix(db, db)
        vs_used = jnp.where(cand[:, None] & det_used[None, :], overlap, 0.0)
        cand = cand & (jnp.max(vs_used, axis=1) < tai_thr)
        state = base._spawn_new(state, cfg_, det_boxes, det_scores, det_cls, cand,
                                frame_id, det_emb)

        expired = (state.status == LOST) & (frame_id - state.last_frame > cfg_.track_buffer)
        state = state._replace(status=jnp.where(expired, EMPTY, state.status))

        # confirmation requires min_track_len hits
        confirmed = state.hits >= min_track_len
        active = (state.status == TRACKED) & (state.last_frame == frame_id) & (
            confirmed | (frame_id <= min_track_len)
        )
        out = base.FrameOutput(
            track_id=state.track_id,
            box_xywh=base._track_boxes(state, cfg_),
            score=state.score,
            cls=state.cls,
            valid=active,
        )
        return state, out

    return cfg, step
