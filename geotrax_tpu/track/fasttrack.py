"""FastTracker: occlusion-aware ByteTrack on the slot-based core.

Capability parity with the reference's fasttrack block (SURVEY.md §2.4;
cfg tracker.fasttrack): detects occlusion onset by box-coverage analysis,
then (a) rolls the Kalman velocity/position back to pre-occlusion history,
(b) enlarges the search bbox once, (c) dampens motion while occluded,
(d) moves long-occluded tracks to lost with an extended re-find window, and
(e) suppresses new-track initialisation overlapping an active track
(init_iou_suppress).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.assignment import masked_assignment
from geotrax_tpu.ops.boxes import box_area, iou_matrix, xywh_to_xyxy
from geotrax_tpu.track import base
from geotrax_tpu.track.base import EMPTY, HIST, LOST, TENTATIVE, TRACKED, TrackerConfig


def _cover_fraction(boxes_xyxy):
    """(K,K) fraction of box i's area covered by box j."""
    lt = jnp.maximum(boxes_xyxy[:, None, :2], boxes_xyxy[None, :, :2])
    rb = jnp.minimum(boxes_xyxy[:, None, 2:], boxes_xyxy[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(box_area(boxes_xyxy)[:, None], 1e-6)


def make_fasttrack_step(params: dict, common: dict):
    reset_vel = int(params.get("reset_velocity_offset_occ", 5))
    reset_pos = int(params.get("reset_pos_offset_occ", 3))
    enlarge = float(params.get("enlarge_bbox_occ", 1.1))
    dampen = float(params.get("dampen_motion_occ", 0.5))
    occ_to_lost = int(params.get("active_occ_to_lost_thresh", 10))
    cover_thresh = float(params.get("occ_cover_thresh", 0.7))
    reappear = int(params.get("occ_reappear_window", 40))
    init_iou_suppress = float(params.get("init_iou_suppress", 0.7))
    cfg = TrackerConfig(kf_fmt="xyah", use_gmc=False, **common)

    @partial(jax.jit, static_argnames=("cfg_",))
    def step(state, det_boxes, det_scores, det_cls, det_valid, frame_id, cfg_,
             gmc_h=None, det_emb=None):
        # ---- occlusion onset analysis on current track boxes
        tboxes = xywh_to_xyxy(base._track_boxes(state, cfg_))
        live = state.status == TRACKED
        cover = _cover_fraction(tboxes)
        cover = jnp.where(
            live[:, None] & live[None, :] & ~jnp.eye(cover.shape[0], dtype=bool), cover, 0.0
        )
        occluded_now = live & (jnp.max(cover, axis=1) >= cover_thresh)
        newly_occluded = occluded_now & (state.occ == 0)
        # occ persists while LOST (it marks the loss as occlusion-caused, the
        # key for the extended reappear window below); it resets on re-match
        # (status back to TRACKED, not covered) or for never-occluded tracks
        occ = jnp.where(occluded_now, state.occ + 1,
                        jnp.where(state.status == LOST, state.occ, 0))

        # (a) KF rollback at occlusion onset: restore velocity from the
        # observation history, position from a shallower history point.
        hist_c = state.obs_hist[:, :, :2]
        v_lag = max(1, min(reset_vel, HIST - 1))
        p_lag = max(1, min(reset_pos, HIST - 1))
        vel_est = (hist_c[:, HIST - 1] - hist_c[:, HIST - 1 - v_lag]) / v_lag
        has_v = state.hist_frame[:, HIST - 1 - v_lag] > 0
        pos_roll = hist_c[:, HIST - 1 - p_lag]
        has_p = state.hist_frame[:, HIST - 1 - p_lag] > 0
        mean = state.kf_mean
        mean = mean.at[:, 4:6].set(
            jnp.where((newly_occluded & has_v)[:, None], vel_est, mean[:, 4:6])
        )
        mean = mean.at[:, :2].set(
            jnp.where((newly_occluded & has_p)[:, None], pos_roll, mean[:, :2])
        )
        # (b) one-shot bbox enlargement while entering occlusion (widen search)
        mean = mean.at[:, 3].set(jnp.where(newly_occluded, mean[:, 3] * enlarge, mean[:, 3]))
        # (c) dampen motion while occluded
        mean = mean.at[:, 4:6].set(
            jnp.where(occluded_now[:, None], mean[:, 4:6] * dampen, mean[:, 4:6])
        )
        state = state._replace(kf_mean=mean, occ=occ)

        # (d) long occlusion -> lost
        force_lost = live & (occ >= occ_to_lost)
        state = state._replace(status=jnp.where(force_lost, LOST, state.status))

        # ---- BYTE association schedule (shared core)
        state = base.predict_stage(state, cfg_, gmc_h)
        state = base.byte_associate(
            state, cfg_, det_boxes, det_scores, det_cls, det_valid, frame_id
        )

        # (e) suppress freshly spawned tracks overlapping an existing active
        # track beyond init_iou_suppress (1.0 disables).
        if init_iou_suppress < 1.0:
            fresh = (state.status == TRACKED) | (state.status == TENTATIVE)
            fresh = fresh & (state.start_frame == frame_id)
            older = ((state.status == TRACKED) | (state.status == LOST)) & (
                state.start_frame < frame_id
            )
            tb = xywh_to_xyxy(base._track_boxes(state, cfg_))
            iou = iou_matrix(tb, tb)
            iou = jnp.where(fresh[:, None] & older[None, :], iou, 0.0)
            kill = fresh & (jnp.max(iou, axis=1) >= init_iou_suppress)
            state = state._replace(status=jnp.where(kill, EMPTY, state.status))

        # extended reappear window for occlusion-lost tracks: byte_associate
        # just pruned every LOST track past track_buffer, including
        # occlusion-lost ones whose window should be `reappear`. Their slot
        # data is intact (spawn ran before the prune), so resurrect the ones
        # still inside the extended window; past it they stay EMPTY.
        extended_buffer = jnp.maximum(cfg_.track_buffer, reappear)
        age = frame_id - state.last_frame
        resurrect = (
            (state.status == EMPTY) & (state.occ > 0)
            & (age > cfg_.track_buffer) & (age <= extended_buffer)
        )
        state = state._replace(status=jnp.where(resurrect, LOST, state.status))

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
