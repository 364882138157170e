"""Slot-based multi-object tracking core (BYTE-style two-stage association).

The reference delegates tracking to the ultralytics trackers — per-track
Python objects with numpy Kalman filters and lapx assignment, selected by
cfg tracker.active (SURVEY.md §2.4). Here the whole tracker is a pure
function over a fixed array of track slots:

    state' , frame_outputs = step(state, detections, frame_id)

so it jits once, scans over frames (the video timeline is the sequential
carry), and vmaps over videos for batch mode. Dynamic track creation /
deletion becomes slot allocation with status codes:

    0 EMPTY    free slot
    1 TENTATIVE activated=False (seen once, awaiting confirmation)
    2 TRACKED  actively matched
    3 LOST     unmatched for <= track_buffer frames (recoverable)

The update follows the BYTE association schedule used by bytetrack/botsort
(ultralytics semantics): stage 1 high-confidence dets vs tracked+lost pool
(cost 1 - IoU, optionally fused with det score, gate match_thresh); stage 2
low-confidence dets vs still-unmatched *tracked* (gate 0.5, no fusion);
stage 3 remaining high dets vs tentative tracks (gate 0.7, fused); new
tracks from remaining high dets above new_track_thresh; lost tracks pruned
after track_buffer frames. Output boxes are the KF means (matching
ultralytics, which replaces result boxes with tracker state).

Tracker variants plug in via TrackerHooks: cost-matrix assembly, motion
prediction tweaks (velocity damping, GMC), and extra state columns.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from geotrax_tpu.ops import kalman
from geotrax_tpu.ops.assignment import masked_assignment
from geotrax_tpu.ops.boxes import iou_matrix, xywh_to_xyxy
from geotrax_tpu.ops.homography import apply_homography

EMPTY, TENTATIVE, TRACKED, LOST = 0, 1, 2, 3


class TrackerConfig(NamedTuple):
    """Static tracker parameters (hashable -> part of the jit cache key)."""
    track_high_thresh: float = 0.25
    track_low_thresh: float = 0.1
    new_track_thresh: float = 0.25
    track_buffer: int = 30
    match_thresh: float = 0.8
    fuse_score: bool = True
    second_match_thresh: float = 0.5
    tentative_match_thresh: float = 0.7
    kf_fmt: str = "xyah"          # 'xyah' (bytetrack lineage) | 'xywh' (botsort)
    use_gmc: bool = False         # apply camera-motion homography to predictions
    max_tracks: int = 256
    # ---- ReID appearance modeling (BoT-SORT / Deep OC-SORT / TrackTrack;
    # reference cfg tracker.botsort.with_reid/proximity_thresh/
    # appearance_thresh, deepocsort.alpha_fixed_emb)
    with_reid: bool = False
    proximity_thresh: float = 0.5
    appearance_thresh: float = 0.8
    emb_alpha: float = 0.9        # EMA factor for track embeddings
    adaptive_alpha: bool = False  # Deep OC-SORT confidence-adaptive EMA


EMB_DIM = 64  # appearance-embedding width (on-device patch projection)


HIST = 8  # observation-history ring length (covers delta_t <= 7)


class TrackerState(NamedTuple):
    kf_mean: jnp.ndarray      # (K, 8)
    kf_cov: jnp.ndarray       # (K, 4, 3) factored per-coordinate [p_xx,p_xv,p_vv]
    status: jnp.ndarray       # (K,) int32
    track_id: jnp.ndarray     # (K,) int32
    score: jnp.ndarray        # (K,)
    cls: jnp.ndarray          # (K,) int32
    last_frame: jnp.ndarray   # (K,) int32 frame of last match
    start_frame: jnp.ndarray  # (K,) int32
    hits: jnp.ndarray         # (K,) int32 number of matches
    next_id: jnp.ndarray      # () int32
    obs_box: jnp.ndarray      # (K, 4) last raw observation (xywh)
    obs_hist: jnp.ndarray     # (K, HIST, 4) observation ring, newest last
    hist_frame: jnp.ndarray   # (K, HIST) frame id per ring entry (0 = none)
    occ: jnp.ndarray          # (K,) int32 occlusion counter (fasttrack)
    emb: jnp.ndarray          # (K, EMB_DIM) EMA appearance embedding (L2-normed)


class FrameOutput(NamedTuple):
    """Fixed-size per-frame results; ``valid`` marks live entries."""
    track_id: jnp.ndarray   # (K,)
    box_xywh: jnp.ndarray   # (K, 4) KF-state box
    score: jnp.ndarray      # (K,)
    cls: jnp.ndarray        # (K,) int32
    valid: jnp.ndarray      # (K,) bool


def init_state(cfg: TrackerConfig) -> TrackerState:
    k = cfg.max_tracks
    return TrackerState(
        kf_mean=jnp.zeros((k, 8)),
        kf_cov=jnp.zeros((k, 4, kalman.COV_DIM)),
        status=jnp.zeros((k,), jnp.int32),
        track_id=jnp.zeros((k,), jnp.int32),
        score=jnp.zeros((k,)),
        cls=jnp.full((k,), -1, jnp.int32),
        last_frame=jnp.zeros((k,), jnp.int32),
        start_frame=jnp.zeros((k,), jnp.int32),
        hits=jnp.zeros((k,), jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
        obs_box=jnp.zeros((k, 4)),
        obs_hist=jnp.zeros((k, HIST, 4)),
        hist_frame=jnp.zeros((k, HIST), jnp.int32),
        occ=jnp.zeros((k,), jnp.int32),
        emb=jnp.zeros((k, EMB_DIM)),
    )


def _track_boxes(state: TrackerState, cfg: TrackerConfig) -> jnp.ndarray:
    return kalman.xywh_from_state(state.kf_mean, fmt=cfg.kf_fmt)


def _iou_cost(state, cfg, det_boxes):
    return 1.0 - iou_matrix(
        xywh_to_xyxy(_track_boxes(state, cfg)), xywh_to_xyxy(det_boxes)
    )


def _fused(cost, det_scores, enable: bool):
    if not enable:
        return cost
    return 1.0 - (1.0 - cost) * det_scores[None, :]


def _l2_normalize(v, axis=-1, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def _emb_distance(track_emb, det_emb):
    """Cosine distance (K,M) between L2-normalized embeddings — one MXU
    matmul (ultralytics matching.embedding_distance semantics)."""
    with jax.default_matmul_precision("highest"):
        return 1.0 - track_emb @ det_emb.T


def _ema_alpha(cfg: TrackerConfig, det_scores):
    """Per-detection EMA factor. BoT-SORT uses a fixed alpha; Deep OC-SORT
    scales it by detection confidence (alpha_fixed_emb + trust blending)."""
    if not cfg.adaptive_alpha:
        return jnp.full_like(det_scores, cfg.emb_alpha)
    trust = jnp.clip(
        (det_scores - cfg.track_high_thresh) / max(1.0 - cfg.track_high_thresh, 1e-6),
        0.0, 1.0,
    )
    return cfg.emb_alpha + (1.0 - cfg.emb_alpha) * (1.0 - trust)


def _apply_matches(state: TrackerState, cfg: TrackerConfig, det_boxes, det_scores,
                   det_cls, row_col, matched, frame_id, det_emb=None) -> TrackerState:
    """KF-update every matched slot with its assigned detection."""
    safe_col = jnp.clip(row_col, 0, det_boxes.shape[0] - 1)
    meas = kalman.measurement_from_xywh(det_boxes[safe_col], fmt=cfg.kf_fmt)
    upd = kalman.update(kalman.KFState(state.kf_mean, state.kf_cov), meas, fmt=cfg.kf_fmt)
    m = matched
    shifted_hist = jnp.concatenate(
        [state.obs_hist[:, 1:], det_boxes[safe_col][:, None, :]], axis=1
    )
    shifted_frames = jnp.concatenate(
        [state.hist_frame[:, 1:],
         jnp.full((state.hist_frame.shape[0], 1), frame_id, jnp.int32)], axis=1
    )
    new_emb = state.emb
    if cfg.with_reid and det_emb is not None:
        feat = _l2_normalize(det_emb[safe_col])
        alpha = _ema_alpha(cfg, det_scores[safe_col])[:, None]
        smooth = _l2_normalize(alpha * state.emb + (1.0 - alpha) * feat)
        new_emb = jnp.where(m[:, None], smooth, state.emb)
    return state._replace(
        emb=new_emb,
        kf_mean=jnp.where(m[:, None], upd.mean, state.kf_mean),
        kf_cov=jnp.where(m[:, None, None], upd.cov, state.kf_cov),
        status=jnp.where(m, TRACKED, state.status),
        score=jnp.where(m, det_scores[safe_col], state.score),
        cls=jnp.where(m, det_cls[safe_col], state.cls),
        last_frame=jnp.where(m, frame_id, state.last_frame),
        hits=jnp.where(m, state.hits + 1, state.hits),
        obs_box=jnp.where(m[:, None], det_boxes[safe_col], state.obs_box),
        obs_hist=jnp.where(m[:, None, None], shifted_hist, state.obs_hist),
        hist_frame=jnp.where(m[:, None], shifted_frames, state.hist_frame),
    )


def _spawn_new(state: TrackerState, cfg: TrackerConfig, det_boxes, det_scores,
               det_cls, spawn_mask, frame_id, det_emb=None) -> TrackerState:
    """Allocate empty slots for new tracks, preserving detection order for ID
    sequencing (matches ultralytics id assignment order).

    Slot-centric formulation: each empty slot computes its rank among empty
    slots and *gathers* the same-ranked spawning detection. One small int
    scatter builds the rank->detection table; every state field then updates
    with gathers + where — the scatter-per-field form cost ~2.2 ms/frame on
    TPU (dominated by a dozen scattered writes), this one is elementwise."""
    k = cfg.max_tracks
    m = det_boxes.shape[0]
    empty = state.status == EMPTY
    slot_rank = jnp.cumsum(empty) - 1                 # rank among empty slots
    spawn_rank = jnp.cumsum(spawn_mask) - 1           # rank among spawning dets
    num_spawn = jnp.sum(spawn_mask)

    # rank -> detection index table (the only scatter: (M,) int into (K,))
    det_of_rank = jnp.full((k,), m, jnp.int32).at[
        jnp.where(spawn_mask, spawn_rank, k)
    ].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
    recv = empty & (slot_rank < num_spawn)
    safe_det = jnp.clip(
        det_of_rank[jnp.clip(slot_rank, 0, k - 1)], 0, m - 1
    )  # (K,) detection feeding each receiving slot

    meas = kalman.measurement_from_xywh(det_boxes[safe_det], fmt=cfg.kf_fmt)
    init = kalman.initiate(meas, fmt=cfg.kf_fmt)
    new_ids = state.next_id + slot_rank.astype(jnp.int32)

    first_frame = frame_id == 1
    status_new = jnp.where(first_frame, TRACKED, TENTATIVE).astype(jnp.int32)
    boxes_new = det_boxes[safe_det]
    hist_new = jnp.concatenate(
        [jnp.zeros((k, HIST - 1, 4), boxes_new.dtype), boxes_new[:, None, :]], axis=1
    )
    hist_frame_new = jnp.concatenate(
        [jnp.zeros((k, HIST - 1), jnp.int32),
         jnp.full((k, 1), frame_id, jnp.int32)], axis=1
    )

    def pick(new, old):
        mask = recv.reshape(recv.shape + (1,) * (old.ndim - 1))
        return jnp.where(mask, new, old)

    emb_new = state.emb
    if cfg.with_reid and det_emb is not None:
        emb_new = pick(_l2_normalize(det_emb[safe_det]), state.emb)

    return state._replace(
        emb=emb_new,
        kf_mean=pick(init.mean, state.kf_mean),
        kf_cov=pick(init.cov, state.kf_cov),
        status=pick(jnp.full((k,), 1, jnp.int32) * status_new, state.status),
        track_id=pick(new_ids, state.track_id),
        score=pick(det_scores[safe_det], state.score),
        cls=pick(det_cls[safe_det], state.cls),
        last_frame=pick(jnp.full((k,), frame_id, jnp.int32), state.last_frame),
        start_frame=pick(jnp.full((k,), frame_id, jnp.int32), state.start_frame),
        hits=pick(jnp.ones((k,), jnp.int32), state.hits),
        obs_box=pick(boxes_new, state.obs_box),
        obs_hist=pick(hist_new, state.obs_hist),
        hist_frame=pick(hist_frame_new, state.hist_frame),
        occ=pick(jnp.zeros((k,), jnp.int32), state.occ),
        next_id=state.next_id + jnp.minimum(num_spawn, jnp.sum(empty)).astype(jnp.int32),
    )


def predict_stage(state: TrackerState, cfg: TrackerConfig,
                  gmc_h: Optional[jnp.ndarray]) -> TrackerState:
    """KF time update for all live tracks; non-tracked tracks get their size
    velocities zeroed (ultralytics multi_predict semantics); optional global
    motion compensation maps predicted positions through a homography."""
    live = state.status > EMPTY
    mean = state.kf_mean
    not_tracked = state.status != TRACKED
    if cfg.kf_fmt == "xyah":
        mean = mean.at[:, 7].set(jnp.where(not_tracked, 0.0, mean[:, 7]))
    else:
        mean = mean.at[:, 6].set(jnp.where(not_tracked, 0.0, mean[:, 6]))
        mean = mean.at[:, 7].set(jnp.where(not_tracked, 0.0, mean[:, 7]))
    pred = kalman.predict(kalman.KFState(mean, state.kf_cov), fmt=cfg.kf_fmt)
    new_mean = jnp.where(live[:, None], pred.mean, state.kf_mean)
    new_cov = jnp.where(live[:, None, None], pred.cov, state.kf_cov)

    if cfg.use_gmc and gmc_h is not None:
        # Transform track centers through the camera-motion homography; the
        # linear part also rotates/scales the velocity vector. For the xywh
        # filter, (w,h) and (vw,vh) get the linear part too — ultralytics
        # multi_gmc applies kron(eye(4), R) to the full 8-vector, so a zoom
        # rescales predicted box sizes (without this, a 20% altitude change
        # leaves every predicted box 20% wrong and IoU costs collapse in
        # exactly the high-camera-motion frames GMC exists for). The factored
        # per-coordinate covariance cannot represent R C R^T; for the
        # near-rigid BEV motions GMC sees the off-diagonal terms are
        # second-order and are deliberately dropped.
        centers = new_mean[:, :2]
        moved = apply_homography(gmc_h, centers[None, :, :])[0]
        lin = gmc_h[:2, :2]
        vel = new_mean[:, 4:6] @ lin.T
        new_mean = new_mean.at[:, :2].set(jnp.where(live[:, None], moved, centers))
        new_mean = new_mean.at[:, 4:6].set(jnp.where(live[:, None], vel, new_mean[:, 4:6]))
        if cfg.kf_fmt == "xywh":
            wh = new_mean[:, 2:4] @ lin.T
            vwh = new_mean[:, 6:8] @ lin.T
            new_mean = new_mean.at[:, 2:4].set(
                jnp.where(live[:, None], wh, new_mean[:, 2:4]))
            new_mean = new_mean.at[:, 6:8].set(
                jnp.where(live[:, None], vwh, new_mean[:, 6:8]))
    return state._replace(kf_mean=new_mean, kf_cov=new_cov)


def byte_associate(state: TrackerState, cfg: TrackerConfig, det_boxes, det_scores,
                   det_cls, det_valid, frame_id, det_emb=None):
    """The BYTE two-stage association schedule; returns the updated state."""
    high = det_valid & (det_scores >= cfg.track_high_thresh)
    low = det_valid & (det_scores > cfg.track_low_thresh) & (det_scores < cfg.track_high_thresh)

    # ---- stage 1: tracked + lost vs high-confidence detections
    pool = (state.status == TRACKED) | (state.status == LOST)
    iou_d = _iou_cost(state, cfg, det_boxes)
    cost1 = _fused(iou_d, det_scores, cfg.fuse_score)
    if cfg.with_reid and det_emb is not None:
        # BoT-SORT appearance fusion (ultralytics get_dists semantics):
        # halved cosine distance, gated by appearance and IoU proximity,
        # combined with the motion cost by elementwise min.
        emb_d = _emb_distance(state.emb, _l2_normalize(det_emb)) / 2.0
        emb_d = jnp.where(emb_d > cfg.appearance_thresh, 1.0, emb_d)
        emb_d = jnp.where(iou_d > cfg.proximity_thresh, 1.0, emb_d)
        cost1 = jnp.minimum(cost1, emb_d)
    col1, m1 = masked_assignment(cost1, pool, high, cfg.match_thresh)
    state = _apply_matches(state, cfg, det_boxes, det_scores, det_cls, col1, m1,
                           frame_id, det_emb)
    det_used = jnp.zeros_like(det_valid).at[jnp.where(m1, col1, det_boxes.shape[0])].set(
        True, mode="drop"
    )

    # ---- stage 2: still-unmatched TRACKED vs low-confidence detections
    r_tracked = (state.status == TRACKED) & ~m1 & (state.last_frame < frame_id)
    cost2 = _iou_cost(state, cfg, det_boxes)
    col2, m2 = masked_assignment(cost2, r_tracked, low & ~det_used, cfg.second_match_thresh)
    state = _apply_matches(state, cfg, det_boxes, det_scores, det_cls, col2, m2, frame_id)
    det_used = det_used.at[jnp.where(m2, col2, det_boxes.shape[0])].set(True, mode="drop")

    # tracked tracks that matched nothing this frame -> lost
    went_lost = (state.status == TRACKED) & (state.last_frame < frame_id)
    state = state._replace(status=jnp.where(went_lost, LOST, state.status))

    # ---- stage 3: tentative (unconfirmed) vs remaining high dets
    unconfirmed = state.status == TENTATIVE
    cost3 = _fused(_iou_cost(state, cfg, det_boxes), det_scores, cfg.fuse_score)
    col3, m3 = masked_assignment(cost3, unconfirmed, high & ~det_used, cfg.tentative_match_thresh)
    state = _apply_matches(state, cfg, det_boxes, det_scores, det_cls, col3, m3, frame_id)
    det_used = det_used.at[jnp.where(m3, col3, det_boxes.shape[0])].set(True, mode="drop")

    # unmatched tentative tracks are dropped
    drop_tentative = (state.status == TENTATIVE) & (state.last_frame < frame_id)
    state = state._replace(status=jnp.where(drop_tentative, EMPTY, state.status))

    # ---- new tracks from remaining high dets above the init threshold
    spawn = high & ~det_used & (det_scores >= cfg.new_track_thresh)
    state = _spawn_new(state, cfg, det_boxes, det_scores, det_cls, spawn, frame_id,
                       det_emb)

    # ---- prune expired lost tracks
    expired = (state.status == LOST) & (frame_id - state.last_frame > cfg.track_buffer)
    state = state._replace(status=jnp.where(expired, EMPTY, state.status))
    return state


@partial(jax.jit, static_argnames=("cfg",))
def byte_step(state: TrackerState, det_boxes, det_scores, det_cls, det_valid,
              frame_id, cfg: TrackerConfig, gmc_h=None, det_emb=None):
    """One tracker frame: predict -> associate -> emit active tracks."""
    state = predict_stage(state, cfg, gmc_h)
    state = byte_associate(state, cfg, det_boxes, det_scores, det_cls, det_valid,
                           frame_id, det_emb)
    active = (state.status == TRACKED) & (state.last_frame == frame_id)
    out = FrameOutput(
        track_id=state.track_id,
        box_xywh=_track_boxes(state, cfg),
        score=state.score,
        cls=state.cls,
        valid=active,
    )
    return state, out


def make_tracker(name: str, params: dict, max_tracks: int = 256):
    """Build (cfg, init_state, step_fn) for a named tracker from its config
    block (cfg tracker.<name>). Step signature:
        state, out = step(state, boxes, scores, cls, valid, frame_id, gmc_h)
    """
    name = name.lower()
    common = dict(
        track_high_thresh=float(params.get("track_high_thresh", 0.25)),
        track_low_thresh=float(params.get("track_low_thresh", 0.1)),
        new_track_thresh=float(params.get("new_track_thresh", 0.25)),
        track_buffer=int(params.get("track_buffer", 30)),
        match_thresh=float(params.get("match_thresh", 0.8)),
        fuse_score=bool(params.get("fuse_score", True)),
        max_tracks=max_tracks,
    )
    reid = dict(
        with_reid=bool(params.get("with_reid", False)),
        proximity_thresh=float(params.get("proximity_thresh", 0.5)),
        appearance_thresh=float(params.get("appearance_thresh", 0.8)),
    )
    if name == "bytetrack":
        cfg = TrackerConfig(kf_fmt="xyah", use_gmc=False, **common)
        step = byte_step
    elif name == "botsort":
        use_gmc = params.get("gmc_method", "sparseOptFlow") not in (None, "none", "None")
        cfg = TrackerConfig(kf_fmt="xywh", use_gmc=use_gmc, **common, **reid)
        step = byte_step
    elif name in ("ocsort", "deepocsort"):
        from geotrax_tpu.track.ocsort import make_ocsort_step

        cfg, step = make_ocsort_step(params, common, deep=(name == "deepocsort"))
    elif name == "fasttrack":
        from geotrax_tpu.track.fasttrack import make_fasttrack_step

        cfg, step = make_fasttrack_step(params, common)
    elif name == "tracktrack":
        from geotrax_tpu.track.tracktrack import make_tracktrack_step

        cfg, step = make_tracktrack_step(params, common)
    else:
        raise ValueError(f"Unknown tracker '{name}'")

    def step_fn(state, boxes, scores, cls, valid, frame_id, gmc_h=None, det_emb=None):
        return step(state, boxes, scores, cls, valid, frame_id, cfg, gmc_h, det_emb)

    return cfg, init_state(cfg), step_fn
