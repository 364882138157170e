"""ReID appearance modeling: BoT-SORT / Deep OC-SORT / TrackTrack keep
identities through geometry-ambiguous crossings when with_reid is on
(reference cfg tracker.botsort.with_reid/proximity_thresh/appearance_thresh,
deepocsort.alpha_fixed_emb, tracktrack.reid_weight)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geotrax_tpu.track import make_tracker
from geotrax_tpu.track.base import EMB_DIM

M = 8


def _det(boxes, embs=None):
    b = np.zeros((M, 4), np.float32)
    v = np.zeros((M,), bool)
    n = len(boxes)
    b[:n] = boxes
    v[:n] = True
    s = np.where(v, 0.9, 0.0).astype(np.float32)
    c = np.zeros((M,), np.int32)
    e = None
    if embs is not None:
        e = np.zeros((M, EMB_DIM), np.float32)
        e[:n] = embs
        e = jnp.asarray(e)
    return jnp.asarray(b), jnp.asarray(s), jnp.asarray(c), jnp.asarray(v), e


E1 = np.eye(EMB_DIM, dtype=np.float32)[0]
E2 = np.eye(EMB_DIM, dtype=np.float32)[1]


def _crossing_scenario(tracker_name, params, use_emb):
    """Two targets whose detections land closer to each other's track at the
    swap frame; returns the id order across frames."""
    cfg, state, step = make_tracker(tracker_name, params, max_tracks=16)
    w = np.array([0.0, 0.0, 40.0, 40.0], np.float32)
    frames = [
        # (box_of_target1, box_of_target2)
        ([100.0, 100.0, 40, 40], [112.0, 100.0, 40, 40]),
        ([100.0, 100.0, 40, 40], [112.0, 100.0, 40, 40]),
        # swap frame: target1 jumps next to track2's position and vice versa
        ([109.0, 100.0, 40, 40], [103.0, 100.0, 40, 40]),
        ([109.0, 100.0, 40, 40], [103.0, 100.0, 40, 40]),
    ]
    ids_by_frame = []
    for t, (b1, b2) in enumerate(frames):
        embs = np.stack([E1, E2]) if use_emb else None
        b, s, c, v, e = _det(np.stack([b1, b2]), embs)
        state, out = step(state, b, s, c, v, t + 1, None, e)
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.box_xywh)[valid]
        ids = np.asarray(out.track_id)[valid]
        # report ids sorted by x position: (id at left, id at right)
        order = np.argsort(boxes[:, 0])
        ids_by_frame.append(tuple(ids[order]))
    return ids_by_frame


BOTSORT = {
    "track_high_thresh": 0.25, "track_low_thresh": 0.1, "new_track_thresh": 0.25,
    "track_buffer": 30, "match_thresh": 0.9, "fuse_score": False,
    "gmc_method": "none", "with_reid": True,
    "proximity_thresh": 0.7, "appearance_thresh": 0.8,
}


@pytest.mark.slow
def test_botsort_reid_keeps_ids_through_crossing():
    # geometry-only: at the swap frame the left box is target1's track id 1?
    # No: target1 moved right (109), target2 moved left (103). Geometry
    # assigns by nearest -> ids swap sides WITH the targets only if ReID wins.
    with_reid = _crossing_scenario("botsort", BOTSORT, use_emb=True)
    without = _crossing_scenario(
        "botsort", {**BOTSORT, "with_reid": False}, use_emb=False
    )
    # before the swap: id1 left, id2 right in both
    assert with_reid[1] == (1, 2) and without[1] == (1, 2)
    # after: appearance keeps id1 on target1 (now the RIGHT box at 109)
    assert with_reid[3] == (2, 1)
    # geometry-only binds by proximity: id1 stays left -> (1, 2)
    assert without[3] == (1, 2)


@pytest.mark.slow
def test_deepocsort_reid_keeps_ids_through_crossing():
    params = {
        "track_high_thresh": 0.25, "track_low_thresh": 0.1,
        "new_track_thresh": 0.25, "track_buffer": 30, "match_thresh": 0.9,
        "fuse_score": False, "delta_t": 3, "inertia": 0.0, "use_byte": False,
        "gmc_method": "none", "with_reid": True, "proximity_thresh": 0.7,
        "appearance_thresh": 0.9, "alpha_fixed_emb": 0.95,
    }
    with_reid = _crossing_scenario("deepocsort", params, use_emb=True)
    without = _crossing_scenario(
        "deepocsort", {**params, "with_reid": False}, use_emb=False
    )
    assert with_reid[3] == (2, 1)
    assert without[3] == (1, 2)


@pytest.mark.slow
def test_tracktrack_reid_cost_is_active():
    params = {
        "track_high_thresh": 0.25, "track_low_thresh": 0.1,
        "new_track_thresh": 0.25, "track_buffer": 30, "match_thresh": 0.9,
        "fuse_score": False, "iou_weight": 0.5, "reid_weight": 0.5,
        "conf_weight": 0.0, "angle_weight": 0.0, "penalty_p": 0.0,
        "penalty_q": 0.0, "reduce_step": 0.05, "tai_thr": 0.55,
        "min_track_len": 1, "lost_match_thr": 0.0, "gmc_method": "none",
        "with_reid": True,
    }
    with_reid = _crossing_scenario("tracktrack", params, use_emb=True)
    without = _crossing_scenario(
        "tracktrack", {**params, "with_reid": False}, use_emb=False
    )
    assert with_reid[3] == (2, 1)
    assert without[3] == (1, 2)


def test_embedding_ema_follows_appearance_changes():
    """EMA track embeddings converge toward a changed appearance."""
    cfg, state, step = make_tracker("botsort", BOTSORT, max_tracks=16)
    b, s, c, v, e = _det(np.array([[100.0, 100.0, 40, 40]]), np.stack([E1]))
    state, _ = step(state, b, s, c, v, 1, None, e)
    first = np.asarray(state.emb[0]).copy()
    np.testing.assert_allclose(first, E1, atol=1e-6)
    for t in range(2, 30):
        b, s, c, v, e = _det(np.array([[100.0, 100.0, 40, 40]]), np.stack([E2]))
        state, _ = step(state, b, s, c, v, t, None, e)
    final = np.asarray(state.emb[0])
    assert final @ E2 > 0.95  # converged to the new appearance
    assert abs(np.linalg.norm(final) - 1.0) < 1e-5


def test_embed_boxes_separates_colors():
    """The on-device patch embedding distinguishes differently-colored
    targets and matches identical ones."""
    from geotrax_tpu.pipeline.device_pipeline import embed_boxes

    frames = np.full((2, 96, 128, 3), 40, np.uint8)
    # frame 0: red box at (40,48), blue at (88,48); frame 1: same swapped x
    frames[0, 32:64, 24:56] = (200, 30, 30)
    frames[0, 32:64, 72:104] = (30, 30, 200)
    frames[1, 32:64, 72:104] = (200, 30, 30)
    frames[1, 32:64, 24:56] = (30, 30, 200)
    boxes = np.array([
        [[40.0, 48.0, 32, 32], [88.0, 48.0, 32, 32]],
        [[88.0, 48.0, 32, 32], [40.0, 48.0, 32, 32]],
    ], np.float32)
    emb = np.asarray(embed_boxes(jnp.asarray(frames), jnp.asarray(boxes)))
    red0, blue0 = emb[0, 0], emb[0, 1]
    red1, blue1 = emb[1, 0], emb[1, 1]
    assert red0 @ red1 > 0.99 and blue0 @ blue1 > 0.99
    assert red0 @ blue0 < red0 @ red1 - 0.05
