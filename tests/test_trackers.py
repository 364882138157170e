"""Tracker behavior tests on synthetic detection sequences: identity
persistence, BYTE low-confidence recovery, lost-track re-finding with the
track_buffer cap, new-ID creation after long gaps, scan/vmap composition,
and smoke coverage of all six tracker variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geotrax_tpu.track import make_tracker

MAX_DET = 8


def dets(boxes, scores=None, classes=None):
    """Pack a variable-length detection list into fixed MAX_DET slots."""
    n = len(boxes)
    b = np.zeros((MAX_DET, 4), np.float32)
    s = np.zeros((MAX_DET,), np.float32)
    c = np.full((MAX_DET,), -1, np.int32)
    v = np.zeros((MAX_DET,), bool)
    if n:
        b[:n] = boxes
        s[:n] = 0.9 if scores is None else scores
        c[:n] = 0 if classes is None else classes
        v[:n] = True
    return jnp.asarray(b), jnp.asarray(s), jnp.asarray(c), jnp.asarray(v)


def run_sequence(tracker_name, frames, params=None, max_tracks=32):
    base_params = {
        "track_high_thresh": 0.25, "track_low_thresh": 0.1, "new_track_thresh": 0.25,
        "track_buffer": 5, "match_thresh": 0.8, "fuse_score": True,
    }
    base_params.update(params or {})
    _, state, step = make_tracker(tracker_name, base_params, max_tracks=max_tracks)
    outputs = []
    for frame_id, frame in enumerate(frames, start=1):
        b, s, c, v = dets(**frame) if isinstance(frame, dict) else dets(frame)
        state, out = step(state, b, s, c, v, frame_id)
        valid = np.asarray(out.valid)
        outputs.append({
            "ids": np.asarray(out.track_id)[valid].tolist(),
            "boxes": np.asarray(out.box_xywh)[valid],
            "cls": np.asarray(out.cls)[valid].tolist(),
        })
    return outputs


def straight_line(n, start=(50.0, 50.0), v=(3.0, 0.0), wh=(20.0, 10.0)):
    return [[[start[0] + v[0] * t, start[1] + v[1] * t, wh[0], wh[1]]] for t in range(n)]


def test_single_object_keeps_id():
    out = run_sequence("bytetrack", straight_line(10))
    ids = [o["ids"] for o in out]
    assert all(len(i) == 1 for i in ids)
    assert len({i[0] for i in ids}) == 1  # one stable identity


def test_two_objects_distinct_ids():
    frames = [
        [[50.0 + 3 * t, 50.0, 20, 10], [200.0 - 3 * t, 150.0, 20, 10]]
        for t in range(10)
    ]
    out = run_sequence("bytetrack", frames)
    assert all(len(o["ids"]) == 2 for o in out)
    id_sets = {frozenset(o["ids"]) for o in out}
    assert len(id_sets) == 1  # both identities stable


def test_track_box_follows_motion():
    out = run_sequence("bytetrack", straight_line(12, v=(4.0, 2.0)))
    last = out[-1]["boxes"][0]
    # t=11 -> cx = 50 + 44
    assert abs(last[0] - (50 + 4 * 11)) < 3.0
    assert abs(last[1] - (50 + 2 * 11)) < 3.0


def test_low_confidence_recovery_second_stage():
    """An established track matched by a low-confidence detection (BYTE
    stage 2) keeps its identity instead of dying."""
    frames = []
    for t in range(10):
        conf = 0.15 if t in (5, 6) else 0.9  # dips below high thresh (0.25)
        frames.append({"boxes": [[50.0 + 3 * t, 50.0, 20, 10]], "scores": [conf]})
    out = run_sequence("bytetrack", frames)
    ids = [o["ids"] for o in out if o["ids"]]
    assert len({i[0] for i in ids}) == 1
    # frames 6,7 (1-indexed: low-conf) still tracked via the second stage
    assert all(len(o["ids"]) == 1 for o in out[:10])


def test_lost_track_refound_within_buffer():
    frames = straight_line(4) + [[]] * 3 + [
        [[50.0 + 3 * t, 50.0, 20, 10]] for t in range(7, 10)
    ]
    out = run_sequence("bytetrack", frames, params={"track_buffer": 5})
    first_id = out[0]["ids"][0]
    assert out[4]["ids"] == []  # gap
    refound = out[7]["ids"]
    assert refound and refound[0] == first_id  # same identity after occlusion


def test_long_gap_creates_new_id():
    frames = straight_line(3) + [[]] * 8 + [[[59.0, 50.0, 20, 10]]] * 3
    out = run_sequence("bytetrack", frames, params={"track_buffer": 4})
    first_id = out[0]["ids"][0]
    later = [o["ids"] for o in out[-2:] if o["ids"]]
    assert later and all(i[0] != first_id for i in later)


def test_new_track_threshold_respected():
    frames = [{"boxes": [[50.0, 50.0, 20, 10]], "scores": [0.3]} for _ in range(5)]
    out = run_sequence("bytetrack", frames, params={"new_track_thresh": 0.5})
    assert all(o["ids"] == [] for o in out)  # too weak to initialise


def test_class_propagation():
    frames = [{"boxes": [[50.0 + t, 50.0, 20, 10]], "classes": [2]} for t in range(5)]
    out = run_sequence("bytetrack", frames)
    assert out[-1]["cls"] == [2]


@pytest.mark.parametrize(
    "name", ["bytetrack", "botsort", "ocsort", "deepocsort", "fasttrack", "tracktrack"]
)
def test_all_trackers_smoke(name):
    params = {}
    if name == "tracktrack":
        params = {"track_high_thresh": 0.6, "track_low_thresh": 0.25,
                  "new_track_thresh": 0.7, "match_thresh": 0.7, "min_track_len": 3}
    frames = [
        [[50.0 + 3 * t, 50.0, 20, 10], [200.0 - 2 * t, 150.0, 24, 12]]
        for t in range(12)
    ]
    out = run_sequence(name, frames, params=params)
    assert len(out[-1]["ids"]) == 2
    id_sets = {frozenset(o["ids"]) for o in out[4:]}
    assert len(id_sets) == 1, f"{name}: identities unstable: {id_sets}"


def test_botsort_gmc_compensation():
    """With GMC, a camera pan (homography shift) doesn't break identity."""
    _, state, step = make_tracker(
        "botsort",
        {"track_high_thresh": 0.25, "track_low_thresh": 0.1, "new_track_thresh": 0.25,
         "track_buffer": 5, "match_thresh": 0.8, "fuse_score": True,
         "gmc_method": "sparseOptFlow"},
        max_tracks=16,
    )
    ids_seen = []
    shift = 0.0
    for frame_id in range(1, 9):
        if frame_id >= 4:
            shift += 15.0  # abrupt camera pan each frame
        b, s, c, v = dets([[100.0 + shift, 80.0, 20, 10]])
        h = jnp.eye(3).at[0, 2].set(15.0 if frame_id >= 4 else 0.0)
        state, out = step(state, b, s, c, v, frame_id, h)
        valid = np.asarray(out.valid)
        ids_seen.append(np.asarray(out.track_id)[valid].tolist())
    flat = [i[0] for i in ids_seen if i]
    assert len(set(flat)) == 1, f"identity broke under camera pan: {ids_seen}"


def test_botsort_gmc_rescales_box_size():
    """ultralytics multi_gmc applies the homography's linear part to (w,h)
    and their velocities too — after a zoom the predicted box must scale,
    or IoU costs collapse exactly when GMC matters."""
    from geotrax_tpu.track import base as tbase
    from geotrax_tpu.track.base import TrackerConfig

    cfg = TrackerConfig(
        kf_fmt="xywh", use_gmc=True,
        track_high_thresh=0.25, track_low_thresh=0.1, new_track_thresh=0.25,
        track_buffer=5, match_thresh=0.8, fuse_score=True, max_tracks=8,
    )
    state = tbase.init_state(cfg)
    b, s, c, v = dets([[100.0, 80.0, 40, 20]])
    state = tbase.byte_associate(state, cfg, b, s, c, v, jnp.int32(1))
    zoom = jnp.eye(3) * 1.2
    zoom = zoom.at[2, 2].set(1.0)
    state2 = tbase.predict_stage(state, cfg, zoom)
    slot = int(np.argmax(np.asarray(state.status) > 0))
    wh = np.asarray(state2.kf_mean)[slot, 2:4]
    np.testing.assert_allclose(wh, [40 * 1.2, 20 * 1.2], rtol=1e-5)


def test_fasttrack_occlusion_reappear_window_exceeds_buffer():
    """An occlusion-lost track must be re-findable inside occ_reappear_window
    even past track_buffer (the extended window is fasttrack's feature d)."""
    frames = []
    # two overlapping targets long enough to trip the occlusion counter
    for t in range(6):
        frames.append({"boxes": [[100.0, 80.0, 30, 16], [102.0, 81.0, 30, 16]]})
    # occluded target vanishes for 8 frames (> buffer 5, < reappear 12)
    for t in range(8):
        frames.append({"boxes": [[102.0, 81.0, 30, 16]]})
    frames.append({"boxes": [[100.0, 80.0, 30, 16], [102.0, 81.0, 30, 16]]})
    out = run_sequence(
        "fasttrack", frames,
        params={"occ_cover_thresh": 0.5, "active_occ_to_lost_thresh": 3,
                "occ_reappear_window": 12, "init_iou_suppress": 1.0},
    )
    early_ids = set(out[2]["ids"]) | set(out[3]["ids"])
    final_ids = set(out[-1]["ids"])
    # the reappearing box rebinds to a pre-occlusion identity, not a new one
    assert final_ids <= early_ids, f"{early_ids} vs {final_ids}"


def test_tracktrack_tentative_needs_high_confidence():
    """Leftover low-confidence dets (between low and high thresholds) must
    not confirm a TENTATIVE track — shared BYTE stage-3 semantics: only
    remaining HIGH dets may, else reflections promote one-hit tracks."""
    frames = [
        {"boxes": []},                                        # frame 1 empty
        {"boxes": [[60.0, 60.0, 20, 10]], "scores": [0.9]},   # spawns TENTATIVE
        {"boxes": [[62.0, 60.0, 20, 10]], "scores": [0.15]},  # low-conf only
    ]
    out = run_sequence("tracktrack", frames)
    # pre-fix the 0.15 det matched the tentative track in the stage-3 pass,
    # promoting it to TRACKED and emitting it; post-fix it is dropped
    assert out[-1]["ids"] == []


@pytest.mark.slow
def test_scan_over_frames_matches_python_loop():
    """The per-frame step scans (device-resident timeline) with identical
    results to the Python loop."""
    params = {"track_high_thresh": 0.25, "track_low_thresh": 0.1,
              "new_track_thresh": 0.25, "track_buffer": 5, "match_thresh": 0.8,
              "fuse_score": True}
    _, state0, step = make_tracker("bytetrack", params, max_tracks=16)

    n_frames = 8
    boxes = np.zeros((n_frames, MAX_DET, 4), np.float32)
    scores = np.zeros((n_frames, MAX_DET), np.float32)
    classes = np.full((n_frames, MAX_DET), -1, np.int32)
    valid = np.zeros((n_frames, MAX_DET), bool)
    for t in range(n_frames):
        boxes[t, 0] = [50 + 3 * t, 50, 20, 10]
        scores[t, 0] = 0.9
        classes[t, 0] = 0
        valid[t, 0] = True

    def scan_fn(state, inp):
        b, s, c, v, fid = inp
        state, out = step(state, b, s, c, v, fid)
        return state, out

    frames_ids = jnp.arange(1, n_frames + 1)
    _, scanned = jax.lax.scan(
        scan_fn, state0,
        (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
         jnp.asarray(valid), frames_ids),
    )

    state = state0
    for t in range(n_frames):
        state, out = step(state, jnp.asarray(boxes[t]), jnp.asarray(scores[t]),
                          jnp.asarray(classes[t]), jnp.asarray(valid[t]), t + 1)
        np.testing.assert_array_equal(np.asarray(scanned.valid[t]), np.asarray(out.valid))
        np.testing.assert_allclose(
            np.asarray(scanned.box_xywh[t]), np.asarray(out.box_xywh), atol=1e-4
        )
