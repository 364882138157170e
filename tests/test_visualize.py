"""Visualization stage: oriented-box geometry, headings, clipping, column
dispatch (mirrors reference tests/test_visualize.py patterns) + an e2e
multi-mode render over a real small video."""

import argparse
import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from geotrax_tpu.pipeline import _visualize_impl as viz

logger = logging.getLogger("test-viz")


def make_args(**over):
    defaults = dict(
        source=None, cfg="default", output_folder=None, log_path=None, verbose=False,
        save=True, show=False, viz_mode=0, plot_trajectories=False, plot_delay=5,
        show_conf=False, show_lanes=False, show_class_names=False, hide_labels=False,
        hide_tracks=False, hide_speed=False, speed_unit="km/h", speed_deadzone=1,
        class_filter=[], tail_length=10, line_width=2, heading_smoothing=15,
        heading_min_speed=0.5, edge_clip_margin=3, edge_clip_smoothing=5,
        cut_frame_left=0, cut_frame_right=None, model=None, class_names=None,
    )
    defaults.update(over)
    return argparse.Namespace(**defaults)


CLASS_NAMES = {0: "car", 1: "bus", 2: "truck", 3: "motorcycle"}


def stab_tracks(rows):
    """14-column stabilized rows."""
    return pd.DataFrame(rows, columns=range(14))


def straight_track(track_id=1, n=30, v=(5.0, 0.0), dims=(60.0, 25.0)):
    rows = []
    for t in range(n):
        x, y = 500 + v[0] * t, 500 + v[1] * t
        rows.append([t, track_id, x, y, 60, 26, x, y, 60, 26, 0, 0.9, dims[0], dims[1]])
    return rows


# ---------------------------------------------------------------- headings
def test_heading_straight_right():
    tracks = stab_tracks(straight_track(v=(5.0, 0.0)))
    h = viz.compute_headings(tracks, 5, 0.5, logger)
    np.testing.assert_allclose(h.to_numpy(), 0.0, atol=1e-6)


def test_heading_diagonal():
    tracks = stab_tracks(straight_track(v=(3.0, 3.0)))
    h = viz.compute_headings(tracks, 5, 0.5, logger)
    np.testing.assert_allclose(h.to_numpy(), np.pi / 4, atol=1e-6)


def test_heading_stationary_aspect_fallback():
    rows = []
    for t in range(10):  # taller than wide -> vertical orientation
        rows.append([t, 1, 500, 500, 20, 60, 500, 500, 20, 60, 0, 0.9, 55, 18])
    h = viz.compute_headings(stab_tracks(rows), 5, 0.5, logger)
    np.testing.assert_allclose(h.to_numpy(), np.pi / 2, atol=1e-6)


def test_heading_held_through_slow_segment():
    rows = straight_track(n=15, v=(5.0, 0.0))
    for t in range(15, 25):  # stops
        x = rows[-1][2]
        rows.append([t, 1, x, 500, 60, 26, x, 500, 60, 26, 0, 0.9, 60, 25])
    h = viz.compute_headings(stab_tracks(rows), 3, 0.5, logger)
    np.testing.assert_allclose(h.to_numpy()[-1], 0.0, atol=1e-6)  # held


# ---------------------------------------------------------------- clipping
def test_sutherland_hodgman_square():
    poly = np.array([[0.0, 0.0], [10, 0], [10, 10], [0, 10]])
    clipped = viz.clip_poly_to_rect(poly, 2, 2, 8, 8)
    assert len(clipped) == 4
    np.testing.assert_allclose(clipped.min(0), [2, 2])
    np.testing.assert_allclose(clipped.max(0), [8, 8])


def test_sutherland_hodgman_outside():
    poly = np.array([[20.0, 20], [30, 20], [30, 30], [20, 30]])
    clipped = viz.clip_poly_to_rect(poly, 0, 0, 10, 10)
    assert len(clipped) == 0


def test_liang_barsky_segment():
    out = viz.clip_segment_to_rect([-5.0, 5.0], [15.0, 5.0], 0, 0, 10, 10)
    assert out is not None
    np.testing.assert_allclose(out[0], [0, 5])
    np.testing.assert_allclose(out[1], [10, 5])
    assert viz.clip_segment_to_rect([20.0, 20.0], [30.0, 30.0], 0, 0, 10, 10) is None


# ---------------------------------------------------------------- fallback dims
def test_q25_fallback_dims():
    rows = straight_track(n=20)
    df = stab_tracks(rows)
    df[12] = np.nan  # dimension estimator failed
    fl, fw = viz.estimate_fallback_dims(df)
    np.testing.assert_allclose(fl, 60.0)
    np.testing.assert_allclose(fw, 26.0)


# ---------------------------------------------------------------- readers
def test_read_tracks_mode0_from_14col(tmp_path):
    path = tmp_path / "t.txt"
    np.savetxt(path, np.array(straight_track(n=5)), fmt="%g", delimiter=",")
    args = make_args(viz_mode=0)
    tracks, plotting = viz.read_tracks(path, CLASS_NAMES, args, logger)
    # mode 0 keeps unstabilized cols: frame,id,x,y,w,h,class,conf
    assert tracks.shape[1] == 8
    assert plotting is not None and plotting.shape[1] == 4


def test_read_tracks_mode1_requires_stab(tmp_path):
    path = tmp_path / "t.txt"
    rows = [[t, 1, 100 + t, 100, 20, 10, 0, 0.9, 20, 10] for t in range(5)]
    np.savetxt(path, np.array(rows), fmt="%g", delimiter=",")
    args = make_args(viz_mode=1)
    with pytest.raises(SystemExit):
        viz.read_tracks(path, CLASS_NAMES, args, logger)


def test_read_tracks_15col_interpolated(tmp_path):
    path = tmp_path / "t.txt"
    rows = [r + [t % 2] for t, r in enumerate(straight_track(n=6))]
    np.savetxt(path, np.array(rows), fmt="%g", delimiter=",")
    tracks, _ = viz.read_tracks(path, CLASS_NAMES, make_args(viz_mode=0), logger)
    assert tracks.shape[1] == 9  # + is_interpolated
    assert tracks.iloc[:, 8].tolist() == [0, 1, 0, 1, 0, 1]


def test_read_tracks_oriented_layout(tmp_path, monkeypatch):
    path = tmp_path / "t.txt"
    np.savetxt(path, np.array(straight_track(n=20)), fmt="%g", delimiter=",")
    monkeypatch.setattr(viz, "get_video_dimensions", lambda s: (3840, 2160))
    args = make_args(viz_mode=3, source=Path("v.mp4"))
    oriented, plotting = viz.read_tracks(path, CLASS_NAMES, args, logger)
    assert oriented.shape[1] == 13
    np.testing.assert_allclose(oriented[4], 60.0)  # estimator length
    np.testing.assert_allclose(oriented[8], 0.0, atol=1e-6)  # heading +x
    assert not oriented[9].any()  # no fallback rows
    assert not oriented[12].any()  # nothing touches the border


def test_read_transforms_validation(tmp_path):
    path = tmp_path / "t_vid_transf.txt"
    rows = []
    for f in range(1, 4):
        h = np.eye(3).reshape(-1)
        rows.append(np.concatenate([[f], h]))
    np.savetxt(path, np.array(rows), fmt="%.16g", delimiter=",")
    transforms = viz.read_transforms(path, logger)
    assert set(transforms) == {1, 2, 3}

    bad = np.concatenate([[4], (-np.eye(3)).reshape(-1)])
    np.savetxt(path, np.array(rows + [bad]), fmt="%.16g", delimiter=",")
    with pytest.raises(SystemExit):
        viz.read_transforms(path, logger)


def test_read_georeferenced_timestamp_reconstruction(tmp_path):
    path = tmp_path / "g.csv"
    pd.DataFrame({
        "Vehicle_ID": [1, 1, 2],
        "Timestamp": ["10:00:00.1", "10:00:00.2", "10:00:00.1"],
        "Vehicle_Speed": [10.0, 11.0, 20.0],
        "Lane_Number": [1, 1, 2],
    }).to_csv(path, index=False)
    out = viz.read_georeferenced_results(path, Path("v.mp4"), logger)
    assert out is not None
    assert out[out.Vehicle_ID == 1].Frame_ID.tolist() == [0, 1]


# ---------------------------------------------------------------- e2e render
@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_end_to_end_render(tmp_path, mode):
    cv2 = pytest.importorskip("cv2")
    source = tmp_path / "V_clip.mp4"
    w, h, n = 320, 240, 12
    writer = cv2.VideoWriter(str(source), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        frame = np.full((h, w, 3), 60, np.uint8)
        frame[40:60, 30 + 5 * i:60 + 5 * i] = (200, 60, 60)
        writer.write(frame)
    writer.release()

    out_dir = tmp_path / "results"
    out_dir.mkdir()
    rows = []
    for t in range(n):
        x = 45 + 5.0 * t
        rows.append([t, 1, x, 50, 30, 20, x, 50, 30, 20, 0, 0.9, 30, 18])
    np.savetxt(out_dir / "V_clip.txt", np.array(rows), fmt="%g", delimiter=",")
    transf = [np.concatenate([[f], np.eye(3).reshape(-1)]) for f in range(1, n)]
    np.savetxt(out_dir / "V_clip_vid_transf.txt", np.array(transf), fmt="%.16g", delimiter=",")

    args = make_args(source=source, viz_mode=[mode], save=True, show=False,
                     class_names=["0=car", "1=bus", "2=truck", "3=motorcycle"])
    viz.run_visualization(args, logger)

    out_video = out_dir / f"V_clip_mode_{mode}.mp4"
    assert out_video.exists()
    cap = cv2.VideoCapture(str(out_video))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
    ok, frame = cap.read()
    cap.release()
    assert ok
    # annotation present: the frame differs from the plain input
    plain = np.full((h, w, 3), 60, np.uint8)
    plain[40:60, 30:60] = (200, 60, 60)
    assert (frame.astype(int) - plain.astype(int)).any()
