"""DJI SRT flight-log machinery: parse/serialize round trip, telemetry
extraction across DJI bracket layouts, merge timestamp/counter continuity,
and the metadata-filter/master-frame tool hooks."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import dji_srt  # noqa: E402

MAVIC3_BLOCK = """1
00:00:00,000 --> 00:00:00,033
<font size="28">FrameCnt: 1, DiffTime: 33ms
2023-10-04 09:12:58.123
[iso: 100] [shutter: 1/1000.0] [fnum: 2.8] [ev: 0] [color_md : default] [focal_len: 24.00] [latitude: 37.382276] [longitude: 126.656415] [rel_alt: 148.800 abs_alt: 163.123] </font>
"""

PHANTOM_BLOCK = """2
00:00:00,033 --> 00:00:00,066
<font size="28">SrtCnt : 2, DiffTime : 33ms
2023-10-04 09:12:58.156
[iso : 110, shutter : 1/800.0, fnum : 280] [latitude: 37.382279] [longtitude: 126.656418] [altitude: 148.900] </font>
"""


def test_parse_and_roundtrip():
    blocks = dji_srt.parse_srt(MAVIC3_BLOCK + "\n" + PHANTOM_BLOCK)
    assert len(blocks) == 2
    assert blocks[0].start_ms == 0 and blocks[0].end_ms == 33
    assert blocks[0].frame_count == 1
    assert blocks[1].frame_count == 2
    text = dji_srt.format_srt(blocks)
    again = dji_srt.parse_srt(text)
    assert [b.body for b in again] == [b.body for b in blocks]
    assert [(b.start_ms, b.end_ms) for b in again] == [
        (b.start_ms, b.end_ms) for b in blocks
    ]


def test_telemetry_across_layouts():
    b1, b2 = dji_srt.parse_srt(MAVIC3_BLOCK + "\n" + PHANTOM_BLOCK)
    t1 = b1.telemetry()
    assert t1["latitude"] == pytest.approx(37.382276)
    assert t1["longitude"] == pytest.approx(126.656415)
    assert t1["rel_alt"] == pytest.approx(148.8)
    assert t1["abs_alt"] == pytest.approx(163.123)
    assert t1["iso"] == 100
    t2 = b2.telemetry()  # comma layout + longtitude/altitude aliases
    assert t2["longitude"] == pytest.approx(126.656418)
    assert t2["rel_alt"] == pytest.approx(148.9)


def test_merge_blocks_continuity():
    part = dji_srt.parse_srt(MAVIC3_BLOCK + "\n" + PHANTOM_BLOCK)
    merged = dji_srt.merge_blocks([part, part])
    assert len(merged) == 4
    # timestamps continue from the first part's end
    assert merged[2].start_ms == part[-1].end_ms
    # frame counters continue from the first part's last counter
    assert merged[2].frame_count == 3
    assert merged[3].frame_count == 4


def test_srt_dataframe_and_write(tmp_path):
    blocks = dji_srt.parse_srt(MAVIC3_BLOCK + "\n" + PHANTOM_BLOCK)
    df = dji_srt.srt_dataframe(blocks)
    assert list(df["frame"]) == [0, 1]
    assert df["latitude"].iloc[0] == pytest.approx(37.382276)
    p = tmp_path / "log.srt"
    dji_srt.write_srt(p, blocks)
    assert dji_srt.read_srt(p)[1].telemetry()["rel_alt"] == pytest.approx(148.9)


def test_companion_srt_base_stem(tmp_path):
    (tmp_path / "DJI_0212.SRT").write_text(MAVIC3_BLOCK)
    video = tmp_path / "DJI_0212_trimmed.mp4"
    video.touch()
    assert dji_srt.companion_srt(video).name == "DJI_0212.SRT"


def test_nearest_location():
    from cut_merged_videos_and_logs import nearest_location

    locations = {"U": (37.3823, 126.6564), "K": (37.3900, 126.6600)}
    assert nearest_location(locations, 37.38228, 126.65642) == "U"
    assert nearest_location(locations, 37.3899, 126.6601) == "K"


def test_master_frame_detection_coverage(tmp_path):
    """Coverage criterion: among hover-stable frames, the one with the most
    detections in the stage-1 tracks wins (reference
    find_best_master_frames, tools/find_master_frames.py:276)."""
    from find_master_frames import detections_per_frame

    rows = []
    for f, n in [(3, 2), (5, 7), (9, 1)]:
        for k in range(n):
            rows.append([f, k + 1, 10, 10, 5, 5, 0, 0.9])
    np.savetxt(tmp_path / "v.txt", np.asarray(rows, float), delimiter=",")
    cov = detections_per_frame(tmp_path / "v.txt")
    assert cov == {3: 2, 5: 7, 9: 1}


def test_cut_tool_auto_with_srt_and_locations(tmp_path):
    """End-to-end cut: merged video + DJI SRT -> GPS hover segmentation,
    nearest-location labeling, keyframe snapping, per-cut CSV logs."""
    cv2 = pytest.importorskip("cv2")
    import subprocess
    import sys
    import json

    n, w, h = 40, 128, 96
    video = tmp_path / "merged.mp4"
    rng = np.random.default_rng(0)
    base = np.kron(rng.integers(0, 255, (12, 16, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    wr = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for t in range(n):
        wr.write(base[:h, :w])
    wr.release()

    # SRT: hover at U (frames 0..17), transit, hover at K (frames 25..39)
    blocks = []
    for t in range(n):
        if t < 18:
            lat, lon = 37.3823, 126.6564
        elif t < 25:
            lat = 37.3823 + (t - 17) * 0.001
            lon = 126.6564 + (t - 17) * 0.0005
        else:
            lat, lon = 37.3900, 126.6600
        t0_ms, t1_ms = t * 33, (t + 1) * 33
        blocks.append(
            f"{t+1}\n{dji_srt.ms_to_timestamp(t0_ms)} --> {dji_srt.ms_to_timestamp(t1_ms)}\n"
            f"FrameCnt: {t+1}, DiffTime: 33ms\n"
            f"[latitude: {lat:.6f}] [longitude: {lon:.6f}] [rel_alt: 148.0 abs_alt: 160.0]\n"
        )
    (tmp_path / "merged.srt").write_text("\n".join(blocks))
    (tmp_path / "loc.json").write_text(json.dumps(
        {"U": [37.3823, 126.6564], "K": [37.3900, 126.6600]}
    ))

    tools = Path(__file__).resolve().parents[1] / "tools"
    result = subprocess.run(
        [sys.executable, str(tools / "cut_merged_videos_and_logs.py"), str(video),
         "--auto", "--min-hover-frames", "10", "--locations", str(tmp_path / "loc.json"),
         "--snap-keyframes", "--out", str(tmp_path / "clips")],
        capture_output=True, text=True, timeout=300,
    )
    assert result.returncode == 0, result.stderr
    clips = sorted(p.name for p in (tmp_path / "clips").glob("*.mp4"))
    assert any(c.startswith("U_") for c in clips), (clips, result.stdout)
    assert any(c.startswith("K_") for c in clips), (clips, result.stdout)
    # per-cut CSV flight logs rebased to clip-local frames
    csvs = sorted((tmp_path / "clips").glob("*.csv"))
    assert csvs
    import pandas as pd

    df = pd.read_csv(csvs[0])
    assert df["frame"].iloc[0] == 0
    assert {"latitude", "longitude"} <= set(df.columns)


def test_flight_log_normalizes_vendor_csv(tmp_path):
    """A vendor per-part CSV ('lat'/'altitude'/'FrameCnt') resolves and is
    normalized to canonical columns, so --min-alt filters apply to it."""
    import pandas as pd

    video = tmp_path / "clip.mp4"
    video.touch()
    pd.DataFrame(
        {"FrameCnt": [0, 1], "lat": [37.38, 37.39],
         "longtitude": [126.65, 126.66], "altitude": [148.8, 10.0]}
    ).to_csv(video.with_suffix(".csv"), index=False)
    df = dji_srt.flight_log(video)
    assert df is not None
    for col in ("frame", "latitude", "longitude", "rel_alt"):
        assert col in df.columns
    assert df["rel_alt"].iloc[1] == pytest.approx(10.0)


def test_flight_log_unusable_srt_falls_back_to_csv(tmp_path):
    """A corrupt/empty .srt next to a valid cut-tool .csv must not exclude
    the video: usability (not mere existence) gates the fallback."""
    import pandas as pd

    video = tmp_path / "clip.mp4"
    video.touch()
    video.with_suffix(".srt").write_text("")  # zero-usable SRT
    pd.DataFrame({"frame": [0, 1], "rel_alt": [148.8, 148.9]}).to_csv(
        video.with_suffix(".csv"), index=False
    )
    df = dji_srt.flight_log(video, prefer="srt")
    assert df is not None and list(df["frame"]) == [0, 1]
    assert dji_srt.flight_log(tmp_path / "nothing.mp4") is None


def test_flight_log_prefer_csv(tmp_path):
    """prefer='csv' (cut tool) takes the rebased .csv over the raw .srt."""
    import pandas as pd

    video = tmp_path / "clip.mp4"
    video.touch()
    video.with_suffix(".srt").write_text(MAVIC3_BLOCK)
    pd.DataFrame({"frame": [7], "rel_alt": [99.0]}).to_csv(
        video.with_suffix(".csv"), index=False
    )
    df = dji_srt.flight_log(video, prefer="csv")
    assert list(df["frame"]) == [7]
    df2 = dji_srt.flight_log(video, prefer="srt")
    assert list(df2["frame"]) == [0]


def test_cut_tool_session_mode(tmp_path):
    """Reference-parity session mode (reference cut_merged_videos_and_logs):
    data_dir scan -> <stem>.txt cuts plan -> keyframe-adjusted starts saved
    to <stem>_adjusted.txt -> per-cut 13-col CSV from the merged SRT ->
    GPS-labeled <LABEL><n>.mp4 clips stream-copied from the merged video."""
    import json
    import subprocess
    import sys

    from geotrax_tpu.io.native import load_encoder_library
    from geotrax_tpu.io.video import VideoReader, VideoWriter, keyframe_indices

    if load_encoder_library() is None:
        pytest.skip("native encoder unavailable")

    n, w, h = 70, 128, 96
    session = tmp_path / "2022-10-04" / "D1"
    session.mkdir(parents=True)
    video = session / "merged.mp4"
    rng = np.random.default_rng(0)
    base = np.kron(rng.integers(0, 255, (12, 16, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    wr = VideoWriter(video, 30.0, w, h, fourcc="mp4v")
    for t in range(n):
        f = base[:h, :w].copy()
        f[10:20, (t * 2) % (w - 12):][:, :10] = (255, 0, 0)
        wr.write(f)
    wr.close()

    # cuts plan (1-indexed, end exclusive; -1 = end of video); starts NOT on
    # keyframes so the forward adjustment is exercised
    (session / "merged.txt").write_text("3,31\n32,-1\n")

    blocks = []
    for t in range(n):
        lat, lon = (37.3823, 126.6564) if t < 31 else (37.3900, 126.6600)
        t0_ms, t1_ms = t * 33, (t + 1) * 33
        blocks.append(
            f"{t+1}\n{dji_srt.ms_to_timestamp(t0_ms)} --> {dji_srt.ms_to_timestamp(t1_ms)}\n"
            f"FrameCnt: {t+1}, DiffTime: 33ms\n"
            f"2022-10-04 17:52:{t//30:02d}.{(t%30)*33:03d}\n"
            f"[iso : 100] [shutter : 1/1000] [fnum : 2.8] [ev : 0] [ct : 5500] "
            f"[color_md : default] [focal_len : 280]\n"
            f"[latitude: {lat:.6f}] [longitude: {lon:.6f}] [rel_alt: 148.0 abs_alt: 160.0]\n"
        )
    (session / "merged.srt").write_text("\n".join(blocks))
    loc_json = tmp_path / "loc.json"
    loc_json.write_text(json.dumps({"U": [37.3823, 126.6564], "K": [37.3900, 126.6600]}))

    tools = Path(__file__).resolve().parents[1] / "tools"
    result = subprocess.run(
        [sys.executable, str(tools / "cut_merged_videos_and_logs.py"),
         str(tmp_path), "-lm", str(loc_json)],
        capture_output=True, text=True, timeout=300,
    )
    assert result.returncode == 0, result.stderr

    adjusted = (session / "merged_adjusted.txt").read_text().splitlines()
    assert len(adjusted) == 2
    kfs = set(keyframe_indices(video))
    for line in adjusted:
        start_1idx = int(line.split(",")[0])
        assert start_1idx - 1 in kfs, f"adjusted start {start_1idx} not on a keyframe"

    clips = sorted(p.name for p in session.glob("[UK]*.mp4"))
    assert clips == ["K1.mp4", "U1.mp4"], (clips, result.stdout)

    import pandas as pd

    df = pd.read_csv(session / "U1.csv")
    assert list(df.columns) == [
        "frame", "timestamp", "iso", "shutter", "fnum", "ev", "ct",
        "color_md", "focal_len", "latitude", "longitude", "rel_alt", "abs_alt"]
    assert df["frame"].iloc[0] == 0
    assert str(df["timestamp"].iloc[0]).startswith("2022-10-04")

    # the stream-copied clip decodes and matches the source frame count:
    # adjusted start (keyframe) .. end-1, 1-indexed exclusive end
    start1, end1 = (int(v) for v in adjusted[0].split(",")[:2])
    n_clip = sum(1 for _ in VideoReader(session / "U1.mp4"))
    assert n_clip == (end1 - 1) - (start1 - 1) - 1 + 1 == end1 - start1
