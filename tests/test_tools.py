"""Smoke + behavior tests for the standalone tools (subprocess-driven, the
way users run them)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def run_tool(name, *args, cwd=None):
    return subprocess.run(
        [sys.executable, str(TOOLS / name), *map(str, args)],
        capture_output=True, text=True, timeout=300, cwd=cwd,
    )


_LIB_MODULES = {"_common.py", "dji_srt.py"}  # shared modules, not CLIs
ALL_TOOLS = sorted(p.name for p in TOOLS.glob("*.py") if p.name not in _LIB_MODULES)


@pytest.mark.parametrize("tool", ALL_TOOLS)
def test_tool_help(tool):
    result = run_tool(tool, "--help")
    assert result.returncode == 0, result.stderr
    assert "usage" in result.stdout.lower()


def test_subset_orthophoto(tmp_path):
    """Pixel-centers mode on a plain PNG mosaic (whole-image fallback)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (400, 400, 3), np.uint8)).save(tmp_path / "mosaic.png")
    result = run_tool("subset_orthophoto.py",
                      "--orthophoto-filepath", tmp_path / "mosaic.png",
                      "--ortho-cutout-folder", tmp_path / "o",
                      "--centers", "U=200,200", "--crop-size", "100",
                      "--scale-factor", "1.0")
    assert result.returncode == 0, result.stderr
    assert (tmp_path / "o" / "U.png").exists()
    center = np.loadtxt(tmp_path / "o" / "U_center.txt")
    assert center.tolist() == [200.0, 200.0]
    with Image.open(tmp_path / "o" / "U.png") as img:
        assert img.size == (100, 100)


def test_subset_orthophoto_geotiff_mode(tmp_path):
    """Reference-parity mode: GeoTIFF + JSON lat/lng location dict, tiled
    windowed reads, ortho_parameters.txt + center files + downscaled PNG
    (reference tools/subset_orthophoto.py:64-94)."""
    from PIL import Image

    from geotrax_tpu.io.tiff_tiled import write_tiled_tiff

    rng = np.random.default_rng(1)
    mosaic = rng.integers(0, 255, (600, 800, 3), np.uint8)
    lng_0, lat_0, scale = 126.60, 37.40, 1e-5
    write_tiled_tiff(tmp_path / "ortho.tif", mosaic, tile=256,
                     geo=(lng_0, lat_0, scale, scale))
    # location at pixel (cx=400, cy=300): lng = lng_0 + 400*scale, lat = lat_0 - 300*scale
    (tmp_path / "loc.json").write_text(json.dumps(
        {"U": [lat_0 - 300 * scale, lng_0 + 400 * scale]}))
    result = run_tool("subset_orthophoto.py",
                      "--orthophoto-filepath", tmp_path / "ortho.tif",
                      "--ortho-cutout-folder", tmp_path / "cut",
                      "--location-dict-filepath", tmp_path / "loc.json",
                      "--crop-size", "200", "--scale-factor", "0.5")
    assert result.returncode == 0, result.stderr
    params = np.loadtxt(tmp_path / "cut" / "ortho_parameters.txt")
    np.testing.assert_allclose(params, [lng_0, lat_0, scale, -scale])
    center = np.loadtxt(tmp_path / "cut" / "U_center.txt")
    assert center.tolist() == [400.0, 300.0]
    with Image.open(tmp_path / "cut" / "U.png") as img:
        out = np.asarray(img)
    assert out.shape == (100, 100, 3)
    # the windowed read is exact: compare the unscaled crop through cv2
    cv2 = pytest.importorskip("cv2")
    expected = cv2.resize(mosaic[200:400, 300:500], (100, 100),
                          interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(out, expected)


def test_tiff_unsupported_layouts_raise_valueerror(tmp_path):
    """Callers (subset_orthophoto's mosaic reader) catch ValueError to fall
    back to a whole-image load — a missing required tag must not leak
    KeyError (even when the tile-width/offsets guard tags are present)."""
    import struct

    from PIL import Image

    from geotrax_tpu.io.tiff_tiled import open_tiled_tiff, write_tiled_tiff

    # strip-based TIFF (PIL default): no tile tags at all
    Image.new("RGB", (64, 64)).save(tmp_path / "strips.tif")
    with pytest.raises(ValueError):
        open_tiled_tiff(tmp_path / "strips.tif")

    # tiled TIFF with TileByteCounts(325) excised: retag it to an unknown id
    write_tiled_tiff(tmp_path / "t.tif",
                     np.zeros((64, 64, 3), np.uint8), tile=32)
    raw = bytearray((tmp_path / "t.tif").read_bytes())
    ifd = struct.unpack("<I", raw[4:8])[0]
    n = struct.unpack("<H", raw[ifd:ifd + 2])[0]
    hit = 0
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", raw[e:e + 2])[0] == 325:
            raw[e:e + 2] = struct.pack("<H", 60000)
            hit += 1
    assert hit == 1
    (tmp_path / "t_nocounts.tif").write_bytes(raw)
    with pytest.raises(ValueError):
        open_tiled_tiff(tmp_path / "t_nocounts.tif")


def test_viz_segmentations(tmp_path):
    from PIL import Image

    Image.new("RGB", (200, 200), (40, 40, 40)).save(tmp_path / "U.png")
    seg = tmp_path / "seg"
    seg.mkdir()
    pd.DataFrame({
        "section": ["1_2"], "lane": [1],
        "tlx": [20], "tly": [20], "blx": [20], "bly": [80],
        "brx": [120], "bry": [80], "trx": [120], "try": [20],
    }).to_csv(seg / "U.csv", index=False)
    result = run_tool("viz_segmentations.py", tmp_path, "-sf", seg)
    assert result.returncode == 0, result.stderr
    out = np.asarray(Image.open(seg / "U.png"))
    assert (out != 40).any()  # overlay drawn


def test_yolo_to_coco_roundtrip(tmp_path):
    from PIL import Image

    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    Image.new("RGB", (100, 80)).save(tmp_path / "images" / "train" / "a.png")
    (tmp_path / "labels" / "train" / "a.txt").write_text("0 0.5 0.5 0.2 0.25\n")
    result = run_tool("yolo_to_coco.py", tmp_path, "--split", "train",
                      "-o", tmp_path / "coco.json")
    assert result.returncode == 0, result.stderr
    coco = json.loads((tmp_path / "coco.json").read_text())
    assert len(coco["images"]) == 1 and len(coco["annotations"]) == 1
    bbox = coco["annotations"][0]["bbox"]
    assert bbox == [40.0, 30.0, 20.0, 20.0]


def test_fix_json_annotations(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "a.png", "width": 100, "height": 100}],
        "annotations": [
            {"id": 7, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 8, "image_id": 1, "category_id": 1, "bbox": [50, 50, 0, 10], "area": 0, "iscrowd": 0},
            {"id": 9, "image_id": 1, "category_id": 1, "bbox": [90, 90, 30, 30], "area": 900, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "car"}],
    }
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(coco))
    result = run_tool("fix_json_annotations.py", path)
    assert result.returncode == 0, result.stderr
    fixed = json.loads(path.read_text())
    assert len(fixed["annotations"]) == 2  # degenerate box dropped
    assert fixed["annotations"][1]["bbox"] == [90, 90, 10, 10]  # clipped
    assert [a["id"] for a in fixed["annotations"]] == [1, 2]


def test_interpolate_missing_timestamps(tmp_path):
    log = tmp_path / "U.csv"
    pd.DataFrame({
        "frame": [0, 1, 2, 3],
        "timestamp": ["2022-10-07 10:00:00.000", None, None, "2022-10-07 10:00:00.300"],
    }).to_csv(log, index=False)
    result = run_tool("interpolate_missing_timestamps.py", log, "--fps", "10")
    assert result.returncode == 0, result.stderr
    out = pd.read_csv(log)
    assert out["timestamp"].notna().all()
    assert out["timestamp"][1] == "2022-10-07 10:00:00.100"


def test_check_dataset(tmp_path):
    pd.DataFrame({
        # vehicle 1 speeds twice: the report keeps only its WORST row
        "Vehicle_ID": [1, 1, 2], "Vehicle_Speed": [150.0, 160.0, 50.0],
        "Vehicle_Acceleration": [1.0, 0.5, -14.0],
    }).to_csv(tmp_path / "d.csv", index=False)
    result = run_tool("check_dataset.py", tmp_path / "d.csv", "--no-trace")
    assert result.returncode == 0
    assert "speed > 130" in result.stdout
    assert "160" in result.stdout and "150" not in result.stdout  # per-vehicle max
    assert "-14" in result.stdout
    assert "2 violating" in result.stdout


def test_check_dataset_traces_source_video(tmp_path):
    """Violations in an aggregated dataset CSV are traced back through the
    aggregation ID offsets to the original id and source video
    (reference check_dataset.py:148-205 + find_source_id)."""
    base = tmp_path / "PROCESSED" / "2022-10-07" / "D3" / "PM5" / "results"
    base.mkdir(parents=True)
    pd.DataFrame({"Vehicle_ID": [1, 2, 3]}).to_csv(base / "U_a.csv", index=False)
    base2 = tmp_path / "PROCESSED" / "2022-10-07" / "D10" / "PM5" / "results"
    base2.mkdir(parents=True)
    pd.DataFrame({"Vehicle_ID": [1, 2]}).to_csv(base2 / "U_b.csv", index=False)
    (base2.parent / "U_b.mp4").touch()  # the source clip next to results/
    dataset = tmp_path / "DATASET"
    dataset.mkdir()
    # aggregated ID 4 = original 1 of the second (D10) source
    pd.DataFrame({
        "Vehicle_ID": [4], "Vehicle_Speed": [150.0], "Vehicle_Acceleration": [0.0],
    }).to_csv(dataset / "2022-10-07_U_PM5.csv", index=False)
    result = run_tool("check_dataset.py", dataset / "2022-10-07_U_PM5.csv")
    assert result.returncode == 0, result.stderr
    assert "U_b.mp4" in result.stdout
    out_line = [ln for ln in result.stdout.splitlines() if "U_b.mp4" in ln][0]
    assert " 1 " in out_line  # Source_ID column carries the original id


def test_find_source_id_dataset_csv_mode(tmp_path):
    base = tmp_path / "PROCESSED" / "2022-10-07" / "D3" / "PM5" / "results"
    base.mkdir(parents=True)
    pd.DataFrame({"Vehicle_ID": [1, 2, 3]}).to_csv(base / "U_a.csv", index=False)
    dataset = tmp_path / "DATASET"
    dataset.mkdir()
    (dataset / "2022-10-07_U_PM5.csv").touch()
    result = run_tool("find_source_id.py", "--dataset-csv",
                      dataset / "2022-10-07_U_PM5.csv", "2")
    assert result.returncode == 0, result.stderr
    assert "U_a" in result.stdout and "original id 2" in result.stdout


def test_analyze_bb_ratios_labels_mode(tmp_path):
    (tmp_path / "a.txt").write_text("0 0.5 0.5 0.4 0.2\n1 0.5 0.5 0.3 0.1\n")
    result = run_tool("analyze_bb_ratios.py", tmp_path, "--labels")
    assert result.returncode == 0, result.stderr
    assert "car" in result.stdout and "2.00" in result.stdout
    assert "bus" in result.stdout and "3.00" in result.stdout


def test_analyze_bb_ratios_tracks_mode(tmp_path):
    """Reference mode: tracks re-estimated under the restrictive thresholds;
    only the moving (cardinal-pass) vehicle contributes its L/W ratio."""
    results = tmp_path / "results"
    results.mkdir()
    rows = []
    for t in range(30):
        x = 500.0 + 50 * t  # clean +x cardinal pass
        rows.append([t, 1, x, 500, 60, 25, x, 500, 60, 25, 0, 0.9])
        rows.append([t, 2, 2000, 800, 50, 30, 2000, 800, 50, 30, 0, 0.9])  # parked
    np.savetxt(results / "V.txt", np.array(rows), fmt="%g", delimiter=",")
    (tmp_path / "V.yaml").write_text("video:\n  width: 3840\n  height: 2160\n")
    result = run_tool("analyze_bb_ratios.py", tmp_path, "--hist")
    assert result.returncode == 0, result.stderr
    assert "Class: car" in result.stdout
    assert "N: 1" in result.stdout          # parked vehicle filtered out
    assert "Mean: 2.40" in result.stdout    # 60/25
    assert (tmp_path / "plots" / "bb_ratio_hist_car.pdf").exists()


def test_compare_tracking(tmp_path):
    for name, n in (("a", 20), ("b", 10)):
        d = tmp_path / name
        d.mkdir()
        rows = [[t, 1, 10, 10, 5, 5, 0, 0.9, 5, 5] for t in range(n)]
        np.savetxt(d / "V.txt", np.array(rows), fmt="%g", delimiter=",")
    result = run_tool("compare_tracking.py", tmp_path / "a", tmp_path / "b")
    assert result.returncode == 0, result.stderr
    assert "KL[lengths](" in result.stdout
    assert "1 tracks" in result.stdout


def test_find_cut_video_issues(tmp_path):
    log = tmp_path / "U.csv"
    pd.DataFrame({
        "frame": [0, 1, 2, 5],  # frame gap
        "timestamp": ["2022-01-01 10:00:00.000", "2022-01-01 10:00:00.033",
                      "2022-01-01 10:00:05.000", "2022-01-01 10:00:05.100"],  # jump
    }).to_csv(log, index=False)
    result = run_tool("find_cut_video_issues.py", log)
    assert result.returncode == 1  # anomalies found
    assert "frame-gap" in result.stdout
    assert "timestamp-jump" in result.stdout


def _write_test_video(path, n=20, w=64, h=48):
    cv2 = pytest.importorskip("cv2")
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n):
        writer.write(np.full((h, w, 3), i * 10 % 255, np.uint8))
    writer.release()


def test_recut_video_and_log(tmp_path):
    """--start/--end CLI path: INCLUSIVE end (reference cut_and_save_csv
    semantics, recut_video_and_log.py:163-190)."""
    cv2 = pytest.importorskip("cv2")
    video = tmp_path / "U.mp4"
    _write_test_video(video)
    pd.DataFrame({"frame": range(20), "timestamp": ["t"] * 20}).to_csv(
        tmp_path / "U.csv", index=False)
    result = run_tool("recut_video_and_log.py", video, "-s", "5", "-e", "15",
                      "-o", tmp_path / "cut.mp4", "-ec")
    assert result.returncode == 0, result.stderr
    cap = cv2.VideoCapture(str(tmp_path / "cut.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 11
    cap.release()
    log = pd.read_csv(tmp_path / "cut.csv")
    assert log["frame"].tolist() == list(range(11))


def test_recut_cuts_file_rotation_and_debug(tmp_path):
    """Cuts-file path 'start, end, rotation' + default output naming + debug
    verification (reference recut_video_and_log.py:353-378, 193-260)."""
    cv2 = pytest.importorskip("cv2")
    video = tmp_path / "U.mp4"
    _write_test_video(video, n=20, w=64, h=48)
    pd.DataFrame({"frame": range(20), "timestamp": ["t"] * 20}).to_csv(
        tmp_path / "U.csv", index=False)
    cuts = tmp_path / "cuts.txt"
    cuts.write_text("0, -1, 90\n")
    result = run_tool("recut_video_and_log.py", video, cuts, "-ec", "-q")
    assert result.returncode == 0, result.stderr
    out = tmp_path / "U_cut.mp4"
    cap = cv2.VideoCapture(str(out))
    # 90-degree rotation swaps dimensions
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 48
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 64
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 20
    cap.release()
    assert pd.read_csv(tmp_path / "U_cut.csv")["frame"].tolist() == list(range(20))
    # no-rotation debug run verifies sampled-frame RMSE
    result = run_tool("recut_video_and_log.py", video, "-s", "0", "-e", "10",
                      "-o", tmp_path / "v.mp4", "-ec", "--debug")
    assert result.returncode == 0, result.stderr
    assert "verification max RMSE" in result.stdout + result.stderr


def test_recut_sanity_checks(tmp_path):
    video = tmp_path / "U.mp4"
    _write_test_video(video, n=10)
    bad = run_tool("recut_video_and_log.py", video, "-s", "8", "-e", "4",
                   "-o", tmp_path / "x.mp4")
    assert bad.returncode != 0
    assert "cut_start" in bad.stderr
    bad_rot = tmp_path / "cuts.txt"
    bad_rot.write_text("0, -1, 45")
    result = run_tool("recut_video_and_log.py", video, bad_rot)
    assert result.returncode != 0
    assert "rotation" in result.stderr


def test_find_cut_video_issues_report(tmp_path):
    """--report writes flight_log_stats.csv + flight_log_anomalies.csv with
    the columns fix_timestamp_anomalies.py consumes (reference
    find_cut_video_issues.py:140-142,289-306)."""
    good = tmp_path / "A1.csv"
    pd.DataFrame({
        "frame": range(5),
        "timestamp": [f"2022-01-01 10:00:00.{i * 33:03d}" for i in range(5)],
    }).to_csv(good, index=False)
    bad = tmp_path / "B2.csv"
    pd.DataFrame({
        "frame": range(5),
        "timestamp": ["2022-01-01 10:00:00.000", "2022-01-01 10:00:00.033",
                      "2022-01-01 10:00:05.000", "2022-01-01 10:00:05.033",
                      "2022-01-01 10:00:05.066"],
        "latitude": [37.4, 37.4, 37.4001, 37.4, 37.4],
        "longitude": [126.6] * 5,
        "rel_alt": [140.0, 140.1, 140.0, 139.9, 140.0],
    }).to_csv(bad, index=False)
    result = run_tool("find_cut_video_issues.py", tmp_path, "--report", tmp_path)
    assert result.returncode == 1  # anomalies found
    stats = pd.read_csv(tmp_path / "flight_log_stats.csv")
    assert set(stats["location_id"]) == {"A", "B"}
    assert "timestamp_anomaly_frame" in stats.columns
    anoms = pd.read_csv(tmp_path / "flight_log_anomalies.csv")
    assert anoms["location_id"].tolist() == ["B"]
    assert int(anoms["timestamp_anomaly_frame"].iloc[0]) == 2
    assert anoms["timestamp_max_abs_diff"].iloc[0] > 4.0
    # radius deviation computed from the GPS glitch (~11 m)
    row_b = stats[stats["location_id"] == "B"].iloc[0]
    assert 5.0 < row_b["radius_max_deviation"] < 20.0


def _import_tool(name):
    import importlib
    import sys as _sys

    if str(TOOLS) not in _sys.path:
        _sys.path.insert(0, str(TOOLS))
    return importlib.import_module(name)


def test_fix_timestamp_anomalies_plan_and_apply(tmp_path, monkeypatch):
    """Cut planning (single vs double cut), backup renames, cut-spec files,
    and the recut/batch command chain (reference fix_timestamp_anomalies.py:
    114-175), with subprocess calls recorded instead of executed."""
    fix = _import_tool("fix_timestamp_anomalies")

    # anomaly in the middle of a 40 s log -> two cuts
    assert len(fix.plan_cuts(tmp_path / "U3.MP4", "U", 3, 600, 1200)) == 2
    # anomaly near the start -> one cut from the right
    (spec, start, end), = fix.plan_cuts(tmp_path / "U3.MP4", "U", 3, 60, 1200)
    assert (start, end) == (90, -1)
    # anomaly near the end -> one cut from the left
    (_, start, end), = fix.plan_cuts(tmp_path / "U3.MP4", "U", 3, 1150, 1200)
    assert (start, end) == (0, 1120)

    video = tmp_path / "U3.MP4"
    video.write_bytes(b"fake")
    pd.DataFrame({"frame": range(1200), "timestamp": ["t"] * 1200}).to_csv(
        tmp_path / "U3.CSV", index=False)
    anomalies = tmp_path / "flight_log_anomalies.csv"
    pd.DataFrame([{
        "location_id": "U", "video_path": "U3.MP4",
        "timestamp_max_abs_diff": 5.0,
        "timestamp_anomaly_location": "2022-01-01 10:00:20",
        "timestamp_anomaly_frame": 600,
    }]).to_csv(anomalies, index=False)

    calls = []
    monkeypatch.setattr(fix.subprocess, "run",
                        lambda cmd, check: calls.append(cmd))
    import argparse
    import logging

    args = argparse.Namespace(input=anomalies, processed_folder=None,
                              debug=False)
    rc = fix.fix_timestamp_anomalies(args, logging.getLogger("t"))
    assert rc == 0
    # originals renamed, two cut specs written
    assert (tmp_path / "U3_original.MP4").exists()
    assert (tmp_path / "U3_original.CSV").exists()
    spec1 = tmp_path / "0_U3_U3_recut.TXT"
    spec2 = tmp_path / "0_U3_U4_recut.TXT"
    assert spec1.read_text() == "0, 570"
    assert spec2.read_text() == "630, -1"
    # four subprocess invocations: recut + batch per segment
    assert len(calls) == 4
    assert "recut_video_and_log.py" in calls[0][1]
    assert calls[1][1:4] == ["-m", "geotrax_tpu", "batch"]
    # segment names derive from the spec stems: U3 and U4
    assert calls[0][calls[0].index("-o") + 1].endswith("U3.MP4")
    assert calls[2][calls[2].index("-o") + 1].endswith("U4.MP4")


def test_fix_timestamp_anomalies_debug_mode(tmp_path):
    """--debug modifies nothing (reference fix_timestamp_anomalies.py:142-154)."""
    video = tmp_path / "U1.MP4"
    video.write_bytes(b"fake")
    pd.DataFrame({"frame": range(1200), "timestamp": ["t"] * 1200}).to_csv(
        tmp_path / "U1.CSV", index=False)
    anomalies = tmp_path / "anoms.csv"
    pd.DataFrame([{
        "location_id": "U", "video_path": "U1.MP4",
        "timestamp_max_abs_diff": 5.0,
        "timestamp_anomaly_location": "x",
        "timestamp_anomaly_frame": 600,
    }]).to_csv(anomalies, index=False)
    result = run_tool("fix_timestamp_anomalies.py", anomalies, "--debug")
    assert result.returncode == 0, result.stderr
    assert video.exists()  # not renamed
    assert not (tmp_path / "U1_original.MP4").exists()
    assert not list(tmp_path.glob("*.TXT"))


def test_fix_timestamp_anomalies_skips_higher_sequence(tmp_path):
    """A higher sequence number blocks the fix (reference :106-110)."""
    (tmp_path / "U1.MP4").write_bytes(b"fake")
    pd.DataFrame({"frame": range(100), "timestamp": ["t"] * 100}).to_csv(
        tmp_path / "U1.CSV", index=False)
    (tmp_path / "U2.CSV").write_text("frame\n0\n")
    anomalies = tmp_path / "anoms.csv"
    pd.DataFrame([{
        "location_id": "U", "video_path": "U1.MP4",
        "timestamp_max_abs_diff": 5.0, "timestamp_anomaly_location": "x",
        "timestamp_anomaly_frame": 50,
    }]).to_csv(anomalies, index=False)
    result = run_tool("fix_timestamp_anomalies.py", anomalies)
    assert result.returncode == 0, result.stderr
    assert (tmp_path / "U1.MP4").exists()
    assert not (tmp_path / "U1_original.MP4").exists()


def test_find_source_id(tmp_path):
    base = tmp_path / "PROCESSED" / "2022-10-07" / "D3" / "PM5" / "results"
    base.mkdir(parents=True)
    pd.DataFrame({"Vehicle_ID": [1, 2, 3]}).to_csv(base / "U_x.csv", index=False)
    base2 = tmp_path / "PROCESSED" / "2022-10-07" / "D10" / "PM5" / "results"
    base2.mkdir(parents=True)
    pd.DataFrame({"Vehicle_ID": [1, 2]}).to_csv(base2 / "U_y.csv", index=False)
    result = run_tool("find_source_id.py", tmp_path / "PROCESSED",
                      "2022-10-07", "U", "PM5", "4")
    assert result.returncode == 0, result.stderr
    assert "U_y" in result.stdout and "original id 1" in result.stdout


def test_viz_dimension_estimation(tmp_path):
    rows = []
    for t in range(30):
        x = 500.0 + 50 * t  # fast +x motion (cardinal)
        rows.append([t, 3, x, 500, 60, 25, x, 500, 60, 25, 0, 0.9, 60, 25])
    path = tmp_path / "V.txt"
    np.savetxt(path, np.array(rows), fmt="%g", delimiter=",")
    result = run_tool("viz_dimension_estimation.py", path, "--id", "3",
                      "--frame-size", "3840", "2160", "--save")
    assert result.returncode == 0, result.stderr
    plots = tmp_path / "plots"
    # the reference's two figures + the diagnostic panel
    assert (plots / "V_trajectory_with_dimensions_id3.pdf").exists()
    assert (plots / "V_dimensions_distribution_id3.pdf").exists()
    assert (plots / "V_estimation_diagnostics_id3.pdf").exists()
    assert "Q25 estimate" in (result.stdout + result.stderr)

    # an unknown id exits with the available-id listing (reference behavior)
    result = run_tool("viz_dimension_estimation.py", path, "--id", "99",
                      "--frame-size", "3840", "2160")
    assert result.returncode != 0
    assert "Available IDs" in (result.stdout + result.stderr)


def test_compare_av_detections(tmp_path):
    fps = 10.0
    frames = np.arange(60)
    x = 170000 + 2.0 * frames  # 2 m/frame at 10fps = 72 km/h
    pipeline = pd.DataFrame({
        "Vehicle_ID": 7, "Frame_Number": frames,
        "Local_X": x + np.random.default_rng(0).normal(0, 0.02, 60),
        "Local_Y": 532000.0, "Vehicle_Speed": 72.0,
    })
    pipeline.to_csv(tmp_path / "p.csv", index=False)
    pd.DataFrame({"frame": frames, "x": x, "y": 532000.0, "speed_kmh": 72.0}).to_csv(
        tmp_path / "gt.csv", index=False)
    result = run_tool("compare_av_detections_and_tune_filters.py",
                      tmp_path / "p.csv", "--probe", tmp_path / "gt.csv",
                      "--fps", "10", "--tune", "--grid", "2", "5", "9")
    assert result.returncode == 0, result.stderr
    assert "Vehicle_ID 7" in result.stdout
    assert "Best smoothing" in result.stdout
    assert "average best param" in result.stdout


def test_compare_av_dataset_mode(tmp_path):
    """Dataset mode: RTK logs + probe map + per-video pipeline CSVs produce
    per-video AND per-intersection stats, the sweep reports both reference
    criteria, and --save writes the LaTeX tables + PDF plots
    (reference compare_av_detections_and_tune_filters.py:150-554)."""
    from geotrax_tpu.ops.tmerc import local2geo

    av = tmp_path / "av_trajectories"
    av.mkdir()
    results = tmp_path / "results"
    results.mkdir()

    fps, n = 10.0, 80
    t0 = 1_665_100_000.0
    probe_rows, spd_rows, pmap = [], [], {}
    for vi, video in enumerate(("K1_AV", "K2_AV", "L1_AV")):
        # straight 3 m/s pass, distinct lanes; K* share an intersection
        tt = t0 + vi * 1000 + np.arange(n) / fps
        x = 170000.0 + 3.0 / fps * np.arange(n)
        y = 532000.0 + 40.0 * vi
        lat, lon = local2geo(x, np.full(n, y), xp=np)
        sec = np.floor(tt)
        nsec = np.round((tt - sec) * 1e9)
        probe_rows.append(np.column_stack([sec, nsec, np.asarray(lon), np.asarray(lat)]))
        spd_rows.append(np.column_stack([sec, nsec, np.full(n, 3.0)]))
        pd.DataFrame({
            "Vehicle_ID": 5, "Frame_Number": np.arange(n),
            "Timestamp": pd.to_datetime(tt, unit="s"),
            "Local_X": x + np.random.default_rng(vi).normal(0, 0.05, n),
            "Local_Y": y, "Vehicle_Speed": 10.8, "Visibility": 1,
        }).to_csv(results / f"{video}.csv", index=False)
        pmap[video] = {
            "id": 5,
            "start": str(pd.to_datetime(tt[0], unit="s")),
            "end": str(pd.to_datetime(tt[-1], unit="s")),
        }
    np.savetxt(av / "sec_nsec_lon_lat_2022.txt", np.vstack(probe_rows))
    np.savetxt(av / "sec_nsec_horSpd_2022.txt", np.vstack(spd_rows))
    (tmp_path / "probes.json").write_text(json.dumps(pmap))

    result = run_tool("compare_av_detections_and_tune_filters.py", tmp_path,
                      "--probe-map", tmp_path / "probes.json", "--fps", "10",
                      "--tune", "--grid", "2", "6", "--save")
    assert result.returncode == 0, result.stderr
    assert "Video K1_AV" in result.stdout and "Video L1_AV" in result.stdout
    assert "Intersection K" in result.stdout and "Intersection L" in result.stdout
    assert "length-weighted" in result.stdout
    plots = tmp_path / "plots"
    assert (plots / "AV_errors_per_video.tex").exists()
    assert (plots / "AV_errors_per_intersection.tex").exists()
    assert (plots / "AV_trajectories_local.pdf").exists()
    assert (plots / "AV_trajectories_all.pdf").exists()
    assert (plots / "AV_speed_comparison.pdf").exists()
    assert (plots / "AV_acceleration_comparison.pdf").exists()
    assert (plots / "AV_positional_and_speed_errors.pdf").exists()
    assert (plots / "AV_speed_error_sweep.pdf").exists()
    # per-video tex has 3 rows, per-intersection 2 (K merged from K1+K2)
    assert len((plots / "AV_errors_per_video.tex").read_text().splitlines()) == 3
    assert len((plots / "AV_errors_per_intersection.tex").read_text().splitlines()) == 2
    # positional error of a ~5 cm-noise straight pass must be centimetric
    k_row = (plots / "AV_errors_per_intersection.tex").read_text().splitlines()[0]
    assert float(k_row.split("$")[1].split("\\pm")[0]) < 0.2


def _mk_video(path, n_frames, w=64, h=48):
    cv2 = pytest.importorskip("cv2")
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n_frames):
        writer.write(np.full((h, w, 3), i * 7 % 255, np.uint8))
    writer.release()


def test_sample_frames_balanced_and_filters(tmp_path):
    """Reference parity: --balanced quota distribution, --skip-start/--skip-end
    windows, and repeatable --csv-filter field:min:max criteria
    (reference tools/sample_frames.py:24-104)."""
    data = tmp_path / "PROCESSED"
    (data / "A").mkdir(parents=True)
    (data / "B").mkdir(parents=True)
    _mk_video(data / "A" / "0_merged.mp4", 30)
    _mk_video(data / "B" / "0_merged.mp4", 10)
    out = tmp_path / "frames"

    # balanced: 10 total -> 5 from each video despite the 3x length imbalance
    r = run_tool("sample_frames.py", data, "-o", out, "-n", "10", "--balanced")
    assert r.returncode == 0, r.stderr
    names = sorted(p.name for p in out.glob("*.png"))
    assert len(names) == 10
    assert sum("A_0_merged" in n for n in names) == 5
    assert sum("B_0_merged" in n for n in names) == 5

    # global: all 8 eligible frames of a skip-windowed single video, idx in [3,7)
    out2 = tmp_path / "frames2"
    r = run_tool("sample_frames.py", data / "A" / "0_merged.mp4", "-o", out2,
                 "-n", "99", "--skip-start", "3", "--skip-end", "23")
    assert r.returncode == 0, r.stderr
    idxs = sorted(int(p.stem.split("_")[-1]) for p in out2.glob("*.png"))
    assert idxs == [3, 4, 5, 6]

    # csv-filter: rel_alt band + iso ceiling, multi-field AND semantics
    pd.DataFrame({
        "frame": range(30),
        "rel_alt": [100.0] * 10 + [150.0] * 10 + [200.0] * 10,
        "iso": [100.0] * 15 + [800.0] * 15,
    }).to_csv(data / "A" / "0_merged.csv", index=False)
    out3 = tmp_path / "frames3"
    r = run_tool("sample_frames.py", data / "A" / "0_merged.mp4", "-o", out3,
                 "-n", "99", "--csv-filter", "rel_alt:130:160",
                 "--csv-filter", "iso::400")
    assert r.returncode == 0, r.stderr
    idxs = sorted(int(p.stem.split("_")[-1]) for p in out3.glob("*.png"))
    assert idxs == list(range(10, 15))  # alt 150 AND iso 100 rows only

    # shorthand --min-alt falls back to the companion .csv when the clip has
    # no .srt (cut clips carry only the .csv log the cut tool wrote)
    out6 = tmp_path / "frames6"
    r = run_tool("sample_frames.py", data / "A" / "0_merged.mp4", "-o", out6,
                 "-n", "99", "--min-alt", "160")
    assert r.returncode == 0, r.stderr
    idxs = sorted(int(p.stem.split("_")[-1]) for p in out6.glob("*.png"))
    assert idxs == list(range(20, 30))  # alt 200 rows only

    # a filter excludes videos with no companion log
    r = run_tool("sample_frames.py", data, "-o", tmp_path / "f4", "-n", "99",
                 "--csv-filter", "rel_alt:130:160")
    assert r.returncode == 0, r.stderr
    # exclusion warnings go through the stage logger (console handler on
    # stderr, reference tools/sample_frames.py --log-path/--quiet surface)
    assert "no flight log" in r.stderr and "B" in r.stderr

    # dry-run writes nothing
    out5 = tmp_path / "frames5"
    r = run_tool("sample_frames.py", data, "-o", out5, "-n", "4", "--dry-run")
    assert r.returncode == 0, r.stderr
    assert not out5.exists()
    assert (r.stdout + r.stderr).count("[dry-run]") == 4


def test_compute_bb_center_error(tmp_path):
    """Reference-parity semantics: center-in-box matching, per-class table +
    overall row, NaN for unmatched GT, --save figures, --class-agnostic mode
    (reference tools/compute_bb_center_error.py:98-278)."""
    from PIL import Image

    images = tmp_path / "images"
    labels = tmp_path / "labels"
    preds = tmp_path / "pre-labels"
    for d in (images, labels, preds):
        d.mkdir()
    Image.new("RGB", (200, 100), (10, 10, 10)).save(images / "000001.jpg")
    # GT: class0 box center (100,50) size 40x40 px; class1 at (40,30) 20x20
    (labels / "000001.txt").write_text(
        "0 0.5 0.5 0.2 0.4\n"
        "1 0.2 0.3 0.1 0.2\n"
    )
    # predictions: one 4px off inside box A; one far away (no match for B)
    (preds / "000001.txt").write_text(
        "0 0.52 0.5 0.2 0.4\n"
        "0 0.9 0.9 0.05 0.05\n"
    )
    r = run_tool("compute_bb_center_error.py", images, "--save")
    assert r.returncode == 0, r.stderr
    out_text = r.stdout + r.stderr
    assert "Class-specific error statistics" in out_text
    assert "4.00" in out_text          # class 0: 0.02*200 = 4 px center error
    assert "nan" in out_text.lower()   # class 1 unmatched -> NaN row
    assert (tmp_path / "error_distribution_by_class.pdf").exists()
    assert (tmp_path / "error_distribution_by_class.png").exists()

    r = run_tool("compute_bb_center_error.py", images, "--class-agnostic")
    assert r.returncode == 0, r.stderr
    out_text = r.stdout + r.stderr
    assert "Class-agnostic error statistics" in out_text
    assert "Mean error: 4.00" in out_text
    assert "Number of NaN errors: 1" in out_text


def test_fix_json_annotations_labelme_dir(tmp_path):
    """Reference-parity directory mode: imageData removal, path normalize/
    edit chain, HBB<->OBB shape conversion, --debug preview
    (reference tools/fix_json_annotations.py:94-239)."""
    d = tmp_path / "labels"
    d.mkdir()
    ann = {
        "imagePath": "imgs\\sub\\a.png",
        "imageData": "QUJD",
        "shapes": [
            {"label": "car", "shape_type": "rectangle",
             "points": [[10, 20], [50, 60]]},
            {"label": "bus", "shape_type": "polygon",
             "points": [[0, 0], [0, 4], [8, 4], [8, 0]]},
        ],
    }
    (d / "a.json").write_text(json.dumps(ann))

    # debug: nothing changes on disk
    r = run_tool("fix_json_annotations.py", d, "--remove-image-data", "--debug")
    assert r.returncode == 0, r.stderr
    assert json.loads((d / "a.json").read_text())["imageData"] == "QUJD"
    assert "debug mode" in (r.stdout + r.stderr)

    r = run_tool("fix_json_annotations.py", d, "--remove-image-data",
                 "--normalize-to-unix", "--remove-from-path", "imgs/",
                 "--to-obb")
    assert r.returncode == 0, r.stderr
    out = json.loads((d / "a.json").read_text())
    assert out["imageData"] is None
    assert out["imagePath"] == "sub/a.png"
    # rectangle became TL,BL,BR,TR polygon
    assert out["shapes"][0]["shape_type"] == "polygon"
    assert out["shapes"][0]["points"] == [[10, 20], [10, 60], [50, 60], [50, 20]]

    r = run_tool("fix_json_annotations.py", d, "--to-hbb")
    assert r.returncode == 0, r.stderr
    out = json.loads((d / "a.json").read_text())
    assert out["shapes"][0]["points"] == [[10, 20], [50, 60]]
    assert out["shapes"][1]["points"] == [[0, 0], [8, 4]]


def test_annotate_frames_workflow(tmp_path):
    """Reference annotation workflow: pre-labels default dir, empty txt for
    background, skip-existing vs --overwrite, --save-conf extended format,
    per-class thresholds, masked output (reference tools/annotate_frames.py)."""
    import jax

    from PIL import Image

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import save_npz

    spec = yolov8.ModelSpec(variant="n", nc=4)
    save_npz(tmp_path / "tiny.npz",
             jax.device_get(yolov8.init_params(jax.random.PRNGKey(0), spec)),
             class_names={0: "car", 1: "bus", 2: "truck", 3: "motorcycle"},
             variant="n", nc=4)
    images = tmp_path / "data" / "images"
    images.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("f1", "f2"):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            images / f"{name}.jpg")

    common = ("--model", tmp_path / "tiny.npz", "--imgsz", "64",
              "--max-det", "8")
    r = run_tool("annotate_frames.py", images, *common, "--conf", "0.0",
                 "--save-conf", "--save-masked", "--margin", "0.1")
    assert r.returncode == 0, r.stderr
    labels = tmp_path / "data" / "pre-labels"
    assert (labels / "f1.txt").exists() and (labels / "f2.txt").exists()
    rows = (labels / "f1.txt").read_text().split()
    if rows:  # random weights: detections likely at conf 0 -> 6-col format
        assert len(rows) % 6 == 0
    assert (labels / "masked" / "f1.png").exists()

    # skip-existing: second run reports skips and leaves files untouched
    before = (labels / "f1.txt").read_text()
    (labels / "f1.txt").write_text("9 0.5 0.5 0.1 0.1\n")
    r = run_tool("annotate_frames.py", images, *common, "--conf", "0.0")
    assert r.returncode == 0, r.stderr
    assert "2 existing annotation(s) skipped" in (r.stdout + r.stderr)
    assert (labels / "f1.txt").read_text() == "9 0.5 0.5 0.1 0.1\n"

    # overwrite regenerates (5-col format without --save-conf)
    r = run_tool("annotate_frames.py", images, *common, "--conf", "0.0",
                 "--overwrite")
    assert r.returncode == 0, r.stderr
    regen = (labels / "f1.txt").read_text()
    assert regen != "9 0.5 0.5 0.1 0.1\n"
    if regen.strip():
        assert len(regen.split()) % 5 == 0

    # a per-class threshold of 1.0 on every class empties the annotations
    r = run_tool("annotate_frames.py", images, *common, "--conf", "0.0",
                 "--overwrite", "-t", "0=1.0", "1=1.0", "2=1.0", "3=1.0")
    assert r.returncode == 0, r.stderr
    assert (labels / "f1.txt").read_text().strip() == ""


def test_export_model_pt_roundtrip(tmp_path):
    """--format pt writes an ultralytics-layout state-dict .pt that loads
    straight back through our converter with an IDENTICAL forward — the
    interop path for weights trained here and served on the reference stack."""
    import jax
    import jax.numpy as jnp

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import load_model, save_npz

    spec = yolov8.ModelSpec(variant="n", nc=4)
    params = jax.device_get(yolov8.init_params(jax.random.PRNGKey(3), spec))
    save_npz(tmp_path / "trained.npz", params,
             class_names={0: "car", 1: "bus", 2: "truck", 3: "motorcycle"},
             variant="n", nc=4)

    r = run_tool("export_model.py", tmp_path / "trained.npz",
                 "-o", tmp_path / "weights.pt", "--format", "pt")
    assert r.returncode == 0, r.stderr
    assert "ultralytics-layout" in r.stdout

    params2, spec2, names2 = load_model(tmp_path / "weights.pt")
    assert spec2.variant == "n" and spec2.nc == 4
    assert names2 == {0: "car", 1: "bus", 2: "truck", 3: "motorcycle"}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    b1, p1 = yolov8.forward(params, x, spec)
    b2, p2 = yolov8.forward(params2, x, spec2)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def _write_srt(path, n, fps=30, frame_offset=0):
    """Minimal DJI-style SRT: one block per frame with FrameCnt + telemetry."""
    blocks = []
    for i in range(n):
        t0 = int(i * 1000 / fps)
        t1 = int((i + 1) * 1000 / fps)
        def ts(ms):
            h, rem = divmod(ms, 3_600_000)
            m, rem = divmod(rem, 60_000)
            s, msec = divmod(rem, 1_000)
            return f"{h:02d}:{m:02d}:{s:02d},{msec:03d}"
        blocks.append(
            f"{i + 1}\n{ts(t0)} --> {ts(t1)}\n"
            f"FrameCnt : {frame_offset + i + 1}\n"
            f"2022-10-07 17:52:13.{i:03d}\n"
            f"[latitude: 37.39] [longitude: 126.66] [rel_alt: 140.0]\n"
        )
    path.write_text("\n".join(blocks))


def test_merge_videos_session_mode(tmp_path):
    """Reference surface (merge_videos_and_logs.py:374-387): recursive session
    discovery, mirrored --output-dir, stream-copy concat, SRT counter
    continuity across parts."""
    cv2 = pytest.importorskip("cv2")
    session = tmp_path / "RAW" / "2022-10-04" / "D1" / "AM1"
    session.mkdir(parents=True)
    _write_test_video(session / "DJI_0001.mp4", n=10)
    _write_test_video(session / "DJI_0002.mp4", n=15)
    _write_srt(session / "DJI_0001.SRT", 10)
    _write_srt(session / "DJI_0002.SRT", 15)

    out_root = tmp_path / "PROCESSED"
    result = run_tool("merge_videos_and_logs.py", tmp_path / "RAW",
                      "--output-dir", out_root, "--video-ext", ".mp4", "-q")
    assert result.returncode == 0, result.stderr
    merged = out_root / "2022-10-04" / "D1" / "AM1" / "0_merged.mp4"
    assert merged.exists()
    cap = cv2.VideoCapture(str(merged))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 25
    cap.release()

    # merged SRT: 25 blocks, FrameCnt continuous 1..25, timestamps monotone
    srt_text = merged.with_suffix(".srt").read_text()
    sys.path.insert(0, str(TOOLS))
    import dji_srt

    blocks = dji_srt.parse_srt(srt_text)
    assert len(blocks) == 25
    assert [b.frame_count for b in blocks] == list(range(1, 26))
    starts = [b.start_ms for b in blocks]
    assert starts == sorted(starts)


def test_merge_videos_dry_run_and_skip_existing(tmp_path):
    session = tmp_path / "S1"
    session.mkdir()
    _write_test_video(session / "DJI_0001.mp4", n=5)
    _write_srt(session / "DJI_0001.SRT", 5)
    result = run_tool("merge_videos_and_logs.py", session,
                      "--video-ext", ".mp4", "--dry-run", "-q")
    assert result.returncode == 0, result.stderr
    assert not (session / "0_merged.mp4").exists()
    assert not (session / "0_merged.srt").exists()


def test_yolo_to_coco_per_image_labelme_mode(tmp_path):
    """Reference mode (yolo_to_coco.py:172-213): labelme-schema JSON per
    image, absolute pixel coords, --class-map priority."""
    from PIL import Image

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.new("RGB", (200, 100)).save(tmp_path / "images" / "f1.png")
    (tmp_path / "labels" / "f1.txt").write_text("0 0.5 0.5 0.2 0.4\n1 0.25 0.25 0.1 0.1\n")
    result = run_tool("yolo_to_coco.py", tmp_path / "labels",
                      "-cm", "0=Car", "1=Bus", "-q")
    assert result.returncode == 0, result.stderr
    out = json.loads((tmp_path / "labels" / "f1.json").read_text())
    assert out["version"] == "5.5.0"
    assert out["imageWidth"] == 200 and out["imageHeight"] == 100
    assert [s["label"] for s in out["shapes"]] == ["Car", "Bus"]
    assert out["shapes"][0]["shape_type"] == "rectangle"
    assert out["shapes"][0]["points"] == [[80.0, 30.0], [120.0, 70.0]]


def test_yolo_to_coco_map_file(tmp_path):
    from PIL import Image

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.new("RGB", (50, 50)).save(tmp_path / "images" / "a.png")
    (tmp_path / "labels" / "a.txt").write_text("2 0.5 0.5 0.5 0.5\n")
    (tmp_path / "map.json").write_text('{"2": "Truck"}')
    result = run_tool("yolo_to_coco.py", tmp_path / "labels",
                      "-mf", tmp_path / "map.json", "-dp", "1",
                      "-ol", tmp_path / "out", "-ii", "../images", "-q")
    assert result.returncode == 0, result.stderr
    out = json.loads((tmp_path / "out" / "a.json").read_text())
    assert out["shapes"][0]["label"] == "Truck"
    assert out["shapes"][0]["points"] == [[12.5, 12.5], [37.5, 37.5]]


def test_viz_annotations_directory_mode(tmp_path):
    """Directory mode: rank by count respecting --type, save without show,
    skip-existing unless --overwrite (reference viz_annotations.py:203-246)."""
    from PIL import Image

    images = tmp_path / "images"
    labels = tmp_path / "labels"
    images.mkdir()
    labels.mkdir()
    # f1 has 2 class-0 boxes, f2 has 3 boxes but only 1 of class 0
    Image.new("RGB", (100, 80), (40, 40, 40)).save(images / "f1.png")
    Image.new("RGB", (100, 80), (40, 40, 40)).save(images / "f2.png")
    (labels / "f1.txt").write_text("0 0.3 0.3 0.2 0.2\n0 0.7 0.7 0.2 0.2\n")
    (labels / "f2.txt").write_text("1 0.5 0.5 0.2 0.2\n1 0.2 0.2 0.1 0.1\n0 0.8 0.2 0.1 0.1\n")
    out = tmp_path / "viz"
    result = run_tool("viz_annotations.py", images, "-a", labels, "--save",
                      "-n", "1", "--type", "0", "-o", out,
                      "-cn", "0:car", "1:bus", "-q")
    assert result.returncode == 0, result.stderr
    # top-1 respecting --type 0 is f1 (2 class-0 boxes vs 1)
    assert (out / "f1.png").exists()
    assert not (out / "f2.png").exists()
    rendered = np.asarray(Image.open(out / "f1.png"))
    assert (rendered != 40).any()  # boxes drawn


def test_viz_annotations_single_image(tmp_path):
    from PIL import Image

    root = tmp_path / "data"
    (root / "frames").mkdir(parents=True)
    (root / "labels").mkdir()
    Image.new("RGB", (60, 60), (10, 10, 10)).save(root / "frames" / "x.png")
    (root / "labels" / "x.txt").write_text("3 0.5 0.5 0.5 0.5\n")
    result = run_tool("viz_annotations.py", root / "frames" / "x.png",
                      "--save", "--no-show-labels", "-q")
    assert result.returncode == 0, result.stderr
    assert (root / "visualizations" / "x.png").exists()
