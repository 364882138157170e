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
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (400, 400, 3), np.uint8)).save(tmp_path / "mosaic.png")
    result = run_tool("subset_orthophoto.py", tmp_path / "mosaic.png",
                      "--centers", "U=200,200", "--width", "100", "--out", tmp_path / "o")
    assert result.returncode == 0, result.stderr
    assert (tmp_path / "o" / "U.png").exists()
    assert (tmp_path / "o" / "U_center.txt").read_text().strip() == "200 200"
    with Image.open(tmp_path / "o" / "U.png") as img:
        assert img.size == (100, 100)


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
        "Vehicle_ID": [1, 2], "Vehicle_Speed": [150.0, 50.0],
        "Vehicle_Acceleration": [1.0, -14.0],
    }).to_csv(tmp_path / "d.csv", index=False)
    result = run_tool("check_dataset.py", tmp_path / "d.csv")
    assert result.returncode == 0
    assert "speed > 130" in result.stdout
    assert "[1]" in result.stdout and "[2]" in result.stdout


def test_analyze_bb_ratios(tmp_path):
    (tmp_path / "a.txt").write_text("0 0.5 0.5 0.4 0.2\n1 0.5 0.5 0.3 0.1\n")
    result = run_tool("analyze_bb_ratios.py", tmp_path)
    assert result.returncode == 0, result.stderr
    assert "car" in result.stdout and "2.00" in result.stdout
    assert "bus" in result.stdout and "3.00" in result.stdout


def test_compare_tracking(tmp_path):
    for name, n in (("a", 20), ("b", 10)):
        d = tmp_path / name
        d.mkdir()
        rows = [[t, 1, 10, 10, 5, 5, 0, 0.9, 5, 5] for t in range(n)]
        np.savetxt(d / "V.txt", np.array(rows), fmt="%g", delimiter=",")
    result = run_tool("compare_tracking.py", tmp_path / "a", tmp_path / "b")
    assert result.returncode == 0, result.stderr
    assert "KL(" in result.stdout
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


def test_recut_video_and_log(tmp_path):
    cv2 = pytest.importorskip("cv2")
    video = tmp_path / "U.mp4"
    writer = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(20):
        writer.write(np.full((48, 64, 3), i * 10 % 255, np.uint8))
    writer.release()
    pd.DataFrame({"frame": range(20), "timestamp": ["t"] * 20}).to_csv(
        tmp_path / "U.csv", index=False)
    result = run_tool("recut_video_and_log.py", video, "-s", "5", "-e", "15",
                      "-o", tmp_path / "cut.mp4", "-ec")
    assert result.returncode == 0, result.stderr
    cap = cv2.VideoCapture(str(tmp_path / "cut.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    cap.release()
    log = pd.read_csv(tmp_path / "cut.csv")
    assert log["frame"].tolist() == list(range(10))


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
                      "--frame-size", "3840", "2160")
    assert result.returncode == 0, result.stderr
    assert (tmp_path / "V_dim_track3.pdf").exists()


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
                      tmp_path / "p.csv", tmp_path / "gt.csv", "--fps", "10")
    assert result.returncode == 0, result.stderr
    assert "Vehicle_ID 7" in result.stdout
    assert "Best: filter_type=" in result.stdout
