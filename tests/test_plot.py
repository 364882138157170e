"""Plotting stage: file discovery, data loading, figure generation (PDF
outputs), aggregation, and threshold alerts."""

import argparse
import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from geotrax_tpu.pipeline import _plot_impl as plot_impl

logger = logging.getLogger("test-plot")


def geo_csv(path: Path, vehicle_ids=(1, 2), n=30, speed=40.0):
    rows = []
    for vid in vehicle_ids:
        for t in range(n):
            rows.append({
                "Vehicle_ID": vid, "Frame_Number": t,
                "Ortho_X": 100 + 5 * t + vid * 50, "Ortho_Y": 200 + vid * 20,
                "Local_X": 170000 + t, "Local_Y": 532000 + vid,
                "Latitude": 37.39 + 1e-5 * t, "Longitude": 126.66 + 1e-5 * vid,
                "Vehicle_Length": 4.5 + vid * 0.5, "Vehicle_Width": 1.9,
                "Vehicle_Class": vid % 2, "Vehicle_Speed": speed + t * 0.1,
                "Vehicle_Acceleration": 0.1, "Road_Section": "1_2",
                "Lane_Number": 1, "Visibility": 1,
            })
    pd.DataFrame(rows).to_csv(path, index=False)


def make_args(**over):
    defaults = dict(
        input=None, save=True, show=False, cfg="default", output_folder=None,
        log_path=None, verbose=False, aggregate=None, ortho_folder=None,
        segmentation_folder=None, segmentations=None, id=0, points=None,
        class_filter=None, model=None, class_names=["0=car", "1=bus", "2=truck", "3=motorcycle"],
    )
    defaults.update(over)
    return argparse.Namespace(**defaults)


def test_read_trajectory_data_csv(tmp_path):
    path = tmp_path / "U_clip.csv"
    geo_csv(path)
    df = plot_impl.read_trajectory_data(path, logger)
    assert {"Vehicle_ID", "Local_X", "Vehicle_Speed"} <= set(df.columns)


def test_read_trajectory_data_txt_14col(tmp_path):
    path = tmp_path / "U_clip.txt"
    rows = [[t, 1, 10 + t, 20, 30, 12, 10 + t, 20, 30, 12, 0, 0.9, 30, 11] for t in range(5)]
    np.savetxt(path, np.array(rows), fmt="%g", delimiter=",")
    df = plot_impl.read_trajectory_data(path, logger)
    assert {"Unstab_X", "Stab_X", "Pixel_Length"} <= set(df.columns)


def test_determine_files_prefers_csv(tmp_path):
    results = tmp_path / "vids" / "results"
    results.mkdir(parents=True)
    geo_csv(results / "U_clip.csv")
    np.savetxt(results / "U_clip.txt", np.ones((3, 14)), delimiter=",")
    files = plot_impl.determine_files_to_process(
        tmp_path, {"skip_filenames_with": ["transf"]}, {"folder": "results"}, logger
    )
    assert files == [results / "U_clip.csv"]


def test_determine_files_skip_patterns(tmp_path):
    results = tmp_path / "results"
    results.mkdir()
    geo_csv(results / "U_clip.csv")
    np.savetxt(results / "U_clip_vid_transf.txt", np.ones((3, 10)), delimiter=",")
    files = plot_impl.determine_files_to_process(
        tmp_path, {"skip_filenames_with": ["bus", "ids", "transf"]},
        {"folder": "results"}, logger,
    )
    assert files == [results / "U_clip.csv"]


def test_plot_video_input_generates_pdfs(tmp_path):
    results = tmp_path / "results"
    results.mkdir()
    geo_csv(results / "U_clip.csv")
    args = make_args(input=results / "U_clip.csv")
    plot_impl.run_plotting(args, logger)
    plots = sorted(p.name for p in (results / "plots").glob("*.pdf"))
    expected_parts = [
        "Orthophoto_image_coordinates", "Local_planar_coordinates",
        "Geographic_coordinates", "Speed_distribution",
        "Acceleration_distribution", "Speed_and_acceleration_distribution",
        "Class_distribution", "Vehicle_length_distribution",
        "Vehicle_width_distribution",
    ]
    for part in expected_parts:
        assert any(part in p for p in plots), f"missing {part}: {plots}"


def test_plot_pixel_tracks_only(tmp_path):
    results = tmp_path / "results"
    results.mkdir()
    rows = [[t, 1, 10 + 3 * t, 20, 30, 12, 10 + 3 * t, 20, 30, 12, 0, 0.9, 30, 11]
            for t in range(20)]
    np.savetxt(results / "U_clip.txt", np.array(rows), fmt="%g", delimiter=",")
    args = make_args(input=results / "U_clip.txt")
    plot_impl.run_plotting(args, logger)
    plots = sorted(p.name for p in (results / "plots").glob("*.pdf"))
    assert any("Unstabilized_image_coordinates" in p for p in plots)
    assert any("Stabilized_image_coordinates" in p for p in plots)
    assert not any("Geographic" in p for p in plots)


def test_aggregate_by_location(tmp_path):
    for name in ("U_a", "U_b", "K_a"):
        results = tmp_path / name / "results"
        results.mkdir(parents=True)
        geo_csv(results / f"{name}_clip.csv")
    args = make_args(input=tmp_path, aggregate=True)
    plot_impl.run_plotting(args, logger)
    plots = [p.name for p in (tmp_path / "plots").glob("*.pdf")]
    assert any(p.startswith("U_") for p in plots)
    assert any(p.startswith("K_") for p in plots)


def test_threshold_alerts(tmp_path, caplog):
    path = tmp_path / "U_fast.csv"
    geo_csv(path, vehicle_ids=(1,), speed=95.0)  # above the 90 km/h alert
    df = plot_impl.read_trajectory_data(path, logger)
    with caplog.at_level(logging.WARNING, logger="test-plot"):
        plot_impl.report_high_value_instances(df, logger)
    assert any("km/h" in r.message for r in caplog.records)


def test_class_filter(tmp_path):
    path = tmp_path / "U_clip.csv"
    geo_csv(path, vehicle_ids=(1, 2))
    df = plot_impl.read_trajectory_data(path, logger)
    out = plot_impl.filter_classes(df, [0])
    assert (out["Vehicle_Class"] != 0).all()
