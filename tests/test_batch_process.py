"""Batch orchestrator: skip-if-exists, overwrite prompting, stage selection,
exclusion filters (mirrors reference tests/test_batch_process.py patterns)."""

import argparse
import logging
from pathlib import Path
from unittest.mock import patch

import pytest

from geotrax_tpu.pipeline import batch

logger = logging.getLogger("test-batch")


def make_args(**over):
    defaults = dict(
        input=None, yes=False, overwrite=False, dry_run=False, viz_only=False,
        geo_only=False, plot_only=False, no_geo=False, folders_exclude=None,
        exclude_patterns=None, cfg="default", output_folder=None, log_path=None,
        verbose=False, model=None, class_names=None, conf=None, classes=None,
        cut_frame_left=None, cut_frame_right=None, interpolate=None,
        ortho_folder=None, geo_source=None, ref_frame=None, no_master=None,
        master_folder=None, recompute=None, segmentation_folder=None,
        save=False, show=False, viz_mode=[0], plot_trajectories=None,
        plot_delay=None, show_conf=None, show_lanes=None, show_class_names=None,
        hide_labels=None, hide_tracks=None, hide_speed=None, speed_unit=None,
        speed_deadzone=None, class_filter=None, tail_length=None, line_width=None,
        heading_smoothing=None, heading_min_speed=None, edge_clip_margin=None,
        edge_clip_smoothing=None, plot_save=False, plot_show=False,
        plot_aggregate=None, plot_points=None, plot_segmentations=None,
        plot_class_filter=None,
    )
    defaults.update(over)
    return argparse.Namespace(**defaults)


def test_filter_files_exclusions(tmp_path):
    files = [
        tmp_path / "videos" / "a.mp4",
        tmp_path / "results" / "b.mp4",
        tmp_path / "videos" / "skipme_c.mp4",
    ]
    args = make_args(folders_exclude=["results"], exclude_patterns=["skipme"])
    kept = batch.filter_files_to_process(files, args, logger)
    assert kept == [files[0]]


def test_handle_existing_no_overwrite(tmp_path):
    args = make_args(overwrite=False)
    assert batch.handle_existing_results(Path("v.mp4"), args, logger, exists=True, action="X") is False
    assert batch.handle_existing_results(Path("v.mp4"), args, logger, exists=False, action="X") is True


def test_handle_existing_overwrite_with_yes():
    args = make_args(overwrite=True, yes=True)
    assert batch.handle_existing_results(Path("v.mp4"), args, logger, exists=True, action="X") is True


def test_handle_existing_overwrite_prompts():
    args = make_args(overwrite=True, yes=False)
    with patch("builtins.input", return_value="y"):
        assert batch.handle_existing_results(Path("v.mp4"), args, logger, True, "X") is True
    with patch("builtins.input", return_value="n"):
        assert batch.handle_existing_results(Path("v.mp4"), args, logger, True, "X") is False


def test_should_process_georef_requires_tracks(tmp_path):
    video = tmp_path / "v.mp4"
    args = make_args()
    assert batch.should_process_file(video, args, logger, batch.ACTION_GEOREF) is False


def test_should_process_extract_skips_existing(tmp_path):
    video = tmp_path / "v.mp4"
    (tmp_path / "results").mkdir()
    (tmp_path / "results" / "v.txt").write_text("0,1,1,1,1,1\n")
    args = make_args(overwrite=False)
    assert batch.should_process_file(video, args, logger, batch.ACTION_EXTRACT) is False
    args = make_args(overwrite=True, yes=True)
    assert batch.should_process_file(video, args, logger, batch.ACTION_EXTRACT) is True


def test_dry_run_executes_nothing(tmp_path, monkeypatch):
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    calls = []
    monkeypatch.setattr(batch, "detect_track_stabilize", lambda a, lg: calls.append("extract"))
    monkeypatch.setattr(batch, "georeference", lambda a, lg: calls.append("geo"))
    monkeypatch.setattr(batch, "visualize_results", lambda a, lg: calls.append("viz"))
    args = make_args(input=video, dry_run=True, no_geo=True)
    batch.process_input(args, logger)
    assert calls == []


def test_single_file_stage_sequence(tmp_path, monkeypatch):
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    calls = []
    monkeypatch.setattr(batch, "detect_track_stabilize", lambda a, lg: calls.append("extract"))
    monkeypatch.setattr(batch, "georeference", lambda a, lg: calls.append("geo"))
    monkeypatch.setattr(batch, "visualize_results", lambda a, lg: calls.append("viz"))

    # no tracks yet: georef/viz are skipped with errors, extraction runs
    args = make_args(input=video, no_geo=True, save=False, show=False)
    batch.process_input(args, logger)
    assert calls == ["extract"]


def test_directory_scan(tmp_path, monkeypatch):
    (tmp_path / "d1").mkdir()
    (tmp_path / "results").mkdir()
    v1 = tmp_path / "d1" / "a.mp4"
    v2 = tmp_path / "results" / "b.mp4"  # excluded folder
    v1.write_bytes(b"x")
    v2.write_bytes(b"x")
    seen = []
    monkeypatch.setattr(batch, "process_file",
                        lambda f, a, lg, oc=None, **kw: seen.append(f))
    args = make_args(input=tmp_path, plot_save=False, plot_show=False)
    batch.process_input(args, logger)
    assert seen == [v1]


def test_geo_only_suppresses_visualization(tmp_path, monkeypatch):
    """--geo-only means ONLY georeferencing (its documented contract): the
    visualization stage must not run even with config save on."""
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    (tmp_path / "results").mkdir()
    (tmp_path / "results" / "v.txt").write_text("1,1,5,5,4,4,5,5,4,4,0,0.9,5,3\n")
    calls = []
    monkeypatch.setattr(batch, "detect_track_stabilize", lambda a, lg: calls.append("extract"))
    monkeypatch.setattr(batch, "georeference", lambda a, lg: calls.append("geo"))
    monkeypatch.setattr(batch, "visualize_results", lambda a, lg: calls.append("viz"))
    args = make_args(input=video, geo_only=True, save=None, show=None)
    batch.process_input(args, logger)
    assert calls == ["geo"]


def test_parallel_extracted_files_not_reextracted(tmp_path, monkeypatch):
    """The sequential per-file pass must skip extraction for files the
    parallel pre-pass handled — with --overwrite the skip-if-exists check
    answers True again and the work would silently double."""
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    calls = []
    monkeypatch.setattr(batch, "detect_track_stabilize", lambda a, lg: calls.append("extract"))
    args = make_args(input=video, no_geo=True, save=False, show=False,
                     overwrite=True, yes=True)
    batch.process_file(video, args, logger, None, extracted={video})
    assert calls == []
    batch.process_file(video, args, logger, None, extracted=set())
    assert calls == ["extract"]
