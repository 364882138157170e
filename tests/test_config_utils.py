"""Config system tests (mirrors reference tests/test_config_utils.py:57-111:
preset invariants, tracker-block validation, CLI backfill, class names)."""

import argparse
import logging

import pytest
import yaml

from geotrax_tpu.utils.config_utils import (
    CFG_DIR,
    TRACKER_CHOICES,
    backfill_args_from_config,
    load_config,
    resolve_class_names,
    resolve_config_path,
    select_tracker,
)

logger = logging.getLogger("test")

PRESETS = ["default", "confident", "lenient", "stable"]


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_loads_and_has_sections(preset):
    cfg = yaml.safe_load((CFG_DIR / f"{preset}.yaml").read_text())
    for section in (
        "input", "output", "processing", "batch", "extraction", "stabilo",
        "georef", "visualization", "plotting", "ultralytics", "tracker",
    ):
        assert section in cfg, f"{preset} missing section {section}"


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_has_all_tracker_blocks(preset):
    cfg = yaml.safe_load((CFG_DIR / f"{preset}.yaml").read_text())
    tracker = cfg["tracker"]
    assert tracker["active"] in TRACKER_CHOICES
    for name in TRACKER_CHOICES:
        assert name in tracker, f"{preset} missing tracker block {name}"
        block = tracker[name]
        for key in ("track_high_thresh", "track_low_thresh", "new_track_thresh",
                    "track_buffer", "match_thresh"):
            assert key in block
        if name != "tracktrack":  # tracktrack uses a multi-cue cost, no fuse_score
            assert "fuse_score" in block


def test_preset_resolution_by_bare_name():
    assert resolve_config_path("confident").name == "confident.yaml"
    assert resolve_config_path("confident").is_file()


def test_legacy_cfg_prefix_resolution():
    assert resolve_config_path("cfg/default.yaml").is_file()


def test_select_tracker_returns_active_block():
    cfg = yaml.safe_load((CFG_DIR / "default.yaml").read_text())
    name, params = select_tracker(cfg["tracker"], "default", logger)
    assert name == "botsort"
    assert params["tracker_type"] == "botsort"


def test_select_tracker_missing_block_exits():
    with pytest.raises(SystemExit):
        select_tracker({"active": "nonexistent"}, "cfg", logger)


def test_load_config_missing_file_exits():
    args_ns = argparse.Namespace(cfg="does_not_exist_12345.yaml")
    with pytest.raises(SystemExit):
        load_config(args_ns.cfg, logger)


def test_backfill_only_fills_none():
    args = argparse.Namespace(conf=None, iou=0.9)
    backfill_args_from_config(args, {"conf": 0.25, "iou": 0.7})
    assert args.conf == 0.25
    assert args.iou == 0.9  # CLI override preserved


def test_resolve_class_names_cli_precedence(tmp_path):
    mapping, source = resolve_class_names(
        tmp_path / "none.pt", ["0=car", "1=bus"], {0: "x"}, [0, 1], logger
    )
    assert source == "cli"
    assert mapping == {0: "car", 1: "bus"}


def test_resolve_class_names_config_fallback(tmp_path):
    mapping, source = resolve_class_names(
        tmp_path / "none.pt", None, {0: "vehicle", 1: "bus"}, None, logger
    )
    assert source == "config"
    assert mapping[0] == "vehicle"


def test_resolve_class_names_integer_fallback(tmp_path):
    mapping, source = resolve_class_names(tmp_path / "none.pt", None, None, [0, 1, 2, 3], logger)
    assert source == "fallback"
    assert mapping == {0: "0", 1: "1", 2: "2", 3: "3"}


def test_preset_diffs_vs_default():
    """The three non-default presets differ from default exactly as documented."""
    base = yaml.safe_load((CFG_DIR / "default.yaml").read_text())

    def diff(a, b, path=""):
        out = []
        for key in b:
            if isinstance(b[key], dict) and isinstance(a.get(key), dict):
                out += diff(a[key], b[key], f"{path}{key}.")
            elif a.get(key) != b[key]:
                out.append(f"{path}{key}")
        return sorted(out)

    confident = yaml.safe_load((CFG_DIR / "confident.yaml").read_text())
    assert diff(base, confident) == ["extraction.min_track_length", "ultralytics.conf", "ultralytics.iou"]

    lenient = yaml.safe_load((CFG_DIR / "lenient.yaml").read_text())
    assert diff(base, lenient) == [
        "tracker.botsort.match_thresh", "tracker.botsort.new_track_thresh",
        "tracker.botsort.track_buffer", "tracker.botsort.track_high_thresh",
        "ultralytics.conf", "ultralytics.iou", "ultralytics.max_det",
    ]

    stable = yaml.safe_load((CFG_DIR / "stable.yaml").read_text())
    assert diff(base, stable) == [
        "stabilo.clahe", "stabilo.downsample_ratio",
        "stabilo.filter_ratio", "stabilo.max_features",
    ]
