"""Path/naming helpers (mirrors reference tests/test_file_utils.py patterns)."""

from pathlib import Path

import pytest

from geotrax_tpu.utils.file_utils import (
    build_result_path,
    check_if_results_exist,
    detect_delimiter,
    determine_location_id,
    determine_suffix_and_fourcc,
    get_output_dir,
)


def test_default_result_paths():
    src = Path("/videos/U_video.mp4")
    assert build_result_path(src, "video") == src
    assert build_result_path(src, "processed") == Path("/videos/results/U_video.txt")
    assert build_result_path(src, "video_transformations") == Path("/videos/results/U_video_vid_transf.txt")
    assert build_result_path(src, "geo_transformations") == Path("/videos/results/U_video_geo_transf.txt")
    assert build_result_path(src, "georeferenced") == Path("/videos/results/U_video.csv")
    assert build_result_path(src, "visualized", viz_mode=3, ext="mp4") == Path(
        "/videos/results/U_video_mode_3.mp4"
    )
    assert build_result_path(src, "bogus") is None


def test_custom_output_cfg_postfixes():
    cfg = {"folder": "out", "tracks_postfix": "_trk"}
    src = Path("/videos/A.mp4")
    assert build_result_path(src, "processed", cfg) == Path("/videos/out/A_trk.txt")
    # missing keys fall back to historical defaults
    assert build_result_path(src, "video_transformations", cfg) == Path("/videos/out/A_vid_transf.txt")


def test_absolute_output_folder_shared():
    cfg = {"folder": "/shared/results"}
    assert get_output_dir(Path("/a/b/v.mp4"), cfg) == Path("/shared/results")


def test_check_if_results_exist(tmp_path):
    src = tmp_path / "V.mp4"
    out = tmp_path / "results"
    out.mkdir()
    (out / "V.txt").write_text("0,1,1,1,1,1\n")
    exists, path = check_if_results_exist(src, "processed")
    assert exists and path == out / "V.txt"
    exists, _ = check_if_results_exist(src, "georeferenced")
    assert not exists


@pytest.mark.parametrize(
    "name,expected",
    [("A1.mp4", "A"), ("2025-01-01_A_PM1.mp4", "A"), ("A1_AV.csv", "A"), ("UK_D10.mp4", "UK")],
)
def test_determine_location_id(name, expected):
    assert determine_location_id(Path(name)) == expected


def test_determine_location_id_failure_exits():
    with pytest.raises(SystemExit):
        determine_location_id(Path("12345.mp4"))


def test_detect_delimiter(tmp_path):
    f = tmp_path / "data.csv"
    f.write_text("a,b,c\n1,2,3\n")
    assert detect_delimiter(f) == ","
    g = tmp_path / "data.txt"
    g.write_text("1 2 3\n4 5 6\n")
    assert detect_delimiter(g) == " "


def test_suffix_and_fourcc_linux():
    suffix, fourcc = determine_suffix_and_fourcc()
    assert suffix in ("mp4", "avi")
    assert len(fourcc) == 4
