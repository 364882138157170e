"""Process-level extractor cache: repeated same-config extract calls reuse
ONE loaded detector + ONE traced fused program (pipeline/_extract_impl.py
_EXTRACT_CACHE) and still produce bit-identical outputs after
FusedExtractor.reset(). This is what makes `batch` over a directory tree pay
the minutes-scale fused-program trace once, not per video — the reference
pays its model-load once per process too (reference extract.py:217-236).
"""

import argparse
import logging

import numpy as np
import pytest

from geotrax_tpu.io.video import SyntheticVideoReader
from geotrax_tpu.pipeline import _extract_impl


@pytest.fixture(autouse=True)
def _clear_cache():
    _extract_impl._EXTRACT_CACHE.clear()
    yield
    _extract_impl._EXTRACT_CACHE.clear()


def _tiny_model(tmp_path):
    import jax

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import save_npz

    spec = yolov8.ModelSpec(variant="n", nc=4)
    path = tmp_path / "tiny.npz"
    save_npz(path,
             jax.device_get(yolov8.init_params(jax.random.PRNGKey(0), spec)),
             class_names={0: "car", 1: "bus", 2: "truck", 3: "motorcycle"},
             variant="n", nc=4)
    return path


def _run(tmp_path, monkeypatch, model_path, subdir):
    out_dir = tmp_path / subdir
    out_dir.mkdir()
    monkeypatch.setattr(
        _extract_impl, "open_reader",
        lambda source, start, stop, cfg: SyntheticVideoReader(
            width=320, height=240, n_frames=12),
    )
    orig = _extract_impl.load_config_all

    def patched(a, lg, needs_model=True):
        cfg = orig(a, lg, needs_model)
        cfg["ultralytics"]["imgsz"] = 64
        cfg["ultralytics"]["half"] = False
        cfg["ultralytics"]["conf"] = 0.0
        cfg["ultralytics"]["max_det"] = 16
        return cfg

    monkeypatch.setattr(_extract_impl, "load_config_all", patched)
    source = out_dir / "V_cache.mp4"
    source.write_bytes(b"placeholder")
    args = argparse.Namespace(
        source=source, cfg="default", output_folder=None, log_path=None,
        verbose=False, model=[str(model_path)], class_names=None,
        conf=None, classes=None, cut_frame_left=None, cut_frame_right=None,
        interpolate=False, show=None,
    )
    _extract_impl.run_extraction(args, logging.getLogger("test-cache"))
    transf = np.loadtxt(out_dir / "results" / "V_cache_vid_transf.txt",
                        delimiter=",")
    tracks_path = out_dir / "results" / "V_cache.txt"
    tracks = (np.loadtxt(tracks_path, delimiter=",")
              if tracks_path.exists() and tracks_path.stat().st_size else None)
    return tracks, transf


@pytest.mark.slow
def test_second_extract_reuses_cache_and_matches(tmp_path, monkeypatch):
    model = _tiny_model(tmp_path)

    calls = []
    orig_load = _extract_impl.load_detector
    monkeypatch.setattr(
        _extract_impl, "load_detector",
        lambda cfg, log: calls.append(1) or orig_load(cfg, log))

    t1, h1 = _run(tmp_path, monkeypatch, model, "first")
    assert len(_extract_impl._EXTRACT_CACHE) == 1
    entry = next(iter(_extract_impl._EXTRACT_CACHE.values()))
    fx_map = entry[-1]
    assert len(fx_map) == 1
    fx_first = next(iter(fx_map.values()))

    t2, h2 = _run(tmp_path, monkeypatch, model, "second")
    # one weight load, one traced extractor, identical per-video outputs
    assert calls == [1]
    assert next(iter(fx_map.values())) is fx_first
    np.testing.assert_array_equal(h1, h2)
    if t1 is not None or t2 is not None:
        np.testing.assert_array_equal(t1, t2)


@pytest.mark.slow
def test_config_change_misses_cache(tmp_path, monkeypatch):
    model = _tiny_model(tmp_path)
    _run(tmp_path, monkeypatch, model, "first")
    assert len(_extract_impl._EXTRACT_CACHE) == 1

    # different tracker => different key (different fused program)
    orig = _extract_impl.load_config_all

    def patched(a, lg, needs_model=True):
        cfg = orig(a, lg, needs_model)
        cfg["ultralytics"]["imgsz"] = 64
        cfg["ultralytics"]["half"] = False
        cfg["ultralytics"]["conf"] = 0.0
        cfg["ultralytics"]["max_det"] = 16
        import yaml

        from geotrax_tpu.utils.config_utils import CFG_DIR

        blocks = yaml.safe_load((CFG_DIR / "default.yaml").read_text())["tracker"]
        cfg["main"]["tracker_active"] = "bytetrack"
        cfg["main"]["tracker_params"] = blocks["bytetrack"]
        return cfg

    monkeypatch.setattr(_extract_impl, "load_config_all", patched)
    monkeypatch.setattr(
        _extract_impl, "open_reader",
        lambda source, start, stop, cfg: SyntheticVideoReader(
            width=320, height=240, n_frames=12),
    )
    out_dir = tmp_path / "third"
    out_dir.mkdir()
    source = out_dir / "V_cache.mp4"
    source.write_bytes(b"placeholder")
    args = argparse.Namespace(
        source=source, cfg="default", output_folder=None, log_path=None,
        verbose=False, model=[str(model)], class_names=None,
        conf=None, classes=None, cut_frame_left=None, cut_frame_right=None,
        interpolate=False, show=None,
    )
    _extract_impl.run_extraction(args, logging.getLogger("test-cache"))
    assert len(_extract_impl._EXTRACT_CACHE) == 2
