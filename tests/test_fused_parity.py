"""Fused-vs-sequential full-output parity (VERDICT r2 weak #4 / next #4).

The production default routes extraction through the fused device pipeline
(pipeline/device_pipeline.py); the sequential per-frame loop remains the
fallback (RT-DETR, multi-level stabilizers). The two implementations must
not drift: this runs the SAME hermetic video + oracle detections through
both paths — stabilization, GMC and ReID all ON — and compares every output
column.

Both paths derive their per-frame RANSAC key as fold_in(base, frame_id)
(device_pipeline._chunk_impl / Stabilizer.stabilize), so they draw identical
sample streams and every output column must be EXACTLY equal — no tolerance.
"""

import argparse
import logging

import numpy as np
import pytest

from geotrax_tpu.io.video import SyntheticVideoReader
from geotrax_tpu.models.detector import OracleDetector, SequentialOnly
from geotrax_tpu.pipeline import _extract_impl


def _extract(tmp_path, monkeypatch, sequential: bool, subdir: str):
    out_dir = tmp_path / subdir
    out_dir.mkdir()
    reader = SyntheticVideoReader(width=320, height=240, n_frames=20)

    def boxes_by_frame(idx):
        return [list(b) + [0.9, 0] for b in reader.boxes_at(idx)]

    detector = OracleDetector(boxes_by_frame)
    if sequential:
        detector = SequentialOnly(detector)
    monkeypatch.setattr(_extract_impl, "load_detector", lambda cfg, log: detector)
    monkeypatch.setattr(
        _extract_impl, "open_reader", lambda source, start, stop, cfg: reader
    )

    orig = _extract_impl.load_config_all

    def patched(a, lg, needs_model=True):
        cfg = orig(a, lg, needs_model)
        cfg["main"]["tracker_params"]["with_reid"] = True
        cfg["main"]["tracker_params"]["gmc_method"] = "sparseOptFlow"
        return cfg

    monkeypatch.setattr(_extract_impl, "load_config_all", patched)

    source = out_dir / "V_par.mp4"
    source.write_bytes(b"placeholder")
    dummy_model = tmp_path / "unused.npz"
    if not dummy_model.exists():
        np.savez(dummy_model, **{"param:none": np.zeros(1)})

    args = argparse.Namespace(
        source=source, cfg="default", output_folder=None, log_path=None,
        verbose=False, model=[str(dummy_model)], class_names=["0=car"],
        conf=None, classes=None, cut_frame_left=None, cut_frame_right=None,
        interpolate=False, show=None,
    )
    _extract_impl.run_extraction(args, logging.getLogger("test-parity"))
    tracks = np.loadtxt(out_dir / "results" / "V_par.txt", delimiter=",")
    transf = np.loadtxt(out_dir / "results" / "V_par_vid_transf.txt", delimiter=",")
    return tracks, transf


@pytest.mark.slow
def test_fused_matches_sequential_full_output(tmp_path, monkeypatch):
    t_fused, h_fused = _extract(tmp_path, monkeypatch, sequential=False, subdir="fused")
    t_seq, h_seq = _extract(tmp_path, monkeypatch, sequential=True, subdir="seq")

    assert t_fused.shape == t_seq.shape, (
        f"row counts differ: fused {t_fused.shape} vs sequential {t_seq.shape}"
    )
    # identity columns: frame, id, class — exact
    np.testing.assert_array_equal(t_fused[:, 0], t_seq[:, 0], err_msg="frame ids drift")
    np.testing.assert_array_equal(t_fused[:, 1], t_seq[:, 1], err_msg="track ids drift")
    np.testing.assert_array_equal(t_fused[:, 10], t_seq[:, 10], err_msg="classes drift")
    # scores: exact (oracle-supplied, no float path difference)
    np.testing.assert_array_equal(t_fused[:, 11], t_seq[:, 11])
    # geometry: boxes + stabilized boxes — same fold_in(base, fid) RANSAC
    # keys, same op stack -> bit-equal
    np.testing.assert_array_equal(
        t_fused[:, 2:6], t_seq[:, 2:6], err_msg="tracked boxes drift"
    )
    np.testing.assert_array_equal(
        t_fused[:, 6:10], t_seq[:, 6:10], err_msg="stabilized boxes drift"
    )
    # transforms: one row per non-reference frame, bit-equal homographies
    assert h_fused.shape == h_seq.shape
    np.testing.assert_array_equal(h_fused[:, 0], h_seq[:, 0])
    np.testing.assert_array_equal(h_fused[:, 1:], h_seq[:, 1:])


def test_oracle_detector_supports_both_paths():
    """OracleDetector fuses (table-gather batch_trace); SequentialOnly hides
    batch_trace so the sequential loop stays reachable in tests."""
    oracle = OracleDetector(lambda i: [[10.0, 10.0, 5.0, 5.0, 0.9, 0]], max_det=4)
    assert hasattr(oracle, "batch_trace")
    assert not hasattr(SequentialOnly(oracle), "batch_trace")

    import jax.numpy as jnp

    run = oracle.batch_trace(64, 64)
    det = run(jnp.zeros((2, 64, 64, 3), jnp.uint8), jnp.asarray([1, 2]))
    assert bool(det["valid"][0, 0]) and float(det["boxes_xywh"][0, 0, 0]) == 10.0
