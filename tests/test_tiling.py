"""Spatial frame tiling (SURVEY §2.6): geometry coverage, cross-boundary
merge de-duplication, and mesh-sharded equivalence on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geotrax_tpu.parallel.tiling import (
    make_tiled_detector,
    merge_tile_detections,
    tile_geometry,
)


def test_tile_geometry_covers_frame_with_overlap():
    for width, n, ov in [(3840, 4, 128), (3840, 2, 64), (1920, 3, 32)]:
        geom = tile_geometry(width, n, ov)
        assert len(geom) == n
        tw = geom[0][1]
        assert all(g[1] == tw for g in geom)          # static shapes
        assert geom[0][0] == 0
        assert geom[-1][0] + tw == width              # right edge covered
        for (a, _), (b, _) in zip(geom, geom[1:]):
            assert b < a + tw                          # interiors overlap


def test_merge_dedupes_boundary_detections():
    """The same physical object detected by both neighbors of a boundary
    must come out as ONE box after the global merge."""
    K = 8
    boxes = np.zeros((2, K, 4), np.float32)
    scores = np.zeros((2, K), np.float32)
    classes = np.zeros((2, K), np.int32)
    valid = np.zeros((2, K), bool)
    # object at global x=1000 -> tile0 local x=1000, tile1 local x=1000-900=100
    boxes[0, 0] = [1000.0, 200.0, 40, 30]
    boxes[1, 0] = [100.5, 200.0, 40, 30]   # half-pixel disagreement
    scores[0, 0], scores[1, 0] = 0.9, 0.85
    valid[0, 0] = valid[1, 0] = True
    # a second, tile-1-only object
    boxes[1, 1] = [400.0, 300.0, 30, 30]
    scores[1, 1] = 0.8
    valid[1, 1] = True

    out = merge_tile_detections(
        {"boxes_xywh": jnp.asarray(boxes), "scores": jnp.asarray(scores),
         "classes": jnp.asarray(classes), "valid": jnp.asarray(valid)},
        x_offsets=[0.0, 900.0], iou=0.7, max_det=8,
    )
    v = np.asarray(out["valid"])
    kept = np.asarray(out["boxes_xywh"])[v]
    assert v.sum() == 2                                # duplicate suppressed
    xs = sorted(kept[:, 0].tolist())
    assert abs(xs[0] - 1000.0) < 1.0                   # higher-score survivor
    assert abs(xs[1] - 1300.0) < 1.0


def _small_detector(tmp_path, tiles, imgsz=96, src=(96, 512), max_det=32,
                    overlap=16):
    """Detector built from a random yolov8n .npz checkpoint with tiling on."""
    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import save_npz
    from geotrax_tpu.models.detector import Detector

    spec = yolov8.ModelSpec(variant="n", nc=4)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    path = tmp_path / "tiny.npz"
    save_npz(path, params, class_names={0: "car"}, variant="n", nc=4)
    cfg = {"imgsz": imgsz, "conf": 0.0, "iou": 0.7, "max_det": max_det,
           "agnostic_nms": True, "tiles": tiles, "tile_overlap": overlap}
    return Detector(path, cfg), params, spec


@pytest.mark.slow
def test_detector_tiles_matches_make_tiled_detector(tmp_path):
    """cfg ultralytics.tiles routes Detector.batch_trace through
    tiled_batch_trace; its chunk-batched merge must equal the reference
    single-frame tiled detector from this module."""
    det, params, spec = _small_detector(tmp_path, tiles=4)
    src_h, src_w = 96, 512
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (2, src_h, src_w, 3), np.uint8))

    batched = jax.jit(det.batch_trace(src_h, src_w))(frames)
    single = make_tiled_detector(
        params, spec, n_tiles=4, src_h=src_h, src_w=src_w, imgsz=96,
        conf=0.0, max_det=32, overlap=16,
    )
    for i in range(2):
        ref = single(frames[i])
        for k in ("boxes_xywh", "scores", "valid"):
            np.testing.assert_allclose(
                np.asarray(batched[k][i]), np.asarray(ref[k]),
                rtol=1e-5, atol=1e-4,
            )


@pytest.mark.slow
def test_extract_cli_tiles_e2e(tmp_path, monkeypatch):
    """`extract --tiles 2` drives the FUSED pipeline with merged tile
    detections end-to-end (synthetic reader, random tiny checkpoint):
    outputs written, tiling recorded in the run metadata."""
    import argparse
    import logging

    import yaml

    from geotrax_tpu.io.video import SyntheticVideoReader
    from geotrax_tpu.pipeline import _extract_impl

    reader = SyntheticVideoReader(width=256, height=96, n_frames=8)
    monkeypatch.setattr(
        _extract_impl, "open_reader", lambda source, start, stop, cfg: reader
    )
    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import save_npz

    spec = yolov8.ModelSpec(variant="n", nc=4)
    save_npz(tmp_path / "tiny.npz", yolov8.init_params(jax.random.PRNGKey(0), spec),
             class_names={0: "car"}, variant="n", nc=4)

    source = tmp_path / "V_tiles.mp4"
    source.write_bytes(b"placeholder")
    args = argparse.Namespace(
        source=source, cfg="default", output_folder=None, log_path=None,
        verbose=False, model=[str(tmp_path / "tiny.npz")], class_names=None,
        conf=None, classes=None, cut_frame_left=None, cut_frame_right=None,
        interpolate=False, show=None, tiles=2,
    )

    orig = _extract_impl.load_config_all

    def patched(a, lg, needs_model=True):
        cfg = orig(a, lg, needs_model)
        cfg["ultralytics"].update(
            imgsz=96, max_det=16, tile_overlap=16, classes=None)
        cfg["main"]["extraction"]["stabilize"] = False
        cfg["main"]["extraction"]["min_track_length"] = 1
        return cfg

    monkeypatch.setattr(_extract_impl, "load_config_all", patched)

    _extract_impl.run_extraction(args, logging.getLogger("test-tiles"))

    meta = yaml.safe_load(source.with_suffix(".yaml").read_text())
    assert meta["config"]["detection"]["tiles"] == 2
    assert meta["video"]["frames_processed"] == 8


@pytest.mark.slow
def test_tiled_detector_mesh_matches_single_device():
    """Sharding the tile axis over a ('data',) mesh must not change the
    detections (GSPMD partitioning is semantics-preserving)."""
    from jax.sharding import Mesh

    from geotrax_tpu.models import yolov8

    spec = yolov8.ModelSpec(variant="n", nc=4)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    src_h, src_w = 96, 512
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (src_h, src_w, 3), np.uint8))

    kw = dict(n_tiles=4, src_h=src_h, src_w=src_w, imgsz=96, conf=0.0,
              max_det=32, overlap=16)
    plain = make_tiled_detector(params, spec, **kw)(frame)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("data",))
    sharded = make_tiled_detector(params, spec, mesh=mesh, **kw)(frame)
    for k in ("boxes_xywh", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(plain[k]), np.asarray(sharded[k]), rtol=1e-5, atol=1e-4
        )
