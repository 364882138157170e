"""Songdo-scale rehearsal (BASELINE config 5, reference README.md:378-384).

The reference campaign scaled by running the pipeline per-video/per-drone and
merging with `geotrax aggregate` (reference aggregate.py:77-181). This test
rehearses that deployment shape end-to-end on the 8-virtual-device CPU mesh:

    PROCESSED tree (1 date, 8 drones, 2 locations, 12 videos)
      -> `batch --parallel-videos 8 --devices 8`   (mesh-sharded lockstep
         extraction for the first group of 8; sequential for the remainder;
         then per-video georeferencing)
      -> `aggregate`                               (ID offsetting + merge)

and asserts the aggregated dataset's correctness: one CSV per
(date, location, session), vehicle IDs unique across drones after
offsetting, Drone_ID/Local_Time columns, the fixed 17-column order
(reference aggregate.py:132-154), and zip archives per (date, location).
"""

import argparse
import logging
import time
import zipfile

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from geotrax_tpu.io.video import SyntheticVideoReader, VideoInfo

logger = logging.getLogger("test-songdo")

DATE = "2022-10-04"
SESSION = "S1"
N_FRAMES = 20
W, H = 320, 240
FPS = 30.0
# (location, drone) pairs: location A flown by 8 drones, B by 4 -> 12 videos,
# the first same-resolution group of 8 goes through the mesh-sharded lockstep
# path, the remaining 4 through the sequential fallback loop.
VIDEOS = [("A", k) for k in range(1, 9)] + [("B", k) for k in range(1, 5)]


def _reader_for(loc: str, drone: int) -> SyntheticVideoReader:
    # per-location background (same seed -> registration vs the location
    # ortho is ~identity); per-drone box motion so tracks differ per video
    boxes = [
        {"xy0": (40.0 + 10 * drone, 60.0), "v": (2.0, 0.4), "wh": (30, 12),
         "color": (255, 40, 40)},
        {"xy0": (250.0, 180.0 - 8 * drone), "v": (-1.8, -0.3), "wh": (24, 10),
         "color": (40, 255, 40)},
    ]
    return SyntheticVideoReader(width=W, height=H, n_frames=N_FRAMES,
                                fps=FPS, boxes=boxes,
                                seed=11 if loc == "A" else 23)


class TreeOracle:
    """Oracle detector serving both the lockstep batch interface and the
    sequential per-frame interface, keyed by source path."""

    max_det = 8
    class_names = {0: "car"}
    is_rtdetr = False

    def __init__(self, readers_by_source):
        self.by_source = readers_by_source  # {str(path): reader}
        self._batch_order = None
        self._frame = 0

    def bind_group(self, sources):
        self._batch_order = [str(s) for s in sources]
        self._frame = 0

    def _det(self, reader, idx):
        b = np.zeros((self.max_det, 4), np.float32)
        s = np.zeros((self.max_det,), np.float32)
        c = np.full((self.max_det,), -1, np.int32)
        v = np.zeros((self.max_det,), bool)
        for i, box in enumerate(reader.boxes_at(idx)):
            b[i] = box
            s[i] = 0.9
            c[i] = 0
            v[i] = True
        return b, s, c, v

    def detect_batch(self, stacked):
        live = [s for s in self._batch_order
                if self.by_source[s].n_frames > self._frame]
        assert stacked.shape[0] == len(live)
        outs = [self._det(self.by_source[s], self._frame) for s in live]
        self._frame += 1
        return {
            "boxes_xywh": jnp.asarray(np.stack([o[0] for o in outs])),
            "scores": jnp.asarray(np.stack([o[1] for o in outs])),
            "classes": jnp.asarray(np.stack([o[2] for o in outs])),
            "valid": jnp.asarray(np.stack([o[3] for o in outs])),
        }

    def for_source(self, source):
        reader = self.by_source[str(source)]
        oracle = self

        class _Seq:
            max_det = oracle.max_det
            class_names = oracle.class_names
            is_rtdetr = False

            def __call__(self, frame, frame_index=0):
                b, s, c, v = oracle._det(reader, frame_index)
                return {
                    "boxes_xywh": jnp.asarray(b), "scores": jnp.asarray(s),
                    "classes": jnp.asarray(c), "valid": jnp.asarray(v),
                }

        return _Seq()


def build_tree(tmp_path):
    """PROCESSED/<date>/D<k>/<session>/<loc>_D<k>.mp4 + flight logs + ortho
    and segmentation assets per location."""
    processed = tmp_path / "PROCESSED"
    readers = {}
    for loc, k in VIDEOS:
        vdir = processed / DATE / f"D{k}" / SESSION
        vdir.mkdir(parents=True, exist_ok=True)
        video = vdir / f"{loc}_D{k}.mp4"
        video.write_bytes(b"placeholder")
        pd.DataFrame({
            "frame": range(N_FRAMES),
            "timestamp": [
                f"2022-10-04 10:0{k % 10}:{10 + i // 30:02d}.{(i % 30) * 33:03d}"
                for i in range(N_FRAMES)
            ],
        }).to_csv(video.with_suffix(".csv"), index=False)
        readers[str(video)] = _reader_for(loc, k)

    from PIL import Image

    ortho_dir = tmp_path / "ORTHOPHOTOS"
    seg_dir = tmp_path / "SEGMENTATIONS"
    ortho_dir.mkdir()
    seg_dir.mkdir()
    for loc in ("A", "B"):
        bg = _reader_for(loc, 1)._bg
        Image.fromarray(bg).save(ortho_dir / f"{loc}.png")
        (ortho_dir / f"{loc}.txt").write_text("126.66 37.39 1e-6 -1e-6\n")
        (seg_dir / f"{loc}.csv").write_text(
            "section,lane,tlx,tly,blx,bly,brx,bry,trx,try\n"
            f"1_2,1,0,0,0,{H},{W},{H},{W},0\n"
        )
    return processed, ortho_dir, seg_dir, readers


def make_batch_args(processed, ortho_dir, seg_dir, **over):
    defaults = dict(
        input=processed, yes=True, overwrite=False, dry_run=False,
        viz_only=False, geo_only=False, plot_only=False, no_geo=False,
        parallel_videos=8, devices=8, folders_exclude=None,
        exclude_patterns=None, cfg="default", output_folder=None,
        log_path=None, verbose=False, model=["unused.npz"],
        class_names=["0=car"], conf=None, classes=None, cut_frame_left=0,
        cut_frame_right=None, interpolate=False, show=None, tiles=None,
        profile=None, ortho_folder=ortho_dir, geo_source=None, ref_frame=None,
        no_master=True, master_folder=None, recompute=None,
        segmentation_folder=seg_dir,
        save=False, show_conf=None, viz_mode=[0], plot_trajectories=None,
        plot_delay=None, show_lanes=None, show_class_names=None,
        hide_labels=None, hide_tracks=None, hide_speed=None, speed_unit=None,
        speed_deadzone=None, class_filter=None, tail_length=None,
        line_width=None, heading_smoothing=None, heading_min_speed=None,
        edge_clip_margin=None, edge_clip_smoothing=None, plot_save=False,
        plot_show=False, plot_aggregate=None, plot_points=None,
        plot_segmentations=None, plot_class_filter=None,
    )
    defaults.update(over)
    return argparse.Namespace(**defaults)


@pytest.fixture
def rehearsal_tree(tmp_path, monkeypatch):
    processed, ortho_dir, seg_dir, readers = build_tree(tmp_path)
    oracle = TreeOracle(readers)

    from geotrax_tpu.io import video as video_mod
    from geotrax_tpu.parallel import extract_batch
    from geotrax_tpu.pipeline import _extract_impl as impl
    from geotrax_tpu.pipeline import _georeference_impl as geo_impl

    # during the lockstep group call, load_detector hands out the batch
    # oracle; for per-file sequential extraction it hands out a per-source
    # frame oracle (mirrors the real Detector's two interfaces)
    mode = {"parallel": False}

    def fake_load_detector(cfg, lg):
        if mode["parallel"]:
            return oracle
        return oracle.for_source(cfg["main"]["args"].source)

    monkeypatch.setattr(impl, "load_detector", fake_load_detector)
    monkeypatch.setattr(
        impl, "open_reader", lambda s, a, b, c: readers[str(s)]
    )
    monkeypatch.setattr(
        video_mod, "probe_video",
        lambda s: VideoInfo(W, H, FPS, N_FRAMES),
    )
    monkeypatch.setattr(
        geo_impl, "get_video_data",
        lambda source, ref, lg: (
            readers[str(source)]._bg.copy(), (H, W), FPS
        ),
    )

    orig_batch = extract_batch.extract_videos_batch

    def batch_with_binding(sources, args, config, lg):
        oracle.bind_group(sources)
        mode["parallel"] = True
        try:
            return orig_batch(sources, args, config, lg)
        finally:
            mode["parallel"] = False

    monkeypatch.setattr(extract_batch, "extract_videos_batch", batch_with_binding)

    from geotrax_tpu.utils import config_utils

    orig_load = config_utils.load_config_all

    def patched_load(a, lg, needs_model=True):
        cfg = orig_load(a, lg, needs_model=False)
        cfg["main"]["tracker_active"] = "bytetrack"
        cfg["main"]["tracker_params"] = {
            "track_high_thresh": 0.25, "track_low_thresh": 0.1,
            "new_track_thresh": 0.25, "track_buffer": 30,
            "match_thresh": 0.8, "fuse_score": True,
        }
        # stabilization ON (georeferencing needs the 14-col stabilized
        # layout) at a small feature budget sized for the 320x240 synthetics
        cfg["main"]["extraction"]["stabilize"] = True
        cfg["main"]["extraction"]["min_track_length"] = 3
        cfg["stabilo"]["max_features"] = 512
        cfg["stabilo"]["ransac_max_iter"] = 2000
        cfg["ultralytics"]["max_det"] = 8
        if "georef" in cfg:
            cfg["georef"]["matching"]["max_features"] = 2000
            cfg["georef"]["filtering"]["min_traj_length"] = 3
        return cfg

    # all three call sites: the lockstep group loader (batch.py imports from
    # config_utils inside run_parallel_extraction), the sequential extractor,
    # and the georeferencing stage
    monkeypatch.setattr(config_utils, "load_config_all", patched_load)
    monkeypatch.setattr(impl, "load_config_all", patched_load)
    monkeypatch.setattr(geo_impl, "load_config_all", patched_load)
    return processed, ortho_dir, seg_dir


@pytest.mark.slow
def test_songdo_rehearsal_batch_then_aggregate(rehearsal_tree, caplog):
    """The full campaign shape: mesh-parallel batch over the tree, then
    aggregation with correct ID offsetting — wall-clock reported."""
    processed, ortho_dir, seg_dir = rehearsal_tree
    from geotrax_tpu.pipeline import aggregate as agg
    from geotrax_tpu.pipeline import batch

    args = make_batch_args(processed, ortho_dir, seg_dir)
    t0 = time.perf_counter()
    with caplog.at_level(logging.INFO):
        batch.process_input(args, logger)
    t_batch = time.perf_counter() - t0

    # the first group of 8 went through the mesh-sharded lockstep path
    assert any("sharded over 8 devices" in r.message for r in caplog.records), \
        "lockstep group did not shard over the virtual mesh"

    # every video has extraction + georeferencing outputs
    for loc, k in VIDEOS:
        base = processed / DATE / f"D{k}" / SESSION / "results"
        assert (base / f"{loc}_D{k}.txt").exists(), f"missing tracks {loc}_D{k}"
        assert (base / f"{loc}_D{k}.csv").exists(), f"missing georef CSV {loc}_D{k}"

    # ---- aggregate
    agg_args = argparse.Namespace(
        input=processed, output_folder=None, cfg="default",
        log_path=None, verbose=False,
    )
    t0 = time.perf_counter()
    agg.aggregate_results(agg_args, logger)
    t_agg = time.perf_counter() - t0

    dataset = processed.parent / "DATASET"
    for loc, n_drones in (("A", 8), ("B", 4)):
        out_csv = dataset / f"{DATE}_{loc}" / f"{DATE}_{loc}_{SESSION}.csv"
        assert out_csv.exists(), f"missing aggregated CSV for {loc}"
        merged = pd.read_csv(out_csv)
        assert list(merged.columns) == agg.AGGREGATED_COLUMNS
        assert set(merged["Drone_ID"].unique()) == set(range(1, n_drones + 1))

        # ID-offset correctness: per-drone uniques are disjoint and their
        # count sums to the merged unique count (reference aggregate.py:132)
        per_drone_ids = [
            set(merged.loc[merged["Drone_ID"] == d, "Vehicle_ID"])
            for d in range(1, n_drones + 1)
        ]
        for i in range(len(per_drone_ids)):
            for j in range(i + 1, len(per_drone_ids)):
                assert not (per_drone_ids[i] & per_drone_ids[j]), \
                    f"{loc}: drones {i + 1} and {j + 1} share vehicle IDs"
        assert merged["Vehicle_ID"].nunique() == sum(map(len, per_drone_ids))
        # Local_Time derived from the flight-log timestamps
        assert merged["Local_Time"].str.match(r"10:0\d:\d\d\.\d{3}").all()

        assert (dataset / f"{DATE}_{loc}.zip").exists()
        with zipfile.ZipFile(dataset / f"{DATE}_{loc}.zip") as zf:
            assert f"{DATE}_{loc}_{SESSION}.csv" in zf.namelist()

    n_rows = sum(
        len(pd.read_csv(dataset / f"{DATE}_{loc}" / f"{DATE}_{loc}_{SESSION}.csv"))
        for loc in ("A", "B")
    )
    print(
        f"\nSongdo rehearsal: 12 videos x {N_FRAMES} frames "
        f"batch={t_batch:.1f}s aggregate={t_agg:.2f}s "
        f"aggregated_rows={n_rows}"
    )
