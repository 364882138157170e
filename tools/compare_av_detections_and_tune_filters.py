"""Compare pipeline trajectories against probe-vehicle ground truth and tune
the kinematics smoothing filter.

Capability parity with reference tools/compare_av_detections_and_tune_filters.py
(the RTK-GNSS validation harness, SURVEY.md §2.7): given a georeferenced
pipeline CSV and a ground-truth probe log (frame, local x/y [, speed_kmh]),
(1) match the probe to the pipeline vehicle with the lowest mean position
error, (2) report position/speed RMSE, and (3) sweep the smoothing filter
settings (gaussian/savgol x kernel sizes) reporting the speed RMSE per
configuration so cfg georef.filtering can be tuned.

Usage:
  python tools/compare_av_detections_and_tune_filters.py PIPELINE.csv PROBE.csv \
      [--fps 29.97] [--kernels 6 10 14 20]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.pipeline._georeference_impl import (  # noqa: E402
    apply_filter,
    compute_speed,
)


def match_probe(pipeline: pd.DataFrame, probe: pd.DataFrame):
    """Vehicle_ID with the lowest mean distance to the probe positions."""
    merged_best, best_id, best_err = None, None, np.inf
    for vid, grp in pipeline.groupby("Vehicle_ID"):
        joined = grp.merge(probe, left_on="Frame_Number", right_on="frame",
                           suffixes=("", "_gt"))
        if len(joined) < 10:
            continue
        err = np.hypot(joined.Local_X - joined.x, joined.Local_Y - joined.y).mean()
        if err < best_err:
            best_err, best_id, merged_best = err, vid, joined
    return best_id, best_err, merged_best


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("pipeline_csv", type=Path)
    parser.add_argument("probe_csv", type=Path,
                        help="Ground truth: columns frame, x, y [, speed_kmh] (local CRS metres)")
    parser.add_argument("--fps", type=float, default=30000 / 1001)
    parser.add_argument("--kernels", type=int, nargs="+", default=[6, 10, 14, 20, 28])
    args = parser.parse_args()

    pipeline = pd.read_csv(args.pipeline_csv)
    probe = pd.read_csv(args.probe_csv)
    vid, pos_err, joined = match_probe(pipeline, probe)
    if vid is None:
        print("No pipeline vehicle overlaps the probe log.")
        return 1
    print(f"Probe matched to Vehicle_ID {vid}: mean position error {pos_err:.3f} m "
          f"over {len(joined)} frames")

    if "speed_kmh" in probe.columns:
        gt_speed = joined["speed_kmh"].to_numpy()
        pipe_speed = joined["Vehicle_Speed"].to_numpy()
        both = ~np.isnan(gt_speed) & ~np.isnan(pipe_speed)
        if both.any():
            rmse = float(np.sqrt(np.mean((gt_speed[both] - pipe_speed[both]) ** 2)))
            print(f"Pipeline speed RMSE vs probe: {rmse:.2f} km/h (current filter settings)")

        # filter sweep on the raw positions
        joined = joined.sort_values("Frame_Number")
        x = joined.Local_X.to_numpy()
        y = joined.Local_Y.to_numpy()
        print(f"\n{'filter':<10}{'kernel':>8}{'speed RMSE [km/h]':>20}")
        best = (None, None, np.inf)
        for filter_type in ("gaussian", "savgol"):
            for kernel in args.kernels:
                raw = compute_speed(x, y, args.fps)
                smooth = apply_filter(raw, kernel, filter_type) * 3.6
                smooth = np.insert(smooth, 0, np.nan)
                both = ~np.isnan(gt_speed) & ~np.isnan(smooth)
                if not both.any():
                    continue
                rmse = float(np.sqrt(np.mean((gt_speed[both] - smooth[both]) ** 2)))
                print(f"{filter_type:<10}{kernel:>8}{rmse:>20.3f}")
                if rmse < best[2]:
                    best = (filter_type, kernel, rmse)
        if best[0]:
            print(f"\nBest: filter_type={best[0]} kernel_size={best[1]} "
                  f"(RMSE {best[2]:.3f} km/h) -> set cfg georef.filtering accordingly")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
