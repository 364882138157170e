"""Cut a merged session video into per-location clips with rebased logs.

Capability parity with reference tools/cut_merged_videos_and_logs.py (core
capability; the reference adds GPS-nearest auto-labeling against a location
table and I-frame snapping — here cut points come from an explicit plan or
from GPS hover segmentation of the flight log).

Usage (explicit plan):
  python tools/cut_merged_videos_and_logs.py MERGED.mp4 \
      --cuts "U=0:1800" "K=1900:3600" -o clips/

Usage (auto from hovers in the flight log):
  python tools/cut_merged_videos_and_logs.py MERGED.mp4 --auto -o clips/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403

from recut_video_and_log import recut  # noqa: E402


def hover_segments(log: pd.DataFrame, min_frames: int = 300,
                   max_speed_mps: float = 0.5) -> list:
    """[(start, end)] frame ranges where the drone hovers (low GPS speed)."""
    lat = log["latitude"].to_numpy()
    lon = log["longitude"].to_numpy()
    mean_lat = np.nanmean(lat)
    dx = np.gradient(lon) * 111320.0 * np.cos(np.deg2rad(mean_lat))
    dy = np.gradient(lat) * 111320.0
    fps = 30.0
    speed = np.hypot(dx, dy) * fps
    calm = speed < max_speed_mps
    segments = []
    start = None
    for i, c in enumerate(calm):
        if c and start is None:
            start = i
        elif not c and start is not None:
            if i - start >= min_frames:
                segments.append((int(log["frame"].iloc[start]), int(log["frame"].iloc[i])))
            start = None
    if start is not None and len(calm) - start >= min_frames:
        segments.append((int(log["frame"].iloc[start]), int(log["frame"].iloc[-1])))
    return segments


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("video", type=Path)
    parser.add_argument("--cuts", nargs="+", default=None,
                        help="LOC=start:end frame ranges")
    parser.add_argument("--auto", action="store_true",
                        help="Derive cut ranges from GPS hover segments in the flight log")
    parser.add_argument("--min-hover-frames", type=int, default=300)
    parser.add_argument("--out", "-o", type=Path, required=True)
    args = parser.parse_args()

    plans = []
    if args.cuts:
        for entry in args.cuts:
            loc, rng = entry.split("=")
            start, end = (int(v) for v in rng.split(":"))
            plans.append((loc, start, end))
    elif args.auto:
        log_path = args.video.with_suffix(".csv")
        if not log_path.exists():
            parser.error(f"--auto needs the flight log {log_path}")
        log = pd.read_csv(log_path)
        for i, (start, end) in enumerate(hover_segments(log, args.min_hover_frames)):
            plans.append((f"H{i}", start, end))
        if not plans:
            print("No hover segments found.")
            return 1
    else:
        parser.error("Provide --cuts or --auto.")

    args.out.mkdir(parents=True, exist_ok=True)
    for loc, start, end in plans:
        out = args.out / f"{loc}_{args.video.stem}.mp4"
        recut(args.video, start, end, out, cut_log=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
