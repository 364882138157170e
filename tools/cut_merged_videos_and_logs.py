"""Cut a merged session video into per-location clips with rebased logs.

Capability parity with reference tools/cut_merged_videos_and_logs.py:
cut points come from an explicit plan or from GPS hover segmentation of the
flight log (CSV or the merged DJI .srt via tools/dji_srt.py); hover segments
are auto-labeled with the GPS-nearest named location from a --locations
JSON ({"U": [lat, lon], ...}); cut starts snap backward onto the nearest
video keyframe (--snap-keyframes, packet-level I-frame scan through the
native decoder) so re-encodes begin cleanly; each clip gets a rebased
per-cut CSV flight log.

Usage (explicit plan):
  python tools/cut_merged_videos_and_logs.py MERGED.mp4 \
      --cuts "U=0:1800" "K=1900:3600" -o clips/

Usage (auto from hovers + named locations):
  python tools/cut_merged_videos_and_logs.py MERGED.mp4 --auto \
      --locations locations.json --snap-keyframes -o clips/
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403

import dji_srt  # noqa: E402
from recut_video_and_log import recut  # noqa: E402


def nearest_location(locations: dict, lat: float, lon: float) -> str:
    """GPS-nearest named location (equirectangular metric — the candidates
    are hundreds of meters apart, the hover jitter is centimeters)."""
    best, best_d = None, float("inf")
    for name, (llat, llon) in locations.items():
        dx = (lon - llon) * 111320.0 * np.cos(np.deg2rad(lat))
        dy = (lat - llat) * 111320.0
        d = float(np.hypot(dx, dy))
        if d < best_d:
            best, best_d = name, d
    return best


def load_flight_log(video: Path, parser) -> pd.DataFrame:
    """Flight log for a merged video: <stem>.csv when usable, else the
    merged .srt telemetry (shared resolver, columns normalized)."""
    log = dji_srt.flight_log(video, prefer="csv")
    if log is None:
        parser.error(f"--auto needs a usable flight log next to {video} (.csv or .srt)")
    return log


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
    parser.add_argument("--locations", type=Path, default=None,
                        help='JSON {"name": [lat, lon], ...}: auto-label each hover '
                             "segment with the GPS-nearest named location")
    parser.add_argument("--snap-keyframes", action="store_true",
                        help="Snap each cut start backward to the nearest video keyframe")
    parser.add_argument("--min-hover-frames", type=int, default=300)
    parser.add_argument("--out", "-o", type=Path, required=True)
    args = parser.parse_args()

    log = None
    plans = []
    if args.cuts:
        for entry in args.cuts:
            loc, rng = entry.split("=")
            start, end = (int(v) for v in rng.split(":"))
            plans.append((loc, start, end))
    elif args.auto:
        log = load_flight_log(args.video, parser)
        locations = None
        if args.locations is not None:
            locations = {
                k: tuple(v) for k, v in json.loads(args.locations.read_text()).items()
            }
        for i, (start, end) in enumerate(hover_segments(log, args.min_hover_frames)):
            name = f"H{i}"
            if locations:
                seg = log[(log["frame"] >= start) & (log["frame"] < end)]
                lat = float(np.nanmedian(seg["latitude"]))
                lon = float(np.nanmedian(seg["longitude"]))
                name = nearest_location(locations, lat, lon) or name
            plans.append((name, start, end))
        if not plans:
            print("No hover segments found.")
            return 1
    else:
        parser.error("Provide --cuts or --auto.")

    keyframes = None
    if args.snap_keyframes:
        from geotrax_tpu.io.video import keyframe_indices

        keyframes = np.asarray(keyframe_indices(args.video))
        if keyframes.size == 0:
            print("warning: no keyframe info available (cv2 backend?); not snapping")
            keyframes = None

    args.out.mkdir(parents=True, exist_ok=True)
    for loc, start, end in plans:
        if keyframes is not None:
            earlier = keyframes[keyframes <= start]
            snapped = int(earlier[-1]) if earlier.size else 0
            if snapped != start:
                print(f"{loc}: cut start {start} snapped to keyframe {snapped}")
            start = snapped
        out = args.out / f"{loc}_{args.video.stem}.mp4"
        recut(args.video, start, end, out, cut_log=True)
        if log is not None:
            seg = log[(log["frame"] >= start) & (log["frame"] < end)].copy()
            seg["frame"] = seg["frame"] - start
            seg.to_csv(out.with_suffix(".csv"), index=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
