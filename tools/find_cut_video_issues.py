"""Flight-log anomaly detection for cut videos (+ optional auto-fix recut).

Capability parity with reference tools/find_cut_video_issues.py and
fix_timestamp_anomalies.py (without the hardcoded Songdo session windows):
scan flight-log CSVs for non-monotonic / jumping timestamps and missing
frames; with --fix, recut the video at the first anomaly.

Usage:
  python tools/find_cut_video_issues.py DIR_OR_LOG.csv [--fps 29.97] [--fix]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403


def find_anomalies(log: pd.DataFrame, fps: float, tolerance: float = 3.0,
                   gps_jump_m: float = 15.0, alt_jump_m: float = 10.0) -> list:
    """[(frame_index_in_log, kind, detail)] of flight-log anomalies:
    frame gaps/duplicates, missing or non-monotonic/jumping timestamps,
    GPS position glitches and altitude spikes (per-frame jumps far beyond
    what the platform can fly)."""
    out = []
    frames = log["frame"].to_numpy()
    gaps = np.diff(frames)
    for i in np.where(gaps != 1)[0]:
        kind = "frame-duplicate" if gaps[i] == 0 else "frame-gap"
        out.append((int(frames[i]), kind, f"jump {gaps[i]}"))
    stamps = pd.to_datetime(log["timestamp"], errors="coerce")
    missing = stamps.isna()
    for i in np.where(missing)[0]:
        out.append((int(frames[i]), "missing-timestamp", ""))
    dt = stamps.diff().dt.total_seconds().to_numpy()
    period = 1.0 / fps
    bad = np.where((dt[1:] < 0) | (dt[1:] > tolerance * period))[0] + 1
    for i in bad:
        if not missing.iloc[i] and not missing.iloc[i - 1]:
            out.append((int(frames[i]), "timestamp-jump", f"dt={dt[i]:.3f}s"))
    if {"latitude", "longitude"} <= set(log.columns):
        lat = log["latitude"].to_numpy(dtype=float)
        lon = log["longitude"].to_numpy(dtype=float)
        mean_lat = np.nanmean(lat) if np.isfinite(lat).any() else 0.0
        dx = np.diff(lon) * 111320.0 * np.cos(np.deg2rad(mean_lat))
        dy = np.diff(lat) * 111320.0
        step = np.hypot(dx, dy)
        for i in np.where(step > gps_jump_m)[0]:
            out.append((int(frames[i + 1]), "gps-jump", f"{step[i]:.1f} m/frame"))
    alt_col = next((c for c in ("rel_alt", "abs_alt", "altitude")
                    if c in log.columns), None)
    if alt_col is not None:
        dalt = np.abs(np.diff(log[alt_col].to_numpy(dtype=float)))
        for i in np.where(dalt > alt_jump_m)[0]:
            out.append((int(frames[i + 1]), "altitude-spike",
                        f"{dalt[i]:.1f} m/frame ({alt_col})"))
    return sorted(out)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("path", type=Path, help="A flight-log CSV or a directory")
    parser.add_argument("--fps", type=float, default=30000 / 1001)
    parser.add_argument("--fix", action="store_true",
                        help="Recut the sibling video up to the first anomaly")
    args = parser.parse_args()

    logs = [args.path] if args.path.is_file() else sorted(args.path.rglob("*.csv"))
    issues_total = 0
    for log_path in logs:
        try:
            log = pd.read_csv(log_path)
            if "frame" not in log.columns or "timestamp" not in log.columns:
                continue
        except Exception:  # noqa: BLE001
            continue
        anomalies = find_anomalies(log, args.fps)
        if not anomalies:
            continue
        issues_total += len(anomalies)
        print(f"{log_path}: {len(anomalies)} anomalie(s)")
        for frame, kind, detail in anomalies[:10]:
            print(f"  frame {frame}: {kind} {detail}")
        if args.fix:
            video = log_path.with_suffix(".mp4")
            if video.exists():
                from recut_video_and_log import recut

                first = anomalies[0][0]
                out = video.with_name(video.stem + "_fixed.mp4")
                recut(video, 0, first, out, cut_log=True)
    print(f"Scanned {len(logs)} log(s); {issues_total} anomalies.")
    return 0 if issues_total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
