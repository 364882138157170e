"""Flight-log anomaly detection for cut videos (+ auto-fix recut / reports).

Capability parity with reference tools/find_cut_video_issues.py (without the
hardcoded Songdo session windows): scan flight-log CSVs for non-monotonic /
jumping timestamps, missing frames, GPS/altitude glitches; with --fix, recut
the video at the first anomaly; with --report DIR, write
``flight_log_stats.csv`` + ``flight_log_anomalies.csv`` (the input consumed
by tools/fix_timestamp_anomalies.py — reference find_cut_video_issues.py:
140-142, 289-306).

Usage:
  python tools/find_cut_video_issues.py DIR_OR_LOG.csv [--fps 29.97] [--fix]
  python tools/find_cut_video_issues.py PROCESSED/ --report PROCESSED/
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


def log_stats_row(log_path: Path, log: pd.DataFrame, fps: float,
                  anomalies: list) -> dict:
    """Per-log statistics row matching the reference report schema
    (find_cut_video_issues.py:289-306): flight-circle deviations, frame and
    timestamp deviation maxima, and the first timestamp anomaly location."""
    from geotrax_tpu.utils.file_utils import determine_location_id

    stamps = pd.to_datetime(log["timestamp"], errors="coerce")
    dt = stamps.diff().dt.total_seconds().to_numpy()[1:]
    period = 1.0 / fps
    ts_max_abs_diff = float(np.nanmax(np.abs(dt - period))) if len(dt) else 0.0
    frames = log["frame"].to_numpy()
    frame_max_abs_diff = int(np.abs(np.diff(frames) - 1).max()) if len(frames) > 1 else 0

    ts_anoms = [a for a in anomalies if a[1] in ("timestamp-jump",
                                                 "missing-timestamp")]
    anomaly_frame = ts_anoms[0][0] if ts_anoms else np.nan
    anomaly_loc = ""
    if ts_anoms:
        hit = log.loc[log["frame"] == anomaly_frame, "timestamp"]
        anomaly_loc = str(hit.iloc[0]) if len(hit) else ""

    row = {
        "location_id": determine_location_id(log_path),
        "video_path": log_path.with_suffix(".MP4").name,
        "radius_max_deviation": np.nan,
        "x_max_deviation": np.nan,
        "y_max_deviation": np.nan,
        "rel_altitude_max_deviation": np.nan,
        "frame_max_abs_diff": frame_max_abs_diff,
        "timestamp_max_abs_diff": round(ts_max_abs_diff, 4),
        "timestamp_anomaly_location": anomaly_loc,
        "timestamp_anomaly_frame": anomaly_frame,
        "n_anomalies": len(anomalies),
    }
    # hover-circle deviations when GPS columns are present: distance of each
    # fix from the per-log mean position, and altitude excursion
    if {"latitude", "longitude"} <= set(log.columns):
        lat = log["latitude"].to_numpy(dtype=float)
        lon = log["longitude"].to_numpy(dtype=float)
        if np.isfinite(lat).any() and np.isfinite(lon).any():
            mean_lat, mean_lon = np.nanmean(lat), np.nanmean(lon)
            dx = (lon - mean_lon) * 111320.0 * np.cos(np.deg2rad(mean_lat))
            dy = (lat - mean_lat) * 111320.0
            r = np.hypot(dx, dy)
            row["radius_max_deviation"] = round(float(np.nanmax(r)), 2)
            row["x_max_deviation"] = round(float(np.nanmax(np.abs(dx))), 2)
            row["y_max_deviation"] = round(float(np.nanmax(np.abs(dy))), 2)
    alt_col = next((c for c in ("rel_alt", "abs_alt", "altitude")
                    if c in log.columns), None)
    if alt_col is not None:
        alt = log[alt_col].to_numpy(dtype=float)
        if np.isfinite(alt).any():
            row["rel_altitude_max_deviation"] = round(
                float(np.nanmax(np.abs(alt - np.nanmean(alt)))), 2)
    return row


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("path", type=Path, help="A flight-log CSV or a directory")
    parser.add_argument("--fps", type=float, default=30000 / 1001)
    parser.add_argument("--fix", action="store_true",
                        help="Recut the sibling video up to the first anomaly")
    parser.add_argument("--report", type=Path, default=None, metavar="DIR",
                        help="Write flight_log_stats.csv + flight_log_anomalies.csv "
                             "(input for tools/fix_timestamp_anomalies.py)")
    parser.add_argument("--timestamp-threshold", type=float, default=0.5,
                        help="timestamp_max_abs_diff (s) above which a log is "
                             "reported as an anomaly (reference threshold table)")
    args = parser.parse_args()

    logs = [args.path] if args.path.is_file() else sorted(args.path.rglob("*.csv"))
    issues_total = 0
    stats_rows = []
    for log_path in logs:
        try:
            log = pd.read_csv(log_path)
            if "frame" not in log.columns or "timestamp" not in log.columns:
                continue
        except Exception:  # noqa: BLE001
            continue
        anomalies = find_anomalies(log, args.fps)
        if args.report is not None:
            stats_rows.append(log_stats_row(log_path, log, args.fps, anomalies))
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

    if args.report is not None and stats_rows:
        args.report.mkdir(parents=True, exist_ok=True)
        stats = pd.DataFrame(stats_rows).sort_values(
            by=["location_id", "video_path"])
        stats.to_csv(args.report / "flight_log_stats.csv", index=False)
        flagged = stats[
            stats["timestamp_anomaly_frame"].notna()
            & (stats["timestamp_max_abs_diff"] >= args.timestamp_threshold)
        ]
        flagged.to_csv(args.report / "flight_log_anomalies.csv", index=False)
        print(f"Report: {len(stats)} logs, {len(flagged)} flagged -> "
              f"{args.report / 'flight_log_anomalies.csv'}")

    print(f"Scanned {len(logs)} log(s); {issues_total} anomalies.")
    return 0 if issues_total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
