"""Timestamp anomaly correction: cut videos + flight logs at anomaly frames.

Standalone parity with reference tools/fix_timestamp_anomalies.py:1-199: read
an anomaly CSV (as written by find_cut_video_issues.py --report), derive one
or two cut windows around each anomaly frame (±1 s margin, 15 s minimum
segment), write the cut-specification TXT files, back the originals up with
an ``_original`` suffix, recut via tools/recut_video_and_log.py, and
reprocess each resulting segment with ``geotrax batch -y -o``.

Usage:
  python tools/fix_timestamp_anomalies.py flight_log_anomalies.csv
  python tools/fix_timestamp_anomalies.py anomalies.csv -o /data/PROCESSED -d

Input CSV columns: location_id, video_path, timestamp_max_abs_diff,
timestamp_anomaly_location, timestamp_anomaly_frame.
"""

from __future__ import annotations

import argparse
import logging
import os
import subprocess
import sys
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.utils.logging_utils import setup_logger  # noqa: E402

MIN_VIDEO_DURATION = 15  # seconds; do not produce shorter segments
FPS = 30                 # margin/duration bookkeeping (reference uses 30)

TOOLS_DIR = Path(__file__).resolve().parent


def plan_cuts(video_path: Path, location_id: str, sequence: int,
              anomaly_frame: int, last_frame: int) -> list[tuple[Path, int, int]]:
    """[(cut_spec_path, start, end)] — single cut when the anomaly sits within
    15 s of either video end, otherwise two segments around the anomaly
    (reference fix_timestamp_anomalies.py:114-136)."""
    cuts = []
    if anomaly_frame / FPS < MIN_VIDEO_DURATION:
        spec = video_path.with_name(f"0_{location_id}{sequence}_recut.TXT")
        cuts.append((spec, round(anomaly_frame + FPS), -1))
    elif (last_frame - anomaly_frame) / FPS < MIN_VIDEO_DURATION:
        spec = video_path.with_name(f"0_{location_id}{sequence}_recut.TXT")
        cuts.append((spec, 0, round(anomaly_frame - FPS)))
    else:
        spec1 = video_path.with_name(
            f"0_{location_id}{sequence}_{location_id}{sequence}_recut.TXT")
        spec2 = video_path.with_name(
            f"0_{location_id}{sequence}_{location_id}{sequence + 1}_recut.TXT")
        cuts.append((spec1, 0, round(anomaly_frame - FPS)))
        cuts.append((spec2, round(anomaly_frame + FPS), -1))
    return cuts


def fix_timestamp_anomalies(args: argparse.Namespace,
                            logger: logging.Logger) -> int:
    df = pd.read_csv(args.input)
    needed = ["location_id", "video_path", "timestamp_max_abs_diff",
              "timestamp_anomaly_location", "timestamp_anomaly_frame"]
    missing = [c for c in needed if c not in df.columns]
    if missing:
        logger.error(f"Anomaly CSV is missing columns: {missing}")
        return 1
    df = df[needed].dropna(subset=["timestamp_anomaly_frame"])
    logger.info(f"Found {len(df)} anomalies in total.")
    if len(df) == 0:
        return 0
    logger.info("\n%s", df.to_string(index=False))

    processed = args.processed_folder or args.input.parent
    for _, row in df.iterrows():
        video_rel = Path(row["video_path"])
        video = processed / video_rel
        csv_path = video.with_suffix(".CSV")
        if not csv_path.exists():
            csv_path = video.with_suffix(".csv")
        location_id = str(row["location_id"])
        try:
            sequence = int(video_rel.stem.replace(location_id, ""))
        except ValueError:
            logger.warning(f"Skipping: {video} (stem does not match "
                           f"'<location_id><sequence>' naming)")
            continue
        anomaly_frame = int(row["timestamp_anomaly_frame"])

        if not video.exists() or not csv_path.exists():
            logger.warning(f"Skipping: {video} (not found)")
            continue
        next_seq = video.with_name(f"{location_id}{sequence + 1}.CSV")
        next_seq_lower = video.with_name(f"{location_id}{sequence + 1}.csv")
        if next_seq.exists() or next_seq_lower.exists():
            logger.warning(f"Skipping: {video} (higher sequence number exists). "
                           "Rename the subsequent files manually and rerun.")
            continue

        logger.info(f"Fixing: {video}")
        log_df = pd.read_csv(csv_path)
        last_frame = int(log_df["frame"].max())
        cuts = plan_cuts(video, location_id, sequence, anomaly_frame, last_frame)

        for spec, start, end in cuts:
            logger.info(f"Creating cut: {spec} with start: {start} end: {end}")
            if not args.debug:
                spec.write_text(f"{start}, {end}")

        backup_video = video.with_name(video.stem + "_original" + video.suffix)
        backup_csv = csv_path.with_name(csv_path.stem + "_original" + csv_path.suffix)
        logger.info(f"Renaming: {video} -> {backup_video}")
        logger.info(f"Renaming: {csv_path} -> {backup_csv}")
        if not args.debug:
            os.rename(video, backup_video)
            os.rename(csv_path, backup_csv)

        for spec, _start, _end in cuts:
            out_video = spec.with_name(spec.stem.split("_")[-2] + video.suffix)
            cmd1 = [sys.executable, str(TOOLS_DIR / "recut_video_and_log.py"),
                    str(backup_video), str(spec), "-i", str(backup_csv),
                    "-o", str(out_video), "--exact-cut", "-q"]
            logger.info(f"Running: {' '.join(cmd1)}")
            if not args.debug:
                try:
                    subprocess.run(cmd1, check=True)
                except subprocess.CalledProcessError as exc:
                    logger.error(f"Recut failed for '{out_video}': {exc}")
                    continue

            cmd2 = [sys.executable, "-m", "geotrax_tpu", "batch",
                    str(out_video), "--yes", "--overwrite"]
            logger.info(f"Running: {' '.join(cmd2)}")
            if not args.debug:
                try:
                    subprocess.run(cmd2, check=True)
                except subprocess.CalledProcessError as exc:
                    logger.error(f"Batch processing failed for '{out_video}': {exc}")
    return 0


def parse_cli_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Fix timestamp anomalies in flight logs by cutting videos "
                    "and logs at anomaly frames.")
    parser.add_argument("input", type=Path,
                        help="CSV with flight-log anomalies "
                             "(from find_cut_video_issues.py --report)")
    parser.add_argument("--processed-folder", "-o", type=Path, default=None,
                        help="Root of the processed folder with cut videos and "
                             "flight logs (default: same as input)")
    parser.add_argument("--debug", "-d", action="store_true",
                        help="Dry run: log operations, modify no files")
    parser.add_argument("--log-path", "-lp", type=Path, default=None)
    parser.add_argument("--quiet", "-q", action="store_true")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_cli_args(argv)
    logger = setup_logger(Path(__file__).stem, verbose=not args.quiet,
                          log_path=args.log_path)
    return fix_timestamp_anomalies(args, logger)


if __name__ == "__main__":
    raise SystemExit(main())
