"""Concatenate split drone videos (and their flight-log CSVs) per session.

Capability parity with reference tools/merge_videos_and_logs.py (core
capability; the reference also parses DJI SRT subtitles): DJI splits long
recordings into numbered .mp4 parts — concatenate them in name order into
one video, and append the per-part CSV logs with frame renumbering.

Usage:
  python tools/merge_videos_and_logs.py PART1.mp4 PART2.mp4 ... -o MERGED.mp4
  python tools/merge_videos_and_logs.py --glob "session1/*.mp4" -o MERGED.mp4
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.io.video import VideoReader, VideoWriter, probe_video  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("parts", nargs="*", type=Path)
    parser.add_argument("--glob", type=str, default=None, help="Glob for the parts")
    parser.add_argument("--out", "-o", type=Path, required=True)
    args = parser.parse_args()

    parts = sorted(Path(".").glob(args.glob)) if args.glob else list(args.parts)
    if len(parts) < 1:
        parser.error("No input parts.")

    info = probe_video(parts[0])
    writer = VideoWriter(args.out, info.fps, info.width, info.height)
    logs = []
    offset = 0
    for part in parts:
        n = 0
        for _idx, frame in VideoReader(part):
            writer.write(frame)
            n += 1
        log = part.with_suffix(".csv")
        if log.exists():
            df = pd.read_csv(log)
            df["frame"] = df["frame"] + offset
            logs.append(df)
        print(f"{part.name}: {n} frames (offset {offset})")
        offset += n
    writer.close()
    if logs:
        pd.concat(logs, ignore_index=True).to_csv(args.out.with_suffix(".csv"), index=False)
        print(f"Merged log -> {args.out.with_suffix('.csv')}")
    print(f"Merged {len(parts)} part(s), {offset} frames -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
