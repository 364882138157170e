"""Concatenate split drone videos and their DJI flight logs per session.

Capability parity with reference tools/merge_videos_and_logs.py: DJI splits
long recordings into numbered .mp4 parts with companion .SRT telemetry —
concatenate the parts in name order into one video, merge the SRT blocks
with continuous wall-clock timestamps and frame counters (tools/dji_srt.py),
and append any per-part CSV logs with frame renumbering. Edited video stems
(DJI_0212_trimmed.mp4) still find their base-stem SRT companion.

Usage:
  python tools/merge_videos_and_logs.py PART1.mp4 PART2.mp4 ... -o MERGED.mp4
  python tools/merge_videos_and_logs.py --glob "session1/*.mp4" -o MERGED.mp4
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403

import dji_srt  # noqa: E402

from geotrax_tpu.io.video import VideoReader, VideoWriter, probe_video  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("parts", nargs="*", type=Path)
    parser.add_argument("--glob", type=str, default=None, help="Glob for the parts")
    parser.add_argument("--out", "-o", type=Path, required=True)
    parser.add_argument("--srt-csv", action="store_true",
                        help="Also export the merged SRT telemetry as a flight-log CSV "
                             "(frame, time_ms, latitude, longitude, altitudes, ...)")
    args = parser.parse_args()

    parts = sorted(Path(".").glob(args.glob)) if args.glob else list(args.parts)
    if len(parts) < 1:
        parser.error("No input parts.")

    info = probe_video(parts[0])
    writer = VideoWriter(args.out, info.fps, info.width, info.height)
    logs = []
    srt_parts = []
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
        srt = dji_srt.companion_srt(part)
        if srt is not None:
            srt_parts.append(dji_srt.read_srt(srt))
        else:
            print(f"warning: no SRT companion for {part.name}")
        print(f"{part.name}: {n} frames (offset {offset})")
        offset += n
    writer.close()
    if logs:
        pd.concat(logs, ignore_index=True).to_csv(args.out.with_suffix(".csv"), index=False)
        print(f"Merged log -> {args.out.with_suffix('.csv')}")
    if srt_parts:
        merged = dji_srt.merge_blocks(srt_parts)
        srt_out = args.out.with_suffix(".srt")
        dji_srt.write_srt(srt_out, merged)
        print(f"Merged SRT -> {srt_out} ({len(merged)} blocks)")
        if args.srt_csv:
            csv_out = args.out.with_name(args.out.stem + "_srt.csv")
            dji_srt.srt_dataframe(merged).to_csv(csv_out, index=False)
            print(f"SRT telemetry CSV -> {csv_out}")
    print(f"Merged {len(parts)} part(s), {offset} frames -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
