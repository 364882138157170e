"""Exact frame-range recut of a video with flight-log CSV rebase.

Capability parity with reference tools/recut_video_and_log.py: decode-and-
re-encode the frame range [start, end) (exact indexing via the sequential
native/cv2 reader — no keyframe snapping needed) and rewrite the matching
flight-log rows with rebased frame numbers.

Usage:
  python tools/recut_video_and_log.py VIDEO.mp4 -s 0 -e 150 -o OUT.mp4 [-ec]
  python tools/recut_video_and_log.py VIDEO.mp4 -s 90 -e 400 -o OUT.mp4 --snap-keyframe
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.io.video import VideoReader, VideoWriter, probe_video  # noqa: E402


def recut(video: Path, start: int, end, out: Path, cut_log: bool, logger=print) -> int:
    info = probe_video(video)
    writer = VideoWriter(out, info.fps, info.width, info.height)
    n = 0
    for _idx, frame in VideoReader(video, start=start, stop=end):
        writer.write(frame)
        n += 1
    writer.close()
    logger(f"Wrote {n} frames [{start}, {end}) -> {out}")

    log_path = video.with_suffix(".csv")
    if cut_log and log_path.exists():
        df = pd.read_csv(log_path)
        df = df[(df["frame"] >= start) & ((end is None) | (df["frame"] < (end or 1 << 62)))].copy()
        df["frame"] = df["frame"] - start
        df.to_csv(Path(out).with_suffix(".csv"), index=False)
        logger(f"Rebased flight log -> {Path(out).with_suffix('.csv')}")
    return n


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("video", type=Path)
    parser.add_argument("--start", "-s", type=int, default=0)
    parser.add_argument("--end", "-e", type=int, default=None, help="Exclusive end frame")
    parser.add_argument("--out", "-o", type=Path, required=True)
    parser.add_argument("--cut-log", "-ec", action="store_true",
                        help="Also cut + rebase the sibling flight-log CSV")
    parser.add_argument("--snap-keyframe", action="store_true",
                        help="Snap the start backward onto the nearest video keyframe "
                             "(keyframe-aligned recut, reference recut_video_and_log.py)")
    args = parser.parse_args()
    start = args.start
    if args.snap_keyframe:
        import numpy as np

        from geotrax_tpu.io.video import keyframe_indices

        kf = np.asarray(keyframe_indices(args.video))
        earlier = kf[kf <= start] if kf.size else np.array([])
        snapped = int(earlier[-1]) if earlier.size else 0
        if snapped != start:
            print(f"start {start} snapped to keyframe {snapped}")
        start = snapped
    recut(args.video, start, args.end, args.out, args.cut_log)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
