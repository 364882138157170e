"""Sample frames from videos into an image folder (for annotation/training).

Capability parity with reference tools/sample_frames.py: random or
fixed-stride sampling across one or many videos, deterministic with --seed,
with optional flight-log metadata filters — frames are only eligible when
the companion DJI SRT (or CSV flight log) says the drone was within an
altitude band (--min-alt/--max-alt) and/or inside a GPS bounding box
(--bbox lat_min lon_min lat_max lon_max).

Usage:
  python tools/sample_frames.py VIDEO_OR_DIR -o frames/ [-n 100 | --stride 30]
  python tools/sample_frames.py DIR -o frames/ -n 50 --min-alt 120 --max-alt 160
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403

import dji_srt  # noqa: E402

from geotrax_tpu.io.geoassets import save_image  # noqa: E402
from geotrax_tpu.io.video import VideoReader, probe_video  # noqa: E402
from geotrax_tpu.utils.constants import VIDEO_FORMATS  # noqa: E402


def eligible_frames(video: Path, total: int, args) -> np.ndarray:
    """Frame indices passing the flight-log metadata filters (all frames if
    no filter requested or no log found)."""
    if args.min_alt is None and args.max_alt is None and args.bbox is None:
        return np.arange(total)
    df = None
    csv = video.with_suffix(".csv")
    if csv.exists():
        import pandas as pd

        df = pd.read_csv(csv)
    else:
        srt = dji_srt.companion_srt(video)
        if srt is not None:
            df = dji_srt.srt_dataframe(dji_srt.read_srt(srt))
    if df is None or "frame" not in df.columns:
        print(f"warning: no flight log for {video.name}; metadata filters skipped")
        return np.arange(total)
    ok = np.ones(len(df), bool)
    if args.min_alt is not None and "rel_alt" in df:
        ok &= df["rel_alt"].to_numpy() >= args.min_alt
    if args.max_alt is not None and "rel_alt" in df:
        ok &= df["rel_alt"].to_numpy() <= args.max_alt
    if args.bbox is not None and {"latitude", "longitude"} <= set(df.columns):
        lat_min, lon_min, lat_max, lon_max = args.bbox
        lat = df["latitude"].to_numpy()
        lon = df["longitude"].to_numpy()
        ok &= (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)
    frames = df["frame"].to_numpy()[ok]
    return frames[(frames >= 0) & (frames < total)].astype(int)


def sample_video(video: Path, out: Path, n: int | None, stride: int | None,
                 rng, args) -> int:
    info = probe_video(video)
    total = info.frame_count
    pool = eligible_frames(video, total, args)
    if len(pool) == 0:
        print(f"{video.name}: no frames pass the metadata filters")
        return 0
    if stride:
        wanted = set(int(i) for i in pool[::stride])
    else:
        wanted = set(rng.choice(pool, size=min(n or 10, len(pool)), replace=False).tolist())
    saved = 0
    for idx, frame in VideoReader(video):
        if idx in wanted:
            save_image(out / f"{video.stem}_f{idx:06d}.png", frame)
            saved += 1
            if saved == len(wanted):
                break
    return saved


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("input", type=Path, help="A video file or a directory of videos")
    parser.add_argument("--out", "-o", type=Path, required=True)
    parser.add_argument("--num", "-n", type=int, default=None, help="Random frames per video")
    parser.add_argument("--stride", type=int, default=None, help="Every Nth frame instead")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--min-alt", type=float, default=None,
                        help="Only frames with flight-log rel_alt >= this [m]")
    parser.add_argument("--max-alt", type=float, default=None,
                        help="Only frames with flight-log rel_alt <= this [m]")
    parser.add_argument("--bbox", type=float, nargs=4, default=None,
                        metavar=("LAT_MIN", "LON_MIN", "LAT_MAX", "LON_MAX"),
                        help="Only frames whose GPS position lies in this box")
    args = parser.parse_args()

    videos = ([args.input] if args.input.is_file()
              else sorted(p for p in args.input.rglob("*") if p.suffix.lower() in VIDEO_FORMATS))
    args.out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    total = 0
    for v in videos:
        total += sample_video(v, args.out, args.num, args.stride, rng, args)
    print(f"Sampled {total} frame(s) from {len(videos)} video(s) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
