"""Sample frames from videos into an image folder (for annotation/training).

Capability parity with reference tools/sample_frames.py (core capability;
the SRT-metadata filters are Songdo-specific): random or fixed-stride
sampling across one or many videos, deterministic with --seed.

Usage:
  python tools/sample_frames.py VIDEO_OR_DIR -o frames/ [-n 100 | --stride 30]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403

from geotrax_tpu.io.geoassets import save_image  # noqa: E402
from geotrax_tpu.io.video import VideoReader, probe_video  # noqa: E402
from geotrax_tpu.utils.constants import VIDEO_FORMATS  # noqa: E402


def sample_video(video: Path, out: Path, n: int | None, stride: int | None, rng) -> int:
    info = probe_video(video)
    total = info.frame_count
    if stride:
        wanted = set(range(0, total, stride))
    else:
        wanted = set(rng.choice(total, size=min(n or 10, total), replace=False).tolist())
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
    args = parser.parse_args()

    videos = ([args.input] if args.input.is_file()
              else sorted(p for p in args.input.rglob("*") if p.suffix.lower() in VIDEO_FORMATS))
    args.out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    total = 0
    for v in videos:
        total += sample_video(v, args.out, args.num, args.stride, rng)
    print(f"Sampled {total} frame(s) from {len(videos)} video(s) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
