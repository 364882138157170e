"""Fill missing flight-log timestamps by linear interpolation at the video fps.

Capability parity with reference tools/interpolate_missing_timestamps.py:
flight logs occasionally drop rows/timestamps; reconstruct them from the
surrounding valid stamps (or extrapolate at the configured fps at the ends)
so the georeferencing stage gets a stamp for every frame.

Usage:
  python tools/interpolate_missing_timestamps.py LOG.csv [--fps 29.97] [-o OUT.csv]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403


def fill_timestamps(df: pd.DataFrame, fps: float) -> tuple[pd.DataFrame, int]:
    df = df.copy()
    frames = df["frame"].to_numpy()
    stamps = pd.to_datetime(df["timestamp"], errors="coerce")
    valid = stamps.notna().to_numpy()
    if valid.sum() < 1:
        raise ValueError("No valid timestamps to anchor the interpolation.")
    # explicit ns resolution (pandas >= 3 defaults datetime64 to microseconds)
    ns = stamps.to_numpy().astype("datetime64[ns]").astype(np.int64).astype(np.float64)
    period_ns = 1e9 / fps
    filled = np.interp(frames, frames[valid], ns[valid])
    # extrapolate beyond the anchored range at the fps period
    first, last = np.nonzero(valid)[0][[0, -1]]
    before = frames < frames[first]
    after = frames > frames[last]
    filled[before] = ns[first] - (frames[first] - frames[before]) * period_ns
    filled[after] = ns[last] + (frames[after] - frames[last]) * period_ns
    n_filled = int((~valid).sum())
    out = pd.to_datetime(filled.astype("int64"), unit="ns").strftime(
        "%Y-%m-%d %H:%M:%S.%f").str[:-3]
    df["timestamp"] = out
    return df, n_filled


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("log", type=Path, help="Flight-log CSV with frame/timestamp columns")
    parser.add_argument("--fps", type=float, default=30000 / 1001)
    parser.add_argument("--out", "-o", type=Path, default=None,
                        help="Output CSV (default: in-place)")
    args = parser.parse_args()

    df = pd.read_csv(args.log)
    fixed, n = fill_timestamps(df, args.fps)
    out = args.out or args.log
    fixed.to_csv(out, index=False)
    print(f"Filled {n} missing timestamp(s) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
