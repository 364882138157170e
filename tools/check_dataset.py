"""Dataset QA: kinematic-threshold violations in aggregated/georeferenced CSVs.

Capability parity with reference tools/check_dataset.py: scan CSVs for
speed > 130 km/h or |acceleration| > 12 m/s^2 (defaults; configurable) and
report the offending vehicles per file.

Usage:
  python tools/check_dataset.py DATASET_OR_RESULTS_DIR [--speed 130] [--accel 12]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403


def check_file(path: Path, speed_thr: float, accel_thr: float) -> dict:
    df = pd.read_csv(path)
    out = {"file": path, "rows": len(df), "speeding": [], "harsh": []}
    if "Vehicle_Speed" in df.columns:
        out["speeding"] = sorted(
            df.loc[df["Vehicle_Speed"] > speed_thr, "Vehicle_ID"].unique().tolist()
        )
    if "Vehicle_Acceleration" in df.columns:
        out["harsh"] = sorted(
            df.loc[df["Vehicle_Acceleration"].abs() > accel_thr, "Vehicle_ID"].unique().tolist()
        )
    return out


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("path", type=Path, help="A CSV file or a directory of CSVs")
    parser.add_argument("--speed", type=float, default=130.0, help="Speed threshold [km/h]")
    parser.add_argument("--accel", type=float, default=12.0, help="|Acceleration| threshold [m/s^2]")
    args = parser.parse_args()

    files = [args.path] if args.path.is_file() else sorted(args.path.rglob("*.csv"))
    violations = 0
    for f in files:
        try:
            result = check_file(f, args.speed, args.accel)
        except Exception as exc:  # noqa: BLE001
            print(f"{f}: unreadable ({exc})")
            continue
        if result["speeding"] or result["harsh"]:
            violations += 1
            print(f"{f} ({result['rows']} rows):")
            if result["speeding"]:
                print(f"  speed > {args.speed:g} km/h: vehicles {result['speeding'][:20]}")
            if result["harsh"]:
                print(f"  |accel| > {args.accel:g} m/s^2: vehicles {result['harsh'][:20]}")
    print(f"Checked {len(files)} file(s); {violations} with violations.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
