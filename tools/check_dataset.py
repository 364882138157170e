"""Dataset QA: kinematic-threshold violations in aggregated/georeferenced CSVs.

Capability parity with reference tools/check_dataset.py: scan CSVs for
speed > 130 km/h or |acceleration| > 12 m/s^2 (defaults; configurable),
keep the MAXIMUM violation per vehicle, report sorted violation tables,
and trace each violating vehicle back to its source video by reversing
the aggregation ID offsets (reference check_dataset.py:148-205 via
find_source_id).

Usage:
  python tools/check_dataset.py DATASET_OR_RESULTS_DIR [--speed 130] [--accel 12]
          [--processed-folder PROCESSED] [--results-folder <name>] [--no-trace]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403

from find_source_id import find_source  # noqa: E402


def collect_files(path: Path) -> list[Path]:
    """CSV discovery mirroring the reference: a file as-is; a directory's
    own *.csv, else one level of subfolders (reference :206-228)."""
    if path.is_file():
        return [path]
    files = sorted(f for f in path.iterdir() if f.suffix.lower() == ".csv")
    if not files:
        for sub in sorted(p for p in path.iterdir() if p.is_dir()):
            files.extend(sorted(f for f in sub.iterdir() if f.suffix.lower() == ".csv"))
    return files


def violations_in(df: pd.DataFrame, column: str, thr: float, absolute: bool) -> pd.DataFrame:
    """Rows exceeding the threshold, deduplicated to each vehicle's single
    worst row (reference keeps the max violation per vehicle, :165-171)."""
    if column not in df.columns or "Vehicle_ID" not in df.columns:
        return pd.DataFrame()
    mag = df[column].abs() if absolute else df[column]
    over = df.loc[mag > thr]
    if over.empty:
        return over
    worst = mag.loc[over.index].groupby(over["Vehicle_ID"]).idxmax()
    return df.loc[worst.values]


def trace_sources(table: pd.DataFrame, processed: Path | None,
                  results_folder: str | None) -> pd.DataFrame:
    """Annotate violation rows with Source_ID / Source_Video by replaying
    the aggregation offsets (only meaningful for aggregated dataset CSVs)."""
    table = table.copy()
    table["Source_ID"] = None
    table["Source_Video"] = None
    cache: dict[tuple, object] = {}
    for idx, row in table.iterrows():
        key = (row["Dataset"], int(row["Vehicle_ID"]))
        if key not in cache:
            kwargs = {"processed": processed}
            if results_folder:
                kwargs["results_folder"] = results_folder
            cache[key] = find_source(Path(row["Dataset"]), int(row["Vehicle_ID"]), **kwargs)
        hit = cache[key]
        if hit is not None:
            original, _csv_path, video, _drone = hit
            table.at[idx, "Source_ID"] = int(original)
            table.at[idx, "Source_Video"] = str(video) if video is not None else None
    return table


def report(table: pd.DataFrame, sort_col: str, absolute: bool, label: str,
           args) -> int:
    if table.empty:
        print(f"No {label} violations.")
        return 0
    order = table[sort_col].abs() if absolute else table[sort_col]
    table = table.loc[order.sort_values(ascending=False).index]
    if not args.no_trace:
        table = trace_sources(table, args.processed_folder, args.results_folder)
    cols = [c for c in ("Dataset", "Vehicle_ID", "Drone_ID", "Vehicle_Class",
                        "Vehicle_Speed", "Vehicle_Acceleration",
                        "Source_ID", "Source_Video") if c in table.columns]
    table = table[cols]
    table["Dataset"] = [Path(p).name for p in table["Dataset"]]
    print(f"\n{len(table)} {label} violation(s):")
    with pd.option_context("display.max_colwidth", None, "display.width", 200):
        print(table.to_string(index=False))
    return len(table)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("path", type=Path, help="A CSV file or a directory of CSVs")
    parser.add_argument("--speed", "-st", type=float, default=130.0,
                        help="Speed threshold [km/h]")
    parser.add_argument("--accel", "-at", type=float, default=12.0,
                        help="|Acceleration| threshold [m/s^2]")
    parser.add_argument("--processed-folder", type=Path, default=None,
                        help="PROCESSED tree for source tracing (default: the "
                             "DATASET ancestor's sibling)")
    parser.add_argument("--results-folder", default=None,
                        help="Per-video results folder name inside PROCESSED")
    parser.add_argument("--no-trace", action="store_true",
                        help="Skip tracing violations back to source videos")
    args = parser.parse_args()

    if not args.path.exists():
        print(f"'{args.path}' not found.")
        return 1
    files = collect_files(args.path)
    if not files:
        print(f"No .csv files under '{args.path}'.")
        return 1

    speeding, harsh = [], []
    for f in files:
        try:
            df = pd.read_csv(f)
        except Exception as exc:  # noqa: BLE001
            print(f"{f}: unreadable ({exc})")
            continue
        df["Dataset"] = str(f)
        speeding.append(violations_in(df, "Vehicle_Speed", args.speed, absolute=False))
        harsh.append(violations_in(df, "Vehicle_Acceleration", args.accel, absolute=True))

    n = report(pd.concat(speeding) if speeding else pd.DataFrame(),
               "Vehicle_Speed", False, f"speed > {args.speed:g} km/h", args)
    n += report(pd.concat(harsh) if harsh else pd.DataFrame(),
                "Vehicle_Acceleration", True,
                f"|accel| > {args.accel:g} m/s^2", args)
    print(f"\nChecked {len(files)} file(s); {n} violating vehicle-row(s).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
