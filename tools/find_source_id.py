"""Reverse an aggregated Vehicle_ID to its source video.

Capability parity with reference tools/find_source_id.py: aggregation
offsets vehicle IDs per source (geotrax_tpu/pipeline/aggregate.py); this
replays the grouping/offset arithmetic to report which source CSV (and
original vehicle id) an aggregated ID came from.

Usage:
  python tools/find_source_id.py PROCESSED_DIR DATE LOCATION SESSION VEHICLE_ID
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.pipeline.aggregate import _group_files  # noqa: E402
from geotrax_tpu.utils.file_utils import DEFAULT_OUTPUT  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("processed", type=Path, help="PROCESSED folder used for aggregation")
    parser.add_argument("date")
    parser.add_argument("location")
    parser.add_argument("session")
    parser.add_argument("vehicle_id", type=int)
    parser.add_argument("--results-folder", default=DEFAULT_OUTPUT["folder"])
    args = parser.parse_args()

    import logging

    logger = logging.getLogger("find_source_id")
    csvs = list(args.processed.rglob(f"**/{args.results_folder}/*.csv"))
    groups = _group_files(csvs, logger)
    key = (args.date, args.location, args.session)
    if key not in groups:
        print(f"No aggregation group {key}. Available: {sorted(groups)[:10]}")
        return 1

    offset = 0
    for path, drone_id in groups[key]:
        df = pd.read_csv(path, usecols=["Vehicle_ID"])
        local_max = int(df["Vehicle_ID"].max())
        if offset < args.vehicle_id <= offset + local_max:
            original = args.vehicle_id - offset
            print(f"Vehicle {args.vehicle_id} -> '{path}' (drone {drone_id}, original id {original})")
            return 0
        offset += local_max
    print(f"Vehicle {args.vehicle_id} exceeds the aggregated range (max {offset}).")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
