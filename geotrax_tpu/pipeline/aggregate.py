"""`geotrax aggregate` — merge per-video georeferenced CSVs into a dataset.

Behavioral parity with reference geotrax/aggregate.py:77-181: scan
``**/<output.folder>/*.csv`` under the PROCESSED tree, group by
(date, location, session) taken from the path convention
``date/drone_id/session/<results>/file.csv``, sort by drone number, offset
vehicle IDs for uniqueness, add Local_Time / Drone_ID, enforce the fixed
17-column order, and write one CSV per group plus a zip per (date, location).
"""

from __future__ import annotations

import argparse
import logging
import sys
import zipfile
from pathlib import Path

import pandas as pd
from tqdm import tqdm

from geotrax_tpu.utils.cli_utils import add_common_args
from geotrax_tpu.utils.config_utils import load_config
from geotrax_tpu.utils.file_utils import DEFAULT_OUTPUT, determine_location_id
from geotrax_tpu.utils.logging_utils import setup_logger

AGGREGATED_COLUMNS = [
    "Vehicle_ID", "Local_Time", "Drone_ID",
    "Ortho_X", "Ortho_Y", "Local_X", "Local_Y", "Latitude", "Longitude",
    "Vehicle_Length", "Vehicle_Width", "Vehicle_Class",
    "Vehicle_Speed", "Vehicle_Acceleration",
    "Road_Section", "Lane_Number", "Visibility",
]


def _group_files(csv_files, logger):
    """Group files by (date, location, session); each entry is (path, drone_id)."""
    groups: dict[tuple, list] = {}
    for path in csv_files:
        try:
            date = path.parents[3].name
            drone_id = path.parents[2].name
            session = path.parents[1].name
            int(drone_id[1:])  # enforce D<number> here, not in the post-loop sort
            location_id = determine_location_id(path, logger)
            groups.setdefault((date, location_id, session), []).append((path, drone_id))
        except Exception as exc:  # noqa: BLE001 — malformed layout: skip, keep batch alive
            logger.warning(f"Skipping invalid file path {path}: {exc}")
    # deterministic order: numeric drone id ('D10' -> 10), then path
    for key, files in groups.items():
        groups[key] = sorted(files, key=lambda item: (int(item[1][1:]), item[0]))
    return groups


def _load_one(path: Path, drone_id: str, vehicle_id_offset: int) -> pd.DataFrame:
    df = pd.read_csv(path)
    df["Local_Time"] = (
        pd.to_datetime(df["Timestamp"]).dt.strftime("%H:%M:%S.%f").str[:-3]
    )
    df["Drone_ID"] = int(drone_id[1:])
    df["Vehicle_ID"] = df["Vehicle_ID"] + vehicle_id_offset
    df["Lane_Number"] = df["Lane_Number"].apply(
        lambda x: str(int(x)) if pd.notna(x) else ""
    )
    return df[AGGREGATED_COLUMNS]


def aggregate_results(args: argparse.Namespace, logger: logging.Logger) -> None:
    input_path = Path(args.input)
    output_path = Path(args.output_folder) if args.output_folder else input_path.parent / "DATASET"
    logger.info(f"Aggregating: input={input_path} output={output_path}")

    if not input_path.exists():
        logger.critical(f"Input folder '{input_path}' does not exist.")
        sys.exit(1)
    output_path.mkdir(parents=True, exist_ok=True)

    output_cfg = load_config(args.cfg, logger).get("output", DEFAULT_OUTPUT)
    folder_name = output_cfg.get("folder", DEFAULT_OUTPUT["folder"])
    csv_files = list(input_path.rglob(f"**/{folder_name}/*.csv"))
    if not csv_files:
        logger.critical(f"No CSV files found in '{input_path}'")
        sys.exit(1)

    groups = _group_files(csv_files, logger)
    total_unique = 0

    for (date, location_id, session), files in tqdm(
        groups.items(), desc="Aggregating results", unit="group"
    ):
        try:
            subfolder = output_path / f"{date}_{location_id}"
            subfolder.mkdir(exist_ok=True)
            out_file = subfolder / f"{date}_{location_id}_{session}.csv"

            frames = []
            offset = 0
            for path, drone_id in files:
                try:
                    df = _load_one(path, drone_id, offset)
                    offset = int(df["Vehicle_ID"].max())
                    frames.append(df)
                except Exception as exc:  # noqa: BLE001
                    logger.warning(f"Error processing {path}: {exc}")

            if not frames:
                continue
            merged = pd.concat(frames, ignore_index=True)
            merged.sort_values(["Vehicle_ID", "Local_Time"], inplace=True)
            unique = merged["Vehicle_ID"].nunique()
            total_unique += unique
            logger.info(
                f"Group {date}_{location_id}_{session}: {unique} vehicles, {len(merged)} points."
            )
            merged.to_csv(out_file, index=False)

            zip_path = output_path / f"{date}_{location_id}.zip"
            with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
                for csv in subfolder.glob("*.csv"):
                    zf.write(csv, csv.name)
        except Exception as exc:  # noqa: BLE001 — per-group isolation
            logger.error(f"Error in group {date}_{location_id}_{session}: {exc}")

    logger.info(f"Total unique vehicles: {total_unique}. Aggregation complete.")


def parse_cli_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Aggregate georeferenced tracking results")
    parser.add_argument("input", type=Path, help="Path to the PROCESSED folder of georeferenced results.")
    optional = parser.add_argument_group("Optional arguments")
    optional.add_argument(
        "--output-folder", "-of", type=Path, default=None,
        help="Output folder for aggregated results; default: a DATASET folder next to PROCESSED.",
    )
    add_common_args(optional, output_folder=False)
    return parser.parse_args()


def main() -> int:
    args = parse_cli_args()
    logger = setup_logger("geotrax.aggregate", args.verbose, args.log_path)
    aggregate_results(args, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
