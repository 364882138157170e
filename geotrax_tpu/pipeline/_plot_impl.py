"""Plotting stage implementation.

Behavioral parity with reference plot.py:115-756: trajectory maps in every
coordinate system the pipeline produced (unstabilized/stabilized pixels,
orthophoto pixels — plain, on the orthophoto, on the segmentation overlay —
local metres, WGS84 degrees), violin speed/acceleration distributions (plus
the joint twin-axis figure), class counts, vehicle length/width
distributions, per-vehicle kinematics detail, per-file or aggregated per
location ID, threshold-violation reporting (speed > 90 km/h,
|accel| > 5 m/s^2), PDF output to a plots/ sub-folder.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from geotrax_tpu.utils.config_utils import backfill_args_from_config, load_config  # noqa: E402
from geotrax_tpu.utils.constants import (  # noqa: E402
    ACCELERATION_ALERT_MS2,
    RESULTS_FORMATS,
    SPEED_ALERT_KMH,
    VIDEO_FORMATS,
)
from geotrax_tpu.utils.data_utils import PlotColors  # noqa: E402
from geotrax_tpu.utils.file_utils import (  # noqa: E402
    build_result_path,
    detect_delimiter,
    determine_location_id,
    get_output_dir,
)

GEO_COLUMNS = {"Vehicle_ID", "Ortho_X", "Ortho_Y", "Local_X", "Local_Y",
               "Latitude", "Longitude"}


# ---------------------------------------------------------------------------
# Input discovery & loading
# ---------------------------------------------------------------------------

def determine_files_to_process(input_path: Path, plotting_cfg: dict, out_cfg: dict,
                               logger) -> list:
    """Result files to plot: a video resolves to its result files; a results
    file is used directly; a folder is scanned recursively."""
    skip = plotting_cfg.get("skip_filenames_with") or []

    def keep(p: Path) -> bool:
        return not any(token in p.stem for token in skip)

    if input_path.is_file():
        if input_path.suffix.lower() in VIDEO_FORMATS:
            candidates = [
                build_result_path(input_path, "georeferenced", out_cfg),
                build_result_path(input_path, "processed", out_cfg),
            ]
            files = [c for c in candidates if c.exists()]
            if not files:
                logger.critical(f"No result files found for video '{input_path}'.")
                sys.exit(1)
            return [files[0]]
        if input_path.suffix.lower() in RESULTS_FORMATS:
            return [input_path]
        logger.critical(f"Unsupported input '{input_path}'.")
        sys.exit(1)

    folder_name = out_cfg.get("folder", "results")
    files = sorted(
        p for p in input_path.rglob(f"**/{folder_name}/*")
        if p.suffix.lower() in RESULTS_FORMATS and keep(p)
    )
    # prefer georeferenced CSV over the pixel txt for the same stem
    by_stem: dict = {}
    for p in files:
        cur = by_stem.get((p.parent, p.stem))
        if cur is None or (cur.suffix == ".txt" and p.suffix == ".csv"):
            by_stem[(p.parent, p.stem)] = p
    files = sorted(by_stem.values())
    if not files:
        logger.critical(f"No result files found under '{input_path}'.")
        sys.exit(1)
    return files


def read_trajectory_data(path: Path, logger) -> pd.DataFrame:
    """Load either a georeferenced CSV (named columns) or a pixel tracks txt
    into one normalized frame."""
    if path.suffix.lower() == ".csv":
        df = pd.read_csv(path)
        if not GEO_COLUMNS.issubset(df.columns):
            logger.critical(f"'{path}' lacks the georeferenced schema.")
            sys.exit(1)
        return df
    arr = np.loadtxt(path, delimiter=detect_delimiter(path))
    if arr.ndim == 1:
        arr = arr[None, :]
    df = pd.DataFrame({
        "Frame_Number": arr[:, 0].astype(int),
        "Vehicle_ID": arr[:, 1].astype(int),
        "Unstab_X": arr[:, 2], "Unstab_Y": arr[:, 3],
    })
    if arr.shape[1] >= 14:
        df["Stab_X"] = arr[:, 6]
        df["Stab_Y"] = arr[:, 7]
        df["Vehicle_Class"] = arr[:, 10].astype(int)
        df["Pixel_Length"] = arr[:, 12]
        df["Pixel_Width"] = arr[:, 13]
    elif arr.shape[1] >= 10:
        df["Vehicle_Class"] = arr[:, 6].astype(int)
        df["Pixel_Length"] = arr[:, 8]
        df["Pixel_Width"] = arr[:, 9]
    return df


def filter_classes(df: pd.DataFrame, class_filter) -> pd.DataFrame:
    if class_filter and "Vehicle_Class" in df.columns:
        return df[~df["Vehicle_Class"].isin(class_filter)]
    return df


# ---------------------------------------------------------------------------
# Individual figures
# ---------------------------------------------------------------------------

def _save(fig, plots_dir: Path, stem: str, title: str, save: bool, show: bool, logger):
    if save:
        plots_dir.mkdir(parents=True, exist_ok=True)
        out = plots_dir / f"{stem}_{title.replace(' ', '_')}.pdf"
        fig.savefig(out, bbox_inches="tight")
        logger.info(f"Saved plot: '{out}'")
    if show:  # pragma: no cover - interactive
        plt.show()
    plt.close(fig)


def plot_trajectories_xy(datasets, x_col, y_col, title, xlabel, ylabel,
                         plots_dir, stem, cfg, logger, background=None,
                         invert_y=False, points=False):
    """One trajectory map; ``datasets`` is [(label, df)] so aggregation can
    overlay several sources in distinct colors."""
    fig, ax = plt.subplots(figsize=(10, 7))
    colors = PlotColors(cfg.get("colors"))
    if background is not None:
        ax.imshow(background)
    plotted = 0
    for src_idx, (label, df) in enumerate(datasets):
        if x_col not in df.columns:
            # skip just this member (e.g. a pixel-only .txt in an aggregated
            # group) — the others still draw; only an all-miss aborts
            logger.info(f"'{label}': no {x_col} column; omitted from '{title}'.")
            continue
        plotted += 1
        color = colors(src_idx) if len(datasets) > 1 else None
        for _, track in df.groupby("Vehicle_ID"):
            if points:
                ax.scatter(track[x_col], track[y_col], s=1,
                           color=color or colors(0))
            else:
                ax.plot(track[x_col], track[y_col], linewidth=0.7,
                        color=color, alpha=0.8)
    if plotted == 0:
        plt.close(fig)
        return
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title.replace("_", " "))
    if invert_y and background is None:
        ax.invert_yaxis()
    ax.set_aspect("equal", adjustable="datalim")
    _save(fig, plots_dir, stem, title, cfg["save"], cfg["show"], logger)


def plot_kinematic_distribution(df, column, unit, title, plots_dir, stem, cfg, logger,
                                cutoff=None):
    if column not in df.columns:
        return
    import seaborn as sns

    values = df[column].dropna()
    if cutoff is not None and column == "Vehicle_Speed":
        moving_ids = df.groupby("Vehicle_ID")[column].max()
        values = df[df["Vehicle_ID"].isin(moving_ids[moving_ids > cutoff].index)][column].dropna()
    if values.empty:
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    sns.violinplot(x=values, ax=ax, inner="quartile")
    ax.set_xlabel(f"{column.replace('_', ' ')} [{unit}]")
    ax.set_title(title.replace("_", " "))
    _save(fig, plots_dir, stem, title, cfg["save"], cfg["show"], logger)


def plot_kinematics_jointly(df, plots_dir, stem, cfg, logger, cutoff=None):
    if "Vehicle_Speed" not in df.columns or "Vehicle_Acceleration" not in df.columns:
        return
    import seaborn as sns

    sub = df.dropna(subset=["Vehicle_Speed", "Vehicle_Acceleration"])
    if cutoff is not None:
        moving = sub.groupby("Vehicle_ID")["Vehicle_Speed"].max()
        sub = sub[sub["Vehicle_ID"].isin(moving[moving > cutoff].index)]
    if sub.empty:
        return
    fig, ax1 = plt.subplots(figsize=(9, 5))
    sns.violinplot(x=sub["Vehicle_Speed"], ax=ax1, inner="quartile", color="#3274d9")
    ax1.set_xlabel("Vehicle Speed [km/h]")
    ax2 = ax1.twiny()
    sns.violinplot(x=sub["Vehicle_Acceleration"], ax=ax2, inner="quartile", color="#ff9d00")
    ax2.set_xlabel("Vehicle Acceleration [m/s$^2$]")
    ax1.set_title("Speed and acceleration distribution")
    _save(fig, plots_dir, stem, "Speed_and_acceleration_distribution",
          cfg["save"], cfg["show"], logger)


def plot_class_distribution(df, class_names, plots_dir, stem, cfg, logger):
    if "Vehicle_Class" not in df.columns:
        return
    per_vehicle = df.groupby("Vehicle_ID")["Vehicle_Class"].first()
    counts = per_vehicle.value_counts().sort_index()
    fig, ax = plt.subplots(figsize=(7, 5))
    labels = [str(class_names.get(int(c), int(c))) for c in counts.index]
    ax.bar(labels, counts.values, color=[PlotColors()(i) for i in range(len(counts))])
    ax.set_ylabel("Vehicle count")
    ax.set_title("Class distribution")
    for i, v in enumerate(counts.values):
        ax.text(i, v, str(v), ha="center", va="bottom")
    _save(fig, plots_dir, stem, "Class_distribution", cfg["save"], cfg["show"], logger)


def plot_dimension_distribution(df, column, title, unit, plots_dir, stem, cfg, logger):
    if column not in df.columns:
        return
    import seaborn as sns

    per_vehicle = df.groupby("Vehicle_ID")[[column, "Vehicle_Class"]].first().dropna()
    if per_vehicle.empty:
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    sns.boxplot(data=per_vehicle, x="Vehicle_Class", y=column, ax=ax)
    ax.set_ylabel(f"{title.replace('_', ' ')} [{unit}]")
    _save(fig, plots_dir, stem, title, cfg["save"], cfg["show"], logger)


def plot_vehicle_detail(df, vehicle_id, plots_dir, stem, cfg, logger):
    if vehicle_id <= 0 or "Vehicle_Speed" not in df.columns:
        return
    sub = df[df["Vehicle_ID"] == vehicle_id]
    if sub.empty:
        logger.warning(f"Vehicle {vehicle_id} not found; skipping detail plot.")
        return
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 6), sharex=True)
    x = sub["Frame_Number"] if "Frame_Number" in sub.columns else np.arange(len(sub))
    ax1.plot(x, sub["Vehicle_Speed"], color="#3274d9")
    ax1.set_ylabel("Speed [km/h]")
    ax2.plot(x, sub["Vehicle_Acceleration"], color="#ff9d00")
    ax2.set_ylabel("Acceleration [m/s$^2$]")
    ax2.set_xlabel("Frame")
    ax1.set_title(f"Vehicle {vehicle_id} kinematics")
    _save(fig, plots_dir, stem, f"Vehicle_{vehicle_id}_kinematics",
          cfg["save"], cfg["show"], logger)


def report_high_value_instances(df, logger):
    """Data-quality alerts (reference plot.py:598-623 + constants)."""
    if "Vehicle_Speed" in df.columns:
        speeding = df[df["Vehicle_Speed"] > SPEED_ALERT_KMH]
        if len(speeding):
            ids = sorted(speeding["Vehicle_ID"].unique())
            logger.warning(
                f"{len(ids)} vehicle(s) exceed {SPEED_ALERT_KMH:.0f} km/h: {ids[:20]}"
            )
    if "Vehicle_Acceleration" in df.columns:
        harsh = df[df["Vehicle_Acceleration"].abs() > ACCELERATION_ALERT_MS2]
        if len(harsh):
            ids = sorted(harsh["Vehicle_ID"].unique())
            logger.warning(
                f"{len(ids)} vehicle(s) exceed |{ACCELERATION_ALERT_MS2:.0f}| m/s^2: {ids[:20]}"
            )


# ---------------------------------------------------------------------------
# Per-dataset driver
# ---------------------------------------------------------------------------

def plot_dataset(datasets, stem, plots_dir, plotting_cfg, class_names, args, logger):
    """All figures for one dataset (or one aggregated location)."""
    merged = pd.concat([df for _, df in datasets], ignore_index=True)
    cfg = {
        "save": args.save if args.save is not None else plotting_cfg.get("save", True),
        "show": args.show if args.show is not None else plotting_cfg.get("show", False),
        "colors": plotting_cfg.get("colors"),
    }
    points = bool(args.points) if args.points is not None else plotting_cfg.get("plot_points", False)
    cutoff = plotting_cfg.get("stationary_speed_cutoff", 1)
    plt.rcParams.update({"font.size": plotting_cfg.get("savefig_font_size", 14)})

    coordinate_maps = [
        ("Unstab_X", "Unstab_Y", "Unstabilized_image_coordinates", "x [px]", "y [px]", True),
        ("Stab_X", "Stab_Y", "Stabilized_image_coordinates", "x [px]", "y [px]", True),
        ("Ortho_X", "Ortho_Y", "Orthophoto_image_coordinates", "x [px]", "y [px]", True),
        ("Local_X", "Local_Y", "Local_planar_coordinates", "East [m]", "North [m]", False),
        ("Longitude", "Latitude", "Geographic_coordinates", "Longitude [deg]", "Latitude [deg]", False),
    ]
    for x_col, y_col, title, xl, yl, invert in coordinate_maps:
        if x_col in merged.columns:
            plot_trajectories_xy(datasets, x_col, y_col, title, xl, yl,
                                 plots_dir, stem, cfg, logger,
                                 invert_y=invert, points=points)

    # ortho-background variants
    if "Ortho_X" in merged.columns and args.ortho_folder:
        location = determine_location_id(Path(stem + ".x"), logger)
        ortho_png = Path(args.ortho_folder) / f"{location}.png"
        if ortho_png.exists():
            from geotrax_tpu.io.geoassets import load_image

            plot_trajectories_xy(
                datasets, "Ortho_X", "Ortho_Y",
                "Orthophoto_image_coordinates_on_orthophoto", "x [px]", "y [px]",
                plots_dir, stem, cfg, logger, background=load_image(ortho_png),
                points=points,
            )
        use_seg = args.segmentations if args.segmentations is not None else plotting_cfg.get("use_segmentations")
        if use_seg and args.segmentation_folder:
            seg_png = Path(args.segmentation_folder) / f"{location}.png"
            if seg_png.exists():
                from geotrax_tpu.io.geoassets import load_image

                plot_trajectories_xy(
                    datasets, "Ortho_X", "Ortho_Y",
                    "Orthophoto_image_coordinates_on_segmentation_overlay",
                    "x [px]", "y [px]", plots_dir, stem, cfg, logger,
                    background=load_image(seg_png), points=points,
                )

    plot_kinematic_distribution(merged, "Vehicle_Speed", "km/h", "Speed_distribution",
                                plots_dir, stem, cfg, logger, cutoff)
    plot_kinematic_distribution(merged, "Vehicle_Acceleration", "m/s$^2$",
                                "Acceleration_distribution", plots_dir, stem, cfg, logger)
    plot_kinematics_jointly(merged, plots_dir, stem, cfg, logger, cutoff)
    plot_class_distribution(merged, class_names, plots_dir, stem, cfg, logger)
    for col, title in (("Vehicle_Length", "Vehicle_length_distribution"),
                       ("Vehicle_Width", "Vehicle_width_distribution"),
                       ("Pixel_Length", "Vehicle_length_distribution"),
                       ("Pixel_Width", "Vehicle_width_distribution")):
        plot_dimension_distribution(
            merged, col, title, "m" if col.startswith("Vehicle") else "px",
            plots_dir, stem, cfg, logger,
        )
    plot_vehicle_detail(merged, int(getattr(args, "id", 0) or 0), plots_dir, stem, cfg, logger)
    report_high_value_instances(merged, logger)


# ---------------------------------------------------------------------------
# Main flow
# ---------------------------------------------------------------------------

def run_plotting(args, logger: logging.Logger) -> None:
    full = load_config(args.cfg, logger)
    plotting_cfg = full.get("plotting", {})
    out_cfg_raw = full.get("output", {})
    backfill_args_from_config(args, {
        "save": plotting_cfg.get("save", True),
        "show": plotting_cfg.get("show", False),
        "aggregate": plotting_cfg.get("aggregate", False),
        "points": plotting_cfg.get("plot_points", False),
        "segmentations": plotting_cfg.get("use_segmentations", False),
        "class_filter": plotting_cfg.get("class_filter", []),
        "ortho_folder": full.get("input", {}).get("ortho_folder"),
        "segmentation_folder": full.get("input", {}).get("segmentation_folder"),
        "output_folder": out_cfg_raw.get("folder", "results"),
    })
    out_cfg = {**out_cfg_raw, "folder": args.output_folder}

    from geotrax_tpu.utils.config_utils import resolve_class_names

    class_names, _ = resolve_class_names(
        Path("none"), getattr(args, "class_names", None),
        full.get("extraction", {}).get("class_rename"),
        full.get("ultralytics", {}).get("classes"), logger,
    )

    input_path = Path(args.input)
    files = determine_files_to_process(input_path, plotting_cfg, out_cfg, logger)

    try:
        if args.aggregate and input_path.is_dir():
            groups: dict = {}
            for f in files:
                loc = determine_location_id(f, logger)
                groups.setdefault(loc, []).append(f)
            for loc, members in groups.items():
                datasets = [
                    (m.stem, filter_classes(read_trajectory_data(m, logger), args.class_filter))
                    for m in members
                ]
                plots_dir = input_path / "plots"
                plot_dataset(datasets, loc, plots_dir, plotting_cfg, class_names, args, logger)
        else:
            for f in files:
                df = filter_classes(read_trajectory_data(f, logger), args.class_filter)
                plots_dir = f.parent / "plots"
                plot_dataset([(f.stem, df)], f.stem, plots_dir, plotting_cfg,
                             class_names, args, logger)
    except KeyboardInterrupt:
        logger.error("Plotting interrupted by user.")
