"""Georeferencing stage implementation.

Behavioral parity with reference georeference.py:109-889, re-architected so
the numeric hot spots (homography application, CRS projection, smoothing,
point-in-polygon) run through the ops layer:

pixel (stabilized) -> ortho px  : 3x3 homography (master two-hop, cached)
ortho px -> WGS84               : affine from the ortho geo-parameters
WGS84 -> local CRS              : Karney transverse-mercator series
                                  (ops/tmerc, float64 host path; <=1e-4 m
                                  vs PROJ, validated on the golden CSV)
speed/accel                     : finite differences x fps (x3.6 km/h) with
                                  scipy-parity gaussian/savgol smoothing
lane assignment                 : vectorized point-in-quad (ops/polygon)

Outputs: 16/17/18-col georeferenced CSV with the reference's exact rounding
schema and the geo homography txt (%.20g).
"""

from __future__ import annotations

import hashlib
import logging
import sys
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd
from tqdm import tqdm

from geotrax_tpu.io import geoassets
from geotrax_tpu.ops.filters import gaussian_filter1d_np, savgol_filter_np
from geotrax_tpu.ops.tmerc import geo2local as tmerc_geo2local
from geotrax_tpu.utils.config_utils import backfill_args_from_config, load_config_all
from geotrax_tpu.utils.file_utils import (
    build_result_path,
    check_if_results_exist,
    detect_delimiter,
    determine_location_id,
    get_ortho_folder,
    get_output_dir,
)


# ---------------------------------------------------------------------------
# Inputs
# ---------------------------------------------------------------------------

def get_tracking_data(source: Path, logger, output_cfg=None) -> tuple:
    exists, path = check_if_results_exist(source, "processed", output_cfg=output_cfg)
    if not exists:
        logger.critical(f"No tracking data for '{source}'; run 'geotrax extract' first.")
        sys.exit(1)
    tracks = np.loadtxt(path, delimiter=detect_delimiter(path), dtype=np.float64)
    if tracks.size == 0 or tracks.ndim != 2:
        logger.critical(f"No valid tracking data in '{path}'.")
        sys.exit(1)
    if tracks.shape[1] < 14:
        logger.critical(
            f"Invalid tracking data format in '{path}': expected >= 14 columns "
            "(stabilized layout). Re-run extraction with stabilization enabled."
        )
        sys.exit(1)
    is_interp = tracks[:, 14].astype(int) if tracks.shape[1] >= 15 else None
    return (
        tracks[:, 1].astype(int),    # track_id
        tracks[:, 0].astype(int),    # frame_num
        tracks[:, 2:6],              # bbox_unstab
        tracks[:, 6],                # x_stab
        tracks[:, 7],                # y_stab
        tracks[:, 10].astype(int),   # class_id
        tracks[:, 12:14],            # dimensions px
        is_interp,
    )


def get_timestamps(source: Path, frame_num: np.ndarray, logger) -> np.ndarray:
    path = source.with_suffix(".csv")
    if not path.exists() and source.with_suffix(".CSV").exists():
        path = source.with_suffix(".CSV")
    if not path.exists():
        logger.warning(f"No flight-log timestamps at '{path}'; frame numbers used instead.")
        return np.array([])
    table = pd.read_csv(path, index_col="frame")
    if len(table) == 0:
        logger.warning(f"Flight log '{path}' has no rows; frame numbers used instead.")
        return np.array([])
    if table.index[0] != 0:
        logger.warning("Flight log does not start at frame 0; rebasing indices.")
        table.index = table.index - table.index[0]
    undefined = "0000-00-00 00:00:00.000"
    # first occurrence wins on duplicated frame indices (a dup would make
    # .loc return a Series and produce a ragged Timestamp column)
    lookup = table["timestamp"][~table.index.duplicated(keep="first")]
    out = [lookup.loc[f] if f in lookup.index else undefined for f in frame_num]
    logger.info(f"Loaded timestamps from '{path}'.")
    return np.asarray(out)


def get_video_data(source: Path, ref_frame_num: int, logger) -> tuple:
    from geotrax_tpu.io.video import VideoReader, probe_video

    info = probe_video(source)
    if not info.fps:
        logger.critical(f"Cannot read FPS from '{source}'.")
        sys.exit(1)
    reader = VideoReader(source)
    ref_frame = reader.read_frame(ref_frame_num)
    logger.info(
        f"Reference frame {ref_frame_num} loaded from '{source}' "
        f"({info.height}x{info.width} @ {info.fps:.2f} fps)."
    )
    return ref_frame, (info.height, info.width), info.fps


# ---------------------------------------------------------------------------
# Homography chain
# ---------------------------------------------------------------------------

def compute_homography(img_src, img_dst, src_dst, logger, **matching_cfg):
    from geotrax_tpu.utils.registration import estimate_homography

    matching_cfg = {k: v for k, v in matching_cfg.items()}
    homography, inliers, n_matches, (n_src, n_dst) = estimate_homography(
        img_src, img_dst, logger, **matching_cfg
    )
    if homography is None:
        sys.exit(1)
    stats = (
        f"Keypoints in {src_dst[0]} frame: {n_src}, in {src_dst[1]}: {n_dst}. "
        f"Inliers: {inliers} out of {n_matches} matches"
    )
    (logger.warning if inliers < 50 else logger.info)(stats)
    return homography, stats


def compute_hash(image: np.ndarray) -> str:
    return hashlib.md5(image.tobytes()).hexdigest()


def get_master_to_ortho_homography(
    master_frame, ortho_folder, master_folder, location_id, recompute, matching_cfg, logger
):
    folder = master_folder if master_folder is not None else ortho_folder / "master_frames"
    cache_path = Path(folder) / f"{location_id}.txt"
    current_hash = compute_hash(master_frame)

    if cache_path.exists() and not recompute:
        try:
            lines = cache_path.read_text().splitlines()
            h = np.fromstring(lines[0], sep=",").reshape(3, 3)
            saved_hash = lines[3].strip().split(": ")[1]
            if saved_hash == current_hash:
                logger.info(f"Loaded cached master->ortho homography from '{cache_path}'.")
                return h
            logger.warning("Master frame changed; recomputing master->ortho homography.")
        except Exception as exc:  # noqa: BLE001
            logger.error(f"Failed to read homography cache '{cache_path}': {exc}")
            sys.exit(1)

    ortho = geoassets.get_orthophoto(ortho_folder, location_id, logger)
    h, stats = compute_homography(master_frame, ortho, ("master", "ortho"), logger, **matching_cfg)
    try:
        with open(cache_path, "w") as fh:
            np.savetxt(fh, h.reshape(1, -1), fmt="%.20g", delimiter=",")
            fh.write("\n# Hash of the master frame\n")
            fh.write(f"Hash: {current_hash}\n")
            fh.write("\n# Image matching stats\n")
            fh.write(f"Stats: {stats}\n")
    except OSError as exc:
        logger.error(f"Failed to save homography cache '{cache_path}': {exc}")
        sys.exit(1)
    logger.info(f"Computed and cached master->ortho homography at '{cache_path}'.")
    return h


# ---------------------------------------------------------------------------
# Coordinate math
# ---------------------------------------------------------------------------

def apply_homography_np(x: np.ndarray, y: np.ndarray, h: np.ndarray) -> tuple:
    pts = np.column_stack([x, y, np.ones(len(x))])
    mapped = pts @ h.T
    return mapped[:, 0] / mapped[:, 2], mapped[:, 1] / mapped[:, 2]


def ortho2geo(ortho_x, ortho_y, ortho_params) -> tuple:
    lng0, lat0, dlng, dlat, skew_x, skew_y = ortho_params
    longitude = lng0 + dlng * ortho_x + skew_x * ortho_y
    latitude = lat0 + dlat * ortho_y + skew_y * ortho_x
    return latitude, longitude


def geo2local(latitude, longitude, source_crs: str, target_crs: str) -> tuple:
    return tmerc_geo2local(latitude, longitude, source_crs, target_crs, xp=np)


def frame2local(points_px, homography, ortho_params, source_crs, target_crs) -> np.ndarray:
    ox, oy = apply_homography_np(points_px[:, 0], points_px[:, 1], homography)
    lat, lng = ortho2geo(ox, oy, ortho_params)
    x, y = geo2local(lat, lng, source_crs, target_crs)
    return np.stack([x, y], axis=-1)


def convert_dimensions(track_ids, veh_dim_px, frame_size, homography, ortho_params,
                       source_crs, target_crs) -> tuple:
    """Per-track px -> metre dimensions via probe points at the frame center
    (reference :651-680)."""
    length_px, width_px = veh_dim_px.T
    center = np.array([frame_size[1] / 2, frame_size[0] / 2])
    # one batched frame2local over every track's 3 probe points instead of a
    # per-track transform (the homography+CRS chain per call was the tail at
    # Songdo scale, ~700k trajectories)
    uniq, first_idx, inv = np.unique(track_ids, return_index=True,
                                     return_inverse=True)
    lp = length_px[first_idx]
    wp = width_px[first_idx]
    ok = ~(np.isnan(lp) | np.isnan(wp))
    lr_u = np.full(len(uniq), np.nan)
    wr_u = np.full(len(uniq), np.nan)
    if ok.any():
        lp_ok, wp_ok = lp[ok], wp[ok]
        k = len(lp_ok)
        probes = np.empty((3 * k, 2))
        probes[0::3] = center
        probes[1::3] = center + np.stack([np.zeros(k), wp_ok / 2], axis=1)
        probes[2::3] = center + np.stack([lp_ok / 2, np.zeros(k)], axis=1)
        pts = frame2local(probes, homography, ortho_params, source_crs, target_crs)
        p1, p2, p3 = pts[0::3], pts[1::3], pts[2::3]
        lr_u[ok] = 2 * np.linalg.norm(p1 - p3, axis=1)
        wr_u[ok] = 2 * np.linalg.norm(p1 - p2, axis=1)
    return lr_u[inv], wr_u[inv]


def calculate_visibility(track_ids, bbox_unstab, frame_size, visibility_margin: int = 4):
    x, y, w, h = bbox_unstab.T
    frame_w, frame_h = frame_size[1], frame_size[0]
    visible_x = (x - w / 2 > visibility_margin) & (x + w / 2 < frame_w - visibility_margin - 1)
    visible_y = (y - h / 2 > visibility_margin) & (y + h / 2 < frame_h - visibility_margin - 1)
    return visible_x & visible_y


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------

def apply_filter(data: np.ndarray, kernel_size: int, filter_type: str = "gaussian"):
    if filter_type == "gaussian":
        return gaussian_filter1d_np(data, kernel_size, mode="reflect", truncate=3.0)
    if filter_type == "savgol":
        return savgol_filter_np(data, kernel_size, polyorder=2, mode="nearest")
    raise ValueError(f"Invalid filter type '{filter_type}' (gaussian|savgol).")


def compute_speed(x, y, fps: float) -> np.ndarray:
    return np.hypot(np.diff(x), np.diff(y)) * fps


def compute_acceleration(speed, fps: float) -> np.ndarray:
    return np.diff(speed) * fps


def interpolate_missing_points(frames, x, y) -> tuple:
    """Densify frame gaps linearly; returns (x_dense, y_dense, present_idx).

    Vectorized: one np.interp per axis over the dense frame range (the
    per-gap Python append loop was O(dense_length) interpreter work per
    track, the kinematics hot spot at campaign scale)."""
    frames = np.asarray(frames, dtype=np.int64)
    dense = np.arange(frames[0], frames[-1] + 1)
    x_dense = np.interp(dense, frames, x)
    y_dense = np.interp(dense, frames, y)
    present = frames - frames[0]
    return x_dense, y_dense, present


def compute_kinematics(track_ids, frame_num, x_local, y_local, visibility, fps,
                       filter_type, kernel_size, is_interpolated=None,
                       conversion_factor: float = 3.6) -> tuple:
    """Speed [km/h] and acceleration [m/s^2] per row; only visible, real
    (non-interpolated) points participate (reference :705-735)."""
    speed = np.full(len(track_ids), np.nan)
    acceleration = np.full(len(track_ids), np.nan)
    # group rows per track via one stable sort (the per-track boolean scan
    # was O(tracks x rows))
    order = np.argsort(track_ids, kind="stable")
    _, starts = np.unique(track_ids[order], return_index=True)
    bounds = list(starts[1:]) + [len(order)]
    for s, e in zip(starts, bounds):
        idx = np.sort(order[s:e])
        real = (is_interpolated[idx] == 0) if is_interpolated is not None else np.ones(len(idx), bool)
        usable = visibility[idx] & real
        if usable.sum() < 3:
            continue
        frames = frame_num[idx][usable]
        xs = x_local[idx][usable]
        ys = y_local[idx][usable]
        x_dense, y_dense, present = interpolate_missing_points(frames, xs, ys)
        speed_vals = compute_speed(x_dense, y_dense, fps)
        speed_vals = apply_filter(speed_vals, kernel_size, filter_type)
        accel_vals = compute_acceleration(speed_vals, fps)
        speed_vals = speed_vals * conversion_factor
        speed_vals = np.insert(speed_vals, 0, np.nan)
        accel_vals = np.insert(accel_vals, 0, [np.nan] * 2)
        speed[idx[usable]] = speed_vals[present]
        acceleration[idx[usable]] = accel_vals[present]
    return speed, acceleration


# ---------------------------------------------------------------------------
# Lane assignment (ops/polygon)
# ---------------------------------------------------------------------------

def assign_road_section_lane(ortho_x, ortho_y, segmentation: pd.DataFrame) -> tuple:
    if segmentation.empty:
        return None, None
    import jax.numpy as jnp

    from geotrax_tpu.ops.polygon import assign_first_polygon

    seg = segmentation.copy()
    extra = list(segmentation.columns[10:])  # pass through any extra columns
    seg.columns = ["section", "lane", "tlx", "tly", "blx", "bly", "brx", "bry", "trx", "try"] + extra
    polys = np.stack([
        seg[["tlx", "tly"]].to_numpy(),
        seg[["blx", "bly"]].to_numpy(),
        seg[["brx", "bry"]].to_numpy(),
        seg[["trx", "try"]].to_numpy(),
    ], axis=1).astype(np.float32)  # (M,4,2)
    points = np.stack([ortho_x, ortho_y], axis=-1).astype(np.float32)
    hit = np.asarray(assign_first_polygon(jnp.asarray(points), jnp.asarray(polys)))
    section = np.where(hit >= 0, seg["section"].to_numpy()[np.clip(hit, 0, len(seg) - 1)], None)
    lane = np.where(hit >= 0, seg["lane"].to_numpy().astype(float)[np.clip(hit, 0, len(seg) - 1)], np.nan)
    return section, lane


# ---------------------------------------------------------------------------
# Output formatting
# ---------------------------------------------------------------------------

def create_and_format_georeferenced_df(
    track_id, timestamps, frame_num, x_ortho, y_ortho, x_local, y_local,
    latitude, longitude, veh_dim_real, class_id, speed, acceleration,
    road_section, lane_number, visibility, min_traj_length,
    is_interpolated=None, *, logger,
) -> pd.DataFrame:
    data = {
        "Vehicle_ID": track_id,
        "Timestamp": timestamps if timestamps.size > 0 else None,
        "Frame_Number": frame_num,
        "Ortho_X": np.round(x_ortho, 1),
        "Ortho_Y": np.round(y_ortho, 1),
        "Local_X": np.round(x_local, 2),
        "Local_Y": np.round(y_local, 2),
        "Latitude": np.round(latitude, 7),
        "Longitude": np.round(longitude, 7),
        "Vehicle_Length": np.round(veh_dim_real[0], 2),
        "Vehicle_Width": np.round(veh_dim_real[1], 2),
        "Vehicle_Class": class_id,
        "Vehicle_Speed": np.round(speed, 1),
        "Vehicle_Acceleration": np.round(acceleration, 2),
        "Road_Section": road_section,
        "Lane_Number": lane_number,
        "Visibility": visibility.astype(int),
        "Is_Interpolated": is_interpolated,
    }
    df = pd.DataFrame({k: v for k, v in data.items() if v is not None})
    if "Lane_Number" in df.columns:
        # vectorized int-string formatting: a per-row lambda here cost ~40% of
        # the whole stage at Songdo scale (1.8M rows)
        ln = df["Lane_Number"].to_numpy()
        out = np.full(len(ln), "", dtype=object)
        mask = ~pd.isna(ln)
        if mask.any():
            out[mask] = ln[mask].astype(np.int64).astype(str)
        df["Lane_Number"] = out
    if min_traj_length > 0:
        before = df["Vehicle_ID"].nunique()
        # per-ID counts via transform (groupby().filter with a Python lambda
        # materializes a sub-DataFrame per vehicle)
        if "Is_Interpolated" in df.columns:
            counts = (
                df["Is_Interpolated"].eq(0)
                .groupby(df["Vehicle_ID"]).transform("sum")
            )
        else:
            counts = df.groupby("Vehicle_ID")["Vehicle_ID"].transform("size")
        df = df[counts >= min_traj_length]
        removed = before - df["Vehicle_ID"].nunique()
        if removed:
            logger.info(f"Removed {removed} vehicles with fewer than {min_traj_length} points.")
    return df


# ---------------------------------------------------------------------------
# Main flow
# ---------------------------------------------------------------------------

def run_georeferencing(args, logger: logging.Logger) -> None:
    full_config = load_config_all(args, logger, needs_model=False)
    config = full_config["georef"]
    gproc = config["processing"]
    folders = full_config["main"]["input"]
    out_cfg_raw = full_config["main"].get("output", {})
    backfill_args_from_config(args, {
        "ref_frame": gproc["ref_frame"],
        "recompute": gproc["recompute"],
        "geo_source": gproc["geo_source"],
        "no_master": not gproc["use_master"],
        "ortho_folder": Path(folders["ortho_folder"]) if folders.get("ortho_folder") else None,
        "master_folder": Path(folders["master_folder"]) if folders.get("master_folder") else None,
        "segmentation_folder": Path(folders["segmentation_folder"]) if folders.get("segmentation_folder") else None,
        "output_folder": out_cfg_raw.get("folder", "results"),
    })
    out_cfg = {**out_cfg_raw, "folder": args.output_folder}

    steps = 8 if args.no_master else 10
    pbar = tqdm(total=steps, unit="step", desc=f"{Path(args.source).name} - georeferencing")

    pbar.set_postfix_str("loading tracking data")
    location_id = determine_location_id(Path(args.source), logger)
    (track_id, frame_num, bbox_unstab, x_stab, y_stab, class_id,
     veh_dim_px, is_interpolated) = get_tracking_data(Path(args.source), logger, out_cfg)
    timestamps = get_timestamps(Path(args.source), frame_num, logger)
    pbar.update()

    pbar.set_postfix_str("reading reference frame")
    reference_frame, frame_size, fps = get_video_data(Path(args.source), args.ref_frame, logger)
    pbar.update()

    pbar.set_postfix_str("loading orthophoto data")
    ortho_folder = get_ortho_folder(Path(args.source), args.ortho_folder, logger)
    geo_source = geoassets.get_geo_params_source(args.geo_source, ortho_folder, location_id, logger)
    ortho_params = geoassets.get_ortho_parameters(
        ortho_folder, location_id, geo_source, config["transformation"]["cutout_width_px"], logger
    )
    segmentation = geoassets.get_road_section_lane_geometry(
        ortho_folder, args.segmentation_folder, location_id, logger
    )
    pbar.update()

    matching_cfg = config["matching"]
    if args.no_master:
        pbar.set_postfix_str("computing reference -> orthophoto homography")
        ortho = geoassets.get_orthophoto(ortho_folder, location_id, logger)
        h_ref_to_ortho, _ = compute_homography(
            reference_frame, ortho, ("reference", "ortho"), logger, **matching_cfg
        )
        pbar.update()
    else:
        pbar.set_postfix_str("loading master frame")
        master_frame = geoassets.get_master_frame(ortho_folder, args.master_folder, location_id, logger)
        pbar.update()
        pbar.set_postfix_str("computing reference -> master homography")
        h_ref_to_master, _ = compute_homography(
            reference_frame, master_frame, ("reference", "master"), logger, **matching_cfg
        )
        pbar.update()
        pbar.set_postfix_str("computing master -> orthophoto homography")
        h_master_to_ortho = get_master_to_ortho_homography(
            master_frame, ortho_folder, args.master_folder, location_id,
            args.recompute, matching_cfg, logger,
        )
        h_ref_to_ortho = h_master_to_ortho @ h_ref_to_master
        pbar.update()

    pbar.set_postfix_str("transforming coordinates")
    x_ortho, y_ortho = apply_homography_np(x_stab, y_stab, h_ref_to_ortho)
    latitude, longitude = ortho2geo(x_ortho, y_ortho, ortho_params)
    source_crs = config["transformation"]["source_crs"]
    target_crs = config["transformation"]["target_crs"]
    x_local, y_local = geo2local(latitude, longitude, source_crs, target_crs)
    veh_dim_real = convert_dimensions(
        track_id, veh_dim_px, frame_size, h_ref_to_ortho, ortho_params, source_crs, target_crs
    )
    visibility = calculate_visibility(
        track_id, bbox_unstab, frame_size, config["filtering"]["visibility_margin"]
    )
    pbar.update()

    pbar.set_postfix_str("computing kinematics")
    speed, acceleration = compute_kinematics(
        track_id, frame_num, x_local, y_local, visibility, fps,
        config["filtering"]["filter_type"], config["filtering"]["kernel_size"],
        is_interpolated=is_interpolated,
    )
    pbar.update()

    pbar.set_postfix_str("assigning road sections")
    road_section, lane_number = assign_road_section_lane(x_ortho, y_ortho, segmentation)
    pbar.update()

    pbar.set_postfix_str("saving results")
    df = create_and_format_georeferenced_df(
        track_id, timestamps, frame_num, x_ortho, y_ortho, x_local, y_local,
        latitude, longitude, veh_dim_real, class_id, speed, acceleration,
        road_section, lane_number, visibility, config["filtering"]["min_traj_length"],
        is_interpolated, logger=logger,
    )
    out_path = build_result_path(Path(args.source), "georeferenced", out_cfg)
    get_output_dir(Path(args.source), out_cfg).mkdir(parents=True, exist_ok=True)
    df.to_csv(out_path, index=False)
    logger.info(f"Georeferenced data saved to '{out_path}'.")

    geo_transf_path = build_result_path(Path(args.source), "geo_transformations", out_cfg)
    np.savetxt(geo_transf_path, h_ref_to_ortho.reshape(1, -1), fmt="%.20g", delimiter=",")
    logger.info(f"Reference->ortho homography saved to '{geo_transf_path}'.")
    pbar.update()
    pbar.close()
