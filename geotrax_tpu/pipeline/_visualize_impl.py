"""Visualization stage implementation: annotated videos in 5 modes.

Behavioral parity with reference visualize.py:131-966. Host-side cv2
drawing (I/O-bound; OpenCV available) with the frame warp runnable through
ops/warp on device for mode 1/4 batches. Modes:

  0 boxes on the original frame          3 oriented boxes back-projected
  1 boxes on the warped (stabilized)       onto the original frame (H^-1)
    frame                                4 oriented boxes on the stabilized
  2 boxes on the static reference frame    frame

Oriented modes derive per-frame headings from the Gaussian-smoothed gradient
of the stabilized trajectory (held below min speed, bbox-aspect fallback),
use the azimuth dimension estimates (falling back to per-vehicle Q25 of raw
bbox extents, drawn dashed), and clip edge-touching boxes to the smoothed
visible footprint (Sutherland-Hodgman polygon / Liang-Barsky segment clip).
"""

from __future__ import annotations

import logging
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd
from tqdm import tqdm

from geotrax_tpu.ops.filters import gaussian_filter1d_np
from geotrax_tpu.utils.config_utils import (
    backfill_args_from_config,
    load_config_all,
)
from geotrax_tpu.utils.data_utils import VizColors
from geotrax_tpu.utils.file_utils import (
    build_result_path,
    check_if_results_exist,
    detect_delimiter,
    determine_suffix_and_fourcc,
    get_output_dir,
    get_video_dimensions,
)

TXT_COLOR = (255, 255, 255)


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------

def draw_dashed_poly(frame, corners, color, thickness, dash: int = 10, gap: int = 5):
    import cv2

    n = len(corners)
    for i in range(n):
        p1 = corners[i].astype(float)
        p2 = corners[(i + 1) % n].astype(float)
        dist = float(np.hypot(*(p2 - p1)))
        if dist < 1:
            continue
        direction = (p2 - p1) / dist
        t = 0.0
        while t < dist:
            a = (p1 + direction * t).astype(np.int32)
            b = (p1 + direction * min(t + dash, dist)).astype(np.int32)
            cv2.line(frame, tuple(a), tuple(b), color, thickness, cv2.LINE_AA)
            t += dash + gap


def clip_poly_to_rect(corners, xmin, ymin, xmax, ymax) -> np.ndarray:
    """Sutherland-Hodgman clip of a convex polygon to an axis-aligned rect."""
    poly = [np.asarray(c, float) for c in corners]
    for axis, bound, sign in (("x", xmin, 1), ("x", xmax, -1), ("y", ymin, 1), ("y", ymax, -1)):
        if not poly:
            break
        ai = 0 if axis == "x" else 1
        out = []
        n = len(poly)
        for i in range(n):
            cur, prev = poly[i], poly[(i - 1) % n]
            cur_in = sign * (cur[ai] - bound) >= 0
            prev_in = sign * (prev[ai] - bound) >= 0
            if cur_in:
                if not prev_in:
                    out.append(_axis_intersect(prev, cur, ai, bound))
                out.append(cur)
            elif prev_in:
                out.append(_axis_intersect(prev, cur, ai, bound))
        poly = out
    return np.array(poly, np.float32) if poly else np.empty((0, 2), np.float32)


def _axis_intersect(p0, p1, axis, bound):
    denom = p1[axis] - p0[axis]
    t = 0.0 if denom == 0 else (bound - p0[axis]) / denom
    return p0 + t * (p1 - p0)


def clip_segment_to_rect(p0, p1, xmin, ymin, xmax, ymax):
    """Liang-Barsky segment clip; None if entirely outside."""
    p0 = np.asarray(p0, float)
    d = np.asarray(p1, float) - p0
    t0, t1 = 0.0, 1.0
    for pi, qi in ((-d[0], p0[0] - xmin), (d[0], xmax - p0[0]),
                   (-d[1], p0[1] - ymin), (d[1], ymax - p0[1])):
        if pi == 0:
            if qi < 0:
                return None
            continue
        t = qi / pi
        if pi < 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return None
    return p0 + t0 * d, p0 + t1 * d


def _project(points: np.ndarray, h_inv: np.ndarray) -> np.ndarray:
    pts = np.concatenate([points, np.ones((len(points), 1))], axis=1)
    mapped = pts @ h_inv.T
    return mapped[:, :2] / mapped[:, 2:3]


def draw_oriented_box(frame, cx, cy, length, width, heading, h_inv, color,
                      line_width, dashed=False, clip_w=None, clip_h=None,
                      on_border=False) -> tuple:
    """Rotated box built in stabilized space, optionally clipped to the
    visible footprint, projected via h_inv, drawn (dashed for fallback /
    interpolated rows) with a heading tick. Returns the projected center."""
    import cv2

    if heading is None or np.isnan(heading):
        ux, uy = 1.0, 0.0
    else:
        ux, uy = np.cos(heading), np.sin(heading)
    vx, vy = -uy, ux
    hl, hw = length / 2.0, width / 2.0
    corners = np.array([
        [cx + hl * ux - hw * vx, cy + hl * uy - hw * vy],
        [cx + hl * ux + hw * vx, cy + hl * uy + hw * vy],
        [cx - hl * ux + hw * vx, cy - hl * uy + hw * vy],
        [cx - hl * ux - hw * vx, cy - hl * uy - hw * vy],
    ], np.float32)
    center = np.array([cx, cy], np.float32)
    front = np.array([cx + hl * ux, cy + hl * uy], np.float32)
    tick = (center, front)

    if on_border and clip_w is not None and clip_h is not None:
        xmin, ymin = cx - clip_w / 2.0, cy - clip_h / 2.0
        xmax, ymax = cx + clip_w / 2.0, cy + clip_h / 2.0
        clipped = clip_poly_to_rect(corners, xmin, ymin, xmax, ymax)
        if len(clipped) >= 3:
            corners = clipped
        tick = clip_segment_to_rect(center, front, xmin, ymin, xmax, ymax)

    proj = _project(corners, h_inv).astype(np.int32)
    center_proj = _project(center[None], h_inv)[0].astype(np.int32)
    if dashed:
        draw_dashed_poly(frame, proj, color, line_width)
    else:
        cv2.polylines(frame, [proj.reshape(-1, 1, 2)], True, color, line_width, cv2.LINE_AA)
    if tick is not None:
        tick_proj = _project(np.array(tick, np.float32), h_inv).astype(np.int32)
        cv2.line(frame, tuple(tick_proj[0]), tuple(tick_proj[1]), color, line_width, cv2.LINE_AA)
    return int(center_proj[0]), int(center_proj[1])


# ---------------------------------------------------------------------------
# Data readers
# ---------------------------------------------------------------------------

def compute_headings(tracks: pd.DataFrame, smoothing: float, min_speed: float,
                     logger) -> pd.Series:
    """Per-frame heading (radians, image coords) of each track's stabilized
    trajectory; held over unreliable frames, bbox-aspect fallback when the
    track never moves (reference visualize.py:490-523)."""
    headings = pd.Series(np.nan, index=tracks.index, dtype=float)
    sigma = max(float(smoothing), 1e-6)
    for _, grp in tracks.groupby(1):
        grp = grp.sort_values(0)
        aspect_fallback = np.pi / 2 if np.median(grp[5]) > np.median(grp[4]) else 0.0
        if len(grp) < 2:
            headings.loc[grp.index] = aspect_fallback
            continue
        x = grp[6].to_numpy(float)
        y = grp[7].to_numpy(float)
        dx = gaussian_filter1d_np(np.gradient(x), sigma, mode="reflect")
        dy = gaussian_filter1d_np(np.gradient(y), sigma, mode="reflect")
        reliable = np.hypot(dx, dy) >= min_speed
        if not reliable.any():
            headings.loc[grp.index] = aspect_fallback
            continue
        theta = np.where(reliable, np.arctan2(dy, dx), np.nan)
        theta = pd.Series(theta).ffill().bfill().to_numpy()
        headings.loc[grp.index] = theta
    return headings


def smooth_clip_dims(oriented: pd.DataFrame, smoothing: float) -> pd.DataFrame:
    """Per-track Gaussian smoothing of the clip-rectangle extents."""
    sigma = max(float(smoothing), 1e-6)
    out = oriented[[10, 11]].astype(float).copy()
    for _, grp in oriented.groupby(1):
        grp = grp.sort_values(0)
        out.loc[grp.index, 10] = gaussian_filter1d_np(grp[10].to_numpy(float), sigma, mode="reflect")
        out.loc[grp.index, 11] = gaussian_filter1d_np(grp[11].to_numpy(float), sigma, mode="reflect")
    return out


def estimate_fallback_dims(tracks: pd.DataFrame) -> tuple:
    """Per-vehicle Q25 of raw bbox max/min extents (cols 4/5)."""
    tmp = pd.DataFrame({
        "l": tracks[[4, 5]].max(axis=1),
        "w": tracks[[4, 5]].min(axis=1),
        "id": tracks[1],
    })
    q25 = tmp.groupby("id")[["l", "w"]].transform(lambda s: np.percentile(s, 25))
    return q25["l"], q25["w"]


def read_tracks(tracks_path: Path, class_names: dict, args, logger) -> tuple:
    """Column-count dispatch over the 10/11/14/15-column formats; returns
    (tracks, tracks_plotting) with the reference's slim layouts."""
    tracks = pd.read_csv(tracks_path, header=None, delimiter=detect_delimiter(tracks_path))

    if args.viz_mode in (3, 4):
        return read_tracks_oriented(tracks, tracks_path, class_names, args, logger)

    if tracks.shape[1] in (11, 15):
        is_interpolated = tracks.iloc[:, -1].values
        tracks = tracks.drop(tracks.columns[-1], axis=1)
    else:
        is_interpolated = None
    if tracks.shape[1] == 10 or tracks.shape[1] >= 14:
        tracks = tracks.drop(tracks.columns[12:], axis=1)
    if args.plot_trajectories and tracks.shape[1] < 11:
        logger.error(f"No stabilized boxes in '{tracks_path}'; disable --plot-trajectories.")
        sys.exit(1)
    tracks_plotting = tracks[[0, 6, 7, 10]].copy() if tracks.shape[1] >= 11 else None
    if tracks_plotting is not None:
        tracks_plotting.columns = list(range(tracks_plotting.shape[1]))
    if args.viz_mode > 0:
        if tracks.shape[1] < 11:
            logger.error(f"No stabilized boxes in '{tracks_path}' for viz mode {args.viz_mode}.")
            sys.exit(1)
        tracks = tracks.drop(tracks.columns[2:6], axis=1)
    elif tracks.shape[1] > 10:
        tracks = tracks.drop(tracks.columns[6:10], axis=1)
    elif tracks.shape[1] < 7:
        logger.error(f"No valid tracking results in '{tracks_path}'.")
        sys.exit(1)
    tracks.columns = list(range(tracks.shape[1]))
    if is_interpolated is not None:
        tracks[tracks.shape[1]] = is_interpolated

    if len(class_names) < tracks[6].max() + 1:
        logger.error(f"At least {int(tracks[6].max()) + 1} class names required.")
        sys.exit(1)
    return tracks, tracks_plotting


def read_tracks_oriented(tracks, tracks_path, class_names, args, logger) -> tuple:
    """Slim oriented layout [frame, id, stab_x, stab_y, length, width, class,
    conf, heading, is_dashed, clip_w, clip_h, on_border]."""
    if tracks.shape[1] < 14:
        logger.error(
            f"Viz modes 3/4 need stabilized tracks with dimension estimates (14 cols) in '{tracks_path}'."
        )
        sys.exit(1)
    tracks_plotting = tracks[[0, 6, 7, 10]].copy()
    tracks_plotting.columns = list(range(tracks_plotting.shape[1]))

    headings = compute_headings(tracks, args.heading_smoothing, args.heading_min_speed, logger)
    is_fallback = tracks[12].isna()
    is_interp = tracks[14].astype(bool) if tracks.shape[1] >= 15 else pd.Series(False, index=tracks.index)
    is_dashed = is_fallback | is_interp
    fb_l, fb_w = estimate_fallback_dims(tracks)
    length = tracks[12].where(~is_fallback, fb_l)
    width = tracks[13].where(~is_fallback, fb_w)

    eps = getattr(args, "edge_clip_margin", None)
    eps = 3 if eps is None else eps  # 0 is a legal value (reference: [0, inf))
    source = getattr(args, "source", None)
    w_frame, h_frame = get_video_dimensions(source) if source is not None else (np.inf, np.inf)
    xc, yc, w, h = tracks[2], tracks[3], tracks[4], tracks[5]
    on_border = (
        (xc - w / 2 <= eps) | (yc - h / 2 <= eps)
        | (xc + w / 2 >= w_frame - 1 - eps) | (yc + h / 2 >= h_frame - 1 - eps)
    )

    oriented = pd.DataFrame({
        0: tracks[0], 1: tracks[1], 2: tracks[6], 3: tracks[7],
        4: length, 5: width, 6: tracks[10], 7: tracks[11],
        8: headings, 9: is_dashed.astype(bool),
        10: tracks[8], 11: tracks[9], 12: on_border.astype(bool),
    })
    win = getattr(args, "edge_clip_smoothing", None)
    win = 5 if win is None else win  # 0 disables smoothing (reference contract)
    oriented[[10, 11]] = smooth_clip_dims(oriented, win)

    if len(class_names) < oriented[6].max() + 1:
        logger.error(f"At least {int(oriented[6].max()) + 1} class names required.")
        sys.exit(1)
    return oriented, tracks_plotting


def read_transforms(path: Path, logger) -> dict:
    """{frame_id: 3x3 homography}; exits on non-positive determinants."""
    data = np.loadtxt(path, delimiter=detect_delimiter(path))
    if data.ndim == 1:
        data = data[None, :]
    mats = data[:, 1:].reshape(-1, 3, 3)
    if not np.all(np.linalg.det(mats) > 0):
        logger.error(f"Invalid transformations found in '{path}'.")
        sys.exit(1)
    frames = data[:, 0].astype(int)
    if len(frames) and not np.all(np.diff(frames) == 1):
        logger.warning(f"Missing frame ids in '{path}'.")
    return {int(f): m.astype(np.float32) for f, m in zip(frames, mats)}


def read_georeferenced_results(path: Path, video_path: Path, logger):
    """Speed/lane table keyed by Frame_ID (reconstructed from Timestamp order
    when Frame_Number is absent — legacy CSVs)."""
    df = pd.read_csv(path)
    if "Frame_Number" in df.columns:
        df["Frame_ID"] = df["Frame_Number"]
    elif "Timestamp" in df.columns:
        stamps = sorted(df["Timestamp"].unique())
        mapping = {t: i for i, t in enumerate(stamps)}
        df["Frame_ID"] = df["Timestamp"].map(mapping)
    else:
        logger.warning(f"No frame reference in '{path}'; speed/lane display disabled.")
        return None
    cols = ["Frame_ID", "Vehicle_ID", "Vehicle_Speed", "Lane_Number"]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        logger.warning(f"Columns {missing} absent from '{path}'; speed/lane display disabled.")
        return None
    return df[cols]


# ---------------------------------------------------------------------------
# Rendering
# ---------------------------------------------------------------------------

def plot_trajectories_overlay(ref_frame, tracks_plotting, cut_left, cut_right,
                              line_width: int) -> np.ndarray:
    import cv2

    plot = tracks_plotting[tracks_plotting[0] >= cut_left]
    if cut_right is not None:
        plot = plot[plot[0] <= cut_right]
    overlay = ref_frame.copy()
    for _, row in plot.iterrows():
        color = VizColors.bgr(int(row[3]))
        cv2.circle(overlay, (int(row[1]), int(row[2])), 1, color, line_width)
    out = ref_frame.copy()
    cv2.addWeighted(overlay, 0.75, ref_frame, 0.25, 0, out)
    return out


def annotate_frame(frame, frame_num, tracks_frame, track_history, class_names,
                   speed_lane_frame, args, logger, h_inv=None):
    import cv2

    line_width = args.line_width
    annotated = frame.copy()
    if tracks_frame.empty:
        return annotated
    is_oriented = args.viz_mode in (3, 4)

    for _, row in tracks_frame.iterrows():
        track_id = int(row[1])
        c = int(row[6])
        if args.class_filter and c in args.class_filter:
            continue
        color = VizColors.bgr(c)

        speed = lane = None
        if speed_lane_frame is not None and track_id in speed_lane_frame.index:
            vd = speed_lane_frame.loc[track_id]
            if isinstance(vd, pd.DataFrame):
                vd = vd.iloc[0]
            s_val = vd["Vehicle_Speed"]
            if pd.notna(s_val):
                speed = int(s_val * 0.621371) if args.speed_unit == "mi/h" else int(s_val)
                if speed <= args.speed_deadzone:
                    speed = 0
            lane_val = vd["Lane_Number"]
            lane = int(lane_val) if lane_val not in ("", None) and pd.notna(lane_val) else None

        if is_oriented:
            x_draw, y_draw = draw_oriented_box(
                annotated, row[2], row[3], row[4], row[5], row[8],
                h_inv if h_inv is not None else np.eye(3, dtype=np.float32),
                color, line_width, dashed=bool(row[9]),
                clip_w=row[10], clip_h=row[11], on_border=bool(row[12]),
            )
            x1, y1 = x_draw, y_draw
            conf = row[7]
        else:
            xc, yc, w, h = row[2], row[3], row[4], row[5]
            x1, y1 = int(xc - w / 2), int(yc - h / 2)
            x2, y2 = int(xc + w / 2), int(yc + h / 2)
            ncols = tracks_frame.shape[1]
            is_interp = bool(row[ncols - 1]) if ncols in (9, 11) else False
            if is_interp:
                corners = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.int32)
                draw_dashed_poly(annotated, corners, color, line_width)
            else:
                cv2.rectangle(annotated, (x1, y1), (x2, y2), color, line_width, cv2.LINE_AA)
            x_draw, y_draw = xc, yc
            conf = row[7] if ncols >= 8 else None

        if not args.hide_labels:
            parts = [f"id:{track_id}"]
            if args.show_class_names:
                parts.append(str(class_names.get(c, c)))
            if not args.hide_speed and speed is not None:
                parts.append(f"{speed} {args.speed_unit}")
            if args.show_lanes and lane is not None:
                parts.append(f"L{lane}")
            if args.show_conf and conf is not None and conf == conf:
                parts.append(f"{conf:.2f}")
            label = " ".join(parts)
            tf = max(line_width - 1, 1)
            (tw, th), _ = cv2.getTextSize(label, 0, line_width / 3, tf)
            outside = y1 - th >= 3
            y_text = y1 - th - 3 if outside else y1 + th + 3
            cv2.rectangle(annotated, (int(x1), int(y1)), (int(x1 + tw), int(y_text)), color, -1, cv2.LINE_AA)
            cv2.putText(annotated, label, (int(x1), int(y1 - 2 if outside else y1 + th + 2)),
                        0, line_width / 3, TXT_COLOR, tf, cv2.LINE_AA)

        if not args.hide_tracks:
            history = track_history[track_id]
            history.append((float(x_draw), float(y_draw)))
            if len(history) > args.tail_length:
                history.pop(0)
            pts = np.array(history, np.int32)
            for i, pt in enumerate(pts):
                cv2.circle(annotated, tuple(pt), int(1 + 8 * (i + 1) / len(pts)), color, line_width)
    return annotated


# ---------------------------------------------------------------------------
# Main flow
# ---------------------------------------------------------------------------

def run_visualization(args, logger: logging.Logger) -> None:
    import cv2

    config = load_config_all(args, logger, needs_model=False)
    viz_cfg = config["main"]["visualization"]
    out_cfg_raw = config["main"].get("output", {})
    backfill_args_from_config(args, {
        "save": viz_cfg["save"], "show": viz_cfg["show"],
        "viz_mode": viz_cfg["viz_mode"],
        "tail_length": viz_cfg["tail_length"], "line_width": viz_cfg["line_width"],
        "heading_smoothing": viz_cfg["heading_smoothing"],
        "heading_min_speed": viz_cfg["heading_min_speed"],
        "edge_clip_margin": viz_cfg["edge_clip_margin"],
        "edge_clip_smoothing": viz_cfg["edge_clip_smoothing"],
        "plot_trajectories": viz_cfg["plot_trajectories"],
        "plot_delay": viz_cfg["plot_delay"],
        "show_conf": viz_cfg["show_conf"], "show_lanes": viz_cfg["show_lanes"],
        "show_class_names": viz_cfg["show_class_names"],
        "hide_labels": viz_cfg["hide_labels"], "hide_tracks": viz_cfg["hide_tracks"],
        "hide_speed": viz_cfg["hide_speed"], "speed_unit": viz_cfg["speed_unit"],
        "speed_deadzone": viz_cfg["speed_deadzone"],
        "class_filter": viz_cfg["class_filter"],
        "cut_frame_left": config["main"]["processing"]["cut_frame_left"],
        "cut_frame_right": config["main"]["processing"]["cut_frame_right"],
        "output_folder": out_cfg_raw.get("folder", "results"),
    })
    out_cfg = {**out_cfg_raw, "folder": args.output_folder}

    # class names: resolve without a model (CLI/config/int fallback)
    class_names = config["main"].get("class_names") or {}
    if not class_names:
        from geotrax_tpu.utils.config_utils import resolve_class_names

        class_names, _ = resolve_class_names(
            Path("none"), getattr(args, "class_names", None),
            config["main"].get("extraction", {}).get("class_rename"),
            config["ultralytics"].get("classes"), logger,
        )

    from geotrax_tpu.pipeline.visualize import normalize_viz_modes

    modes = normalize_viz_modes(args.viz_mode, logger)
    source = Path(args.source)

    tracks_exists, tracks_path = check_if_results_exist(source, "processed", output_cfg=out_cfg)
    if not tracks_exists:
        logger.critical(f"No tracking results for '{source}'; run 'geotrax extract' first.")
        sys.exit(1)

    geo_exists, geo_path = check_if_results_exist(source, "georeferenced", output_cfg=out_cfg)
    speed_lane = read_georeferenced_results(geo_path, source, logger) if geo_exists else None

    for mode in modes:
        args.viz_mode = mode
        _render_one_mode(source, tracks_path, speed_lane, class_names, args, out_cfg, logger)
    args.viz_mode = modes


def _render_one_mode(source, tracks_path, speed_lane, class_names, args, out_cfg, logger):
    import cv2

    from geotrax_tpu.io.video import VideoReader, probe_video

    tracks, tracks_plotting = read_tracks(tracks_path, class_names, args, logger)

    transforms = {}
    if args.viz_mode in (1, 3, 4):
        t_exists, t_path = check_if_results_exist(source, "video_transformations", output_cfg=out_cfg)
        if not t_exists:
            logger.critical(f"Viz mode {args.viz_mode} needs stabilization transforms; none at '{t_path}'.")
            sys.exit(1)
        transforms = read_transforms(t_path, logger)

    info = probe_video(source)
    suffix, fourcc = determine_suffix_and_fourcc()
    writer = None
    if args.save is not False:
        out_path = build_result_path(source, "visualized", out_cfg, args.viz_mode, suffix)
        get_output_dir(source, out_cfg).mkdir(parents=True, exist_ok=True)
        writer = cv2.VideoWriter(
            str(out_path), cv2.VideoWriter_fourcc(*fourcc), info.fps,
            (info.width, info.height),
        )

    cut_left = int(args.cut_frame_left or 0)
    cut_right = args.cut_frame_right
    tracks_by_frame = dict(tuple(tracks.groupby(0)))
    empty = tracks.iloc[0:0]
    speed_lane_by_frame = None
    if speed_lane is not None:
        speed_lane_by_frame = {
            fid: grp.drop(columns=["Frame_ID"]).astype({"Vehicle_ID": int}).set_index("Vehicle_ID")
            for fid, grp in speed_lane.groupby("Frame_ID")
        }

    track_history: dict = defaultdict(list)
    ref_frame_bgr = None

    reader = VideoReader(source, start=cut_left, stop=cut_right)
    pbar = tqdm(desc=f"Visualizing mode {args.viz_mode}", unit="frame")

    # optional trajectory-overlay intro
    intro_frames = 0
    if args.plot_trajectories and tracks_plotting is not None:
        first = VideoReader(source).read_frame(cut_left)
        overlay = plot_trajectories_overlay(
            np.ascontiguousarray(first[..., ::-1]), tracks_plotting, cut_left, cut_right,
            args.line_width,
        )
        intro_frames = int(args.plot_delay or 30)
        for _ in range(intro_frames):
            if writer is not None:
                writer.write(overlay)

    try:
        for frame_idx, frame_rgb in reader:
            frame = np.ascontiguousarray(frame_rgb[..., ::-1])  # BGR for cv2
            if frame_idx == cut_left:
                ref_frame_bgr = frame.copy()

            h_inv = None
            if args.viz_mode in (1, 4) and frame_idx in transforms:
                h, w = frame.shape[:2]
                frame = cv2.warpPerspective(frame, transforms[frame_idx], (w, h))
            elif args.viz_mode == 2 and ref_frame_bgr is not None:
                frame = ref_frame_bgr.copy()
            elif args.viz_mode == 3:
                m = transforms.get(frame_idx)
                h_inv = (np.linalg.inv(m) if m is not None else np.eye(3)).astype(np.float32)
            if args.viz_mode == 4:
                h_inv = np.eye(3, dtype=np.float32)

            tracks_frame = tracks_by_frame.get(frame_idx, empty)
            sl_frame = speed_lane_by_frame.get(frame_idx) if speed_lane_by_frame else None
            annotated = annotate_frame(
                frame, frame_idx, tracks_frame, track_history, class_names,
                sl_frame, args, logger, h_inv,
            )
            if writer is not None:
                writer.write(annotated)
            if args.show:
                cv2.imshow("geotrax-tpu", annotated)
                if cv2.waitKey(1) == ord("q"):
                    logger.warning("Visualization interrupted by user.")
                    break
            pbar.update(1)
    finally:
        pbar.close()
        if writer is not None:
            writer.release()
            logger.info(f"Annotated video (mode {args.viz_mode}) saved.")
        if args.show:
            cv2.destroyAllWindows()
