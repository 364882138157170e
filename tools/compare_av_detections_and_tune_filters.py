"""Compare pipeline trajectories against RTK probe-vehicle ground truth and
tune the kinematics smoothing filter.

Capability parity with reference tools/compare_av_detections_and_tune_filters.py
(the RTK-GNSS validation harness, SURVEY.md §2.7; reference functions
get_on_board_av_data / compute_errors_per_video / tune_smoothing_parameters).
Two input modes:

DATASET mode (positional arg is a directory):
  <data>/av_trajectories/sec_nsec_lon_lat_*.txt   RTK fixes (sec nsec lon lat)
  <data>/av_trajectories/sec_nsec_horSpd_*.txt    RTK speeds (sec nsec m/s)
  <data>/<results>/<video>.csv                    georeferenced pipeline CSVs
  --probe-map map.yaml                            {video: {id, start, end}}
  The probe map replaces the reference's HARDCODED video->AV-id and
  video->timestamp tables (reference :90-125) with a data-driven file, so
  the harness works on any probe campaign, not only Songdo 2022-10-07.

SIMPLE mode (positional arg is a single pipeline CSV):
  --probe probe.csv with columns frame,x,y[,speed_kmh]; the probe is
  auto-matched to the pipeline vehicle with the lowest mean position error.

Shared analysis (both modes):
- Window refinement: the probe log is clipped to the exact pass through the
  camera's field of view by closest-point matching against the extracted
  trajectory's first/last positions (reference find_start_end_times).
- Positional error: perpendicular distance from each (moving) probe fix to
  the segment through the two nearest extracted points; probe fixes slower
  than --stop-threshold km/h are excluded (reference AV_SPEED_THRESHOLD).
- Speed error: probe speed minus the inverse-distance-weighted
  interpolation of the two nearest extracted speeds.
- Aggregation per video AND per intersection (first letter of the video
  stem), with trajectory length/duration; --save writes the LaTeX rows the
  paper tables use plus PDF plots (trajectories, error histograms, speed /
  acceleration traces, sweep curves).
- --tune sweeps the smoothing parameter (gaussian sigma 1..25 step 0.5,
  savgol window 30..80 step 3 — the reference's documented grids, override
  with --grid), recomputing speeds from raw Local_X/Y at --fps, and reports
  the best setting per intersection under BOTH criteria the reference uses
  (lowest mean |speed error|; lowest speed-error std) plus the plain and
  length-weighted averages across intersections.

Usage:
  python tools/compare_av_detections_and_tune_filters.py data/ \
      --probe-map probes.yaml --tune --filter gaussian --save
  python tools/compare_av_detections_and_tune_filters.py run_geo.csv \
      --probe probe.csv --tune
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.pipeline._georeference_impl import (  # noqa: E402
    apply_filter,
    compute_speed,
)

DEFAULT_FPS = 30000 / 1001
STOP_THRESHOLD_KMH = 1.0  # probe fixes slower than this are stationary noise


# ---------------------------------------------------------------------------
# Probe (RTK) ingestion
# ---------------------------------------------------------------------------

def load_rtk_logs(folder: Path, local_crs: str) -> pd.DataFrame:
    """Stanford-format RTK logs -> DataFrame[Timestamp, Local_X, Local_Y,
    speed_kmh]. Files: sec_nsec_lon_lat_*.txt + sec_nsec_horSpd_*.txt
    (reference get_on_board_av_data)."""
    from geotrax_tpu.ops.tmerc import geo2local

    pos_files = sorted(folder.glob("sec_nsec_lon_lat_*.txt"))
    spd_files = sorted(folder.glob("sec_nsec_horSpd_*.txt"))
    if not pos_files:
        raise SystemExit(f"no sec_nsec_lon_lat_*.txt under {folder}")
    pos = np.vstack([np.loadtxt(p, ndmin=2) for p in pos_files])
    t = pos[:, 0] + pos[:, 1] * 1e-9
    x, y = geo2local(pos[:, 3], pos[:, 2], target_crs=local_crs, xp=np)
    df = pd.DataFrame({
        "Timestamp": pd.to_datetime(t, unit="s"),
        "Local_X": np.asarray(x), "Local_Y": np.asarray(y),
    })
    if spd_files:
        spd = np.vstack([np.loadtxt(p, ndmin=2) for p in spd_files])
        ts = spd[:, 0] + spd[:, 1] * 1e-9
        # align speeds to position timestamps (nearest fix)
        idx = np.searchsorted(ts, t).clip(0, len(ts) - 1)
        prev = (idx - 1).clip(0)
        use_prev = np.abs(ts[prev] - t) < np.abs(ts[idx] - t)
        df["speed_kmh"] = spd[np.where(use_prev, prev, idx), 2] * 3.6
    return df


def load_probe_map(path: Path) -> dict:
    """{video: {id: int, start: iso-ts, end: iso-ts}} from YAML or JSON."""
    import json

    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


# ---------------------------------------------------------------------------
# Error model (reference compute_errors_per_video)
# ---------------------------------------------------------------------------

def _two_nearest(dist: np.ndarray) -> tuple[int, int]:
    i1 = int(np.argmin(dist))
    if i1 == 0:
        return i1, 1
    if i1 == len(dist) - 1:
        return i1, len(dist) - 2
    return i1, i1 - 1 if dist[i1 - 1] < dist[i1 + 1] else i1 + 1


def trajectory_errors(probe: pd.DataFrame, ext: pd.DataFrame,
                      stop_threshold: float) -> tuple[np.ndarray, np.ndarray]:
    """Per-probe-fix (positional_error_m, speed_error_kmh); NaN where the
    probe is stationary. Positional error is point-to-segment distance
    through the two nearest extracted points; speed error interpolates the
    two nearest extracted speeds by inverse distance."""
    ex = ext["Local_X"].to_numpy()
    ey = ext["Local_Y"].to_numpy()
    es = ext["Vehicle_Speed"].to_numpy() if "Vehicle_Speed" in ext else np.full(len(ext), np.nan)
    pos_err = np.full(len(probe), np.nan)
    spd_err = np.full(len(probe), np.nan)
    has_speed = "speed_kmh" in probe.columns
    for k, (px, py) in enumerate(zip(probe["Local_X"].to_numpy(),
                                     probe["Local_Y"].to_numpy())):
        if has_speed and probe["speed_kmh"].iloc[k] < stop_threshold:
            continue
        d = np.hypot(ex - px, ey - py)
        i1, i2 = _two_nearest(d)
        seg = np.array([ex[i2] - ex[i1], ey[i2] - ey[i1]])
        seg_len = np.linalg.norm(seg)
        if seg_len < 1e-9:
            pos_err[k] = d[i1]
        else:
            pos_err[k] = abs(np.cross(seg, [ex[i1] - px, ey[i1] - py])) / seg_len
        if has_speed:
            s1, s2 = es[i1], es[i2]
            if np.isnan(s1) and np.isnan(s2):
                continue
            if np.isnan(s1):
                interp = s2
            elif np.isnan(s2):
                interp = s1
            else:
                w1 = d[i2] / max(d[i1] + d[i2], 1e-9)
                interp = w1 * s1 + (1 - w1) * s2
            spd_err[k] = probe["speed_kmh"].iloc[k] - interp
    return pos_err, spd_err


def refine_window(probe: pd.DataFrame, ext: pd.DataFrame) -> pd.DataFrame:
    """Clip the probe log to the extracted trajectory's pass: the fixes
    geometrically closest to the first/last extracted positions bound the
    window (reference find_start_end_times)."""
    if len(ext) == 0 or len(probe) == 0:
        return probe

    def closest_ts(x, y):
        d = np.hypot(probe["Local_X"].to_numpy() - x, probe["Local_Y"].to_numpy() - y)
        return probe["Timestamp"].iloc[int(np.argmin(d))]

    t0 = closest_ts(ext["Local_X"].iloc[0], ext["Local_Y"].iloc[0])
    t1 = closest_ts(ext["Local_X"].iloc[-1], ext["Local_Y"].iloc[-1])
    if t1 < t0:
        t0, t1 = t1, t0
    return probe[(probe["Timestamp"] >= t0) & (probe["Timestamp"] <= t1)]


def path_length(df: pd.DataFrame) -> float:
    dx = np.diff(df["Local_X"].to_numpy())
    dy = np.diff(df["Local_Y"].to_numpy())
    return float(np.hypot(dx, dy).sum())


# ---------------------------------------------------------------------------
# Kinematics recomputation (for the sweep + the kinematics plots)
# ---------------------------------------------------------------------------

def smoothed_speed(ext: pd.DataFrame, param: float, filter_type: str,
                   fps: float) -> np.ndarray:
    """Speed [km/h] from raw Local_X/Y with one smoothing setting (kernel =
    gaussian sigma or savgol window, matching cfg georef.filtering)."""
    raw = compute_speed(ext["Local_X"].to_numpy(), ext["Local_Y"].to_numpy(), fps)
    if filter_type == "gaussian":
        # fractional sigmas: apply_filter quantizes, smooth directly (the
        # first-party kernel matches scipy's reflect/truncate=3.0 semantics)
        from geotrax_tpu.ops.filters import gaussian_filter1d_np

        smooth = gaussian_filter1d_np(raw, param)
    else:
        smooth = apply_filter(raw, max(int(round(param)), 1), filter_type)
    return np.insert(smooth * 3.6, 0, np.nan)


def compute_kinematics(ext: pd.DataFrame, param: float, filter_type: str,
                       fps: float) -> pd.DataFrame:
    """Recompute Vehicle_Speed [km/h] AND Vehicle_Acceleration [m/s^2] from
    raw Local_X/Y under one smoothing setting, plus an Elapsed_Time column
    (reference compute_kinematics: speed from position deltas, acceleration
    as the centered gradient of the smoothed speed)."""
    out = ext.copy()
    spd_kmh = smoothed_speed(ext, param, filter_type, fps)
    out["Vehicle_Speed"] = spd_kmh
    spd_mps = np.asarray(spd_kmh, float) / 3.6
    acc = np.full(len(out), np.nan)
    if len(out) > 2:
        acc[1:] = np.gradient(spd_mps[1:], 1.0 / fps)
    out["Vehicle_Acceleration"] = acc
    out["Elapsed_Time"] = elapsed_seconds(out, fps)
    return out


def elapsed_seconds(df: pd.DataFrame, fps: float) -> np.ndarray:
    """Seconds since the first row: from Timestamp when present (probe logs,
    timestamped CSVs), else Frame_Number / fps."""
    if "Timestamp" in df.columns and df["Timestamp"].notna().all():
        ts = pd.to_datetime(df["Timestamp"])
        return (ts - ts.iloc[0]).dt.total_seconds().to_numpy()
    if "Frame_Number" in df.columns:
        f = df["Frame_Number"].to_numpy(float)
        return (f - f[0]) / fps
    return np.arange(len(df), dtype=float) / fps


def probe_acceleration(probe: pd.DataFrame) -> np.ndarray:
    """Probe acceleration [m/s^2] as the time-gradient of the RTK speed
    (the RTK logs carry horizontal speed only)."""
    if "speed_kmh" not in probe.columns or len(probe) < 3:
        return np.full(len(probe), np.nan)
    t = pd.to_datetime(probe["Timestamp"])
    secs = (t - t.iloc[0]).dt.total_seconds().to_numpy()
    if np.any(np.diff(secs) <= 0):
        return np.full(len(probe), np.nan)
    return np.gradient(probe["speed_kmh"].to_numpy(float) / 3.6, secs)


def default_grid(filter_type: str) -> np.ndarray:
    if filter_type == "gaussian":
        return np.linspace(1, 25, 49)  # step 0.5 (reference :337)
    return np.arange(30, 81, 3, dtype=float)  # savgol window (reference :339)


# ---------------------------------------------------------------------------
# Aggregation + reporting
# ---------------------------------------------------------------------------

def summarize(pairs: dict[str, tuple[pd.DataFrame, pd.DataFrame]],
              stop_threshold: float):
    """Per-video and per-intersection stats from {video: (probe_f, ext)}.
    Returns (video_stats, intersection_stats, intersection_meta)."""
    vstats, ierr, imeta = {}, {}, {}
    for video, (probe_f, ext) in sorted(pairs.items()):
        pos, spd = trajectory_errors(probe_f, ext, stop_threshold)
        dur = (probe_f["Timestamp"].iloc[-1] - probe_f["Timestamp"].iloc[0]).total_seconds() \
            if len(probe_f) > 1 else 0.0
        length = path_length(probe_f)
        vstats[video] = {
            "pos_mean": np.nanmean(pos), "pos_std": np.nanstd(pos),
            "spd_mean": np.nanmean(np.abs(spd)), "spd_std": np.nanstd(np.abs(spd)),
            "length": length, "duration": dur,
        }
        inter = video[0]
        ierr.setdefault(inter, ([], []))
        ierr[inter][0].append(pos)
        ierr[inter][1].append(spd)
        meta = imeta.setdefault(inter, {"length": 0.0, "duration": 0.0})
        meta["length"] += length
        meta["duration"] += dur
    istats = {}
    for inter, (pos_list, spd_list) in ierr.items():
        pos = np.concatenate(pos_list)
        spd = np.abs(np.concatenate(spd_list))
        istats[inter] = {
            "pos_mean": np.nanmean(pos), "pos_std": np.nanstd(pos),
            "spd_mean": np.nanmean(spd), "spd_std": np.nanstd(spd),
        }
    return vstats, istats, imeta


def print_stats(vstats: dict, istats: dict, imeta: dict) -> None:
    for video, s in sorted(vstats.items()):
        print(f"Video {video:<8}: position {s['pos_mean']:.3f} +/- {s['pos_std']:.3f} m, "
              f"speed {s['spd_mean']:.3f} +/- {s['spd_std']:.3f} km/h, "
              f"length {s['length']:.1f} m, duration {s['duration']:.1f} s")
    for inter, s in sorted(istats.items()):
        m = imeta[inter]
        print(f"Intersection {inter}: position {s['pos_mean']:.3f} +/- {s['pos_std']:.3f} m, "
              f"speed {s['spd_mean']:.3f} +/- {s['spd_std']:.3f} km/h, "
              f"length {m['length']:.1f} m, duration {m['duration']:.1f} s")


def save_latex(vstats: dict, istats: dict, imeta: dict, out_dir: Path) -> None:
    """The per-video / per-intersection LaTeX table rows of the paper."""
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "AV_errors_per_video.tex", "w") as f:
        for video, s in sorted(vstats.items()):
            f.write(f"    {video} & ${s['pos_mean']:.3f} \\pm {s['pos_std']:.3f}$ & "
                    f"${s['spd_mean']:.3f} \\pm {s['spd_std']:.3f}$ & "
                    f"{s['length']:.2f} & {s['duration']:.2f}\\\\\n")
    with open(out_dir / "AV_errors_per_intersection.tex", "w") as f:
        for inter, s in sorted(istats.items()):
            m = imeta[inter]
            f.write(f"    {inter} & ${s['pos_mean']:.3f} \\pm {s['pos_std']:.3f}$ & "
                    f"${s['spd_mean']:.3f} \\pm {s['spd_std']:.3f}$ & "
                    f"{m['length']:.2f} & {m['duration']:.2f}\\\\\n")
    print(f"LaTeX tables -> {out_dir}")


def _video_grid(n: int, cols: int = 4):
    import matplotlib.pyplot as plt

    cols = min(max(n, 1), cols)
    rows = (n + cols - 1) // cols
    fig, axs = plt.subplots(rows, cols, figsize=(4 * cols, 3.2 * rows),
                            squeeze=False)
    for ax in axs.flat[n:]:
        ax.axis("off")
    return fig, axs


def _finish(fig, name: str, args, out_dir: Path) -> None:
    fig.tight_layout()
    if args.save:
        out_dir.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_dir / f"AV_{name}.pdf", bbox_inches="tight")
    if args.show:
        import matplotlib.pyplot as plt

        plt.show()
    import matplotlib.pyplot as plt

    plt.close(fig)


_COORD_COLS = {
    # probe columns, extracted columns, equal-aspect
    "local": (("Local_X", "Local_Y"), ("Local_X", "Local_Y"), True),
    "global": (("Longitude", "Latitude"), ("Longitude", "Latitude"), False),
    "ortho": ((None, None), ("Ortho_X", "Ortho_Y"), True),
}


def plot_trajectories(pairs: dict, args, out_dir: Path) -> None:
    """Probe-vs-extracted trajectories per video in the selected coordinate
    frame: 'local' metres (reference plot_geo_trajectories_video), 'global'
    lon/lat (reference --coords global), or 'ortho' pixels with an optional
    orthophoto background via --ortho-image (the reference's
    plot_img_trajectories_video analog — ours anchors to the orthophoto
    rather than the first video frame, which the georeferenced CSVs don't
    reference anymore)."""
    (pcx, pcy), (ecx, ecy), equal = _COORD_COLS[args.coords]
    bg = None
    if args.coords == "ortho" and args.ortho_image is not None:
        from PIL import Image

        bg = np.asarray(Image.open(args.ortho_image).convert("RGB"))
    fig, axs = _video_grid(len(pairs))
    for ax, (video, (probe_f, ext)) in zip(axs.flat, sorted(pairs.items())):
        if bg is not None:
            ax.imshow(bg)
        if pcx is not None and pcx in probe_f.columns:
            ax.plot(probe_f[pcx], probe_f[pcy], "k-", lw=1.2, label="RTK probe")
        if ecx in ext.columns:
            ax.plot(ext[ecx], ext[ecy], "--", lw=1.2, label="extracted")
        ax.set_title(video, fontsize=9)
        if equal and bg is None:
            ax.set_aspect("equal", adjustable="datalim")
        if args.coords == "ortho" and bg is None:
            ax.invert_yaxis()  # pixel frame: y grows downward
        ax.tick_params(labelsize=7)
    axs.flat[0].legend(fontsize=7)
    _finish(fig, f"trajectories_{args.coords}", args, out_dir)


def plot_trajectories_all(pairs: dict, args, out_dir: Path) -> None:
    """All extracted passes on ONE axes, speed-colored, probe in black —
    the reference's plot_geo_trajectories_all(speed_on=True) overview."""
    import matplotlib.pyplot as plt

    (pcx, pcy), (ecx, ecy), equal = _COORD_COLS[
        args.coords if args.coords != "ortho" else "local"]
    fig, ax = plt.subplots(figsize=(8, 7))
    last = None
    for video, (probe_f, ext) in sorted(pairs.items()):
        if pcx in probe_f.columns:
            ax.plot(probe_f[pcx], probe_f[pcy], "k-", lw=0.8, alpha=0.7)
        if "Vehicle_Speed" in ext.columns:
            last = ax.scatter(ext[ecx], ext[ecy], c=ext["Vehicle_Speed"],
                              s=3, cmap="viridis")
        else:
            ax.plot(ext[ecx], ext[ecy], lw=1.0)
    if last is not None:
        fig.colorbar(last, ax=ax, label="speed (km/h)")
    if equal:
        ax.set_aspect("equal", adjustable="datalim")
    ax.set_title("all passes (probe black, extracted speed-colored)", fontsize=10)
    _finish(fig, "trajectories_all", args, out_dir)


def plot_kinematics(pairs: dict, args, out_dir: Path, variable: str) -> None:
    """Per-video speed or acceleration traces vs elapsed time, probe in
    black, extracted colored, SHARED y-limits across panels (reference
    plot_kinematics: the shared axis is what makes cross-video filter
    artifacts visible)."""
    probe_col = "speed_kmh" if variable == "speed" else "_acc"
    ext_col = "Vehicle_Speed" if variable == "speed" else "Vehicle_Acceleration"
    unit = "km/h" if variable == "speed" else "m/s$^2$"
    fig, axs = _video_grid(len(pairs))
    lo, hi = np.inf, -np.inf
    drawn = []
    for ax, (video, (probe_f, ext)) in zip(axs.flat, sorted(pairs.items())):
        pt = elapsed_seconds(probe_f, args.fps)
        et = ext["Elapsed_Time"].to_numpy() if "Elapsed_Time" in ext.columns \
            else elapsed_seconds(ext, args.fps)
        pv = (probe_f["speed_kmh"].to_numpy(float)
              if variable == "speed" and "speed_kmh" in probe_f.columns
              else probe_acceleration(probe_f) if variable == "acceleration"
              else np.full(len(probe_f), np.nan))
        ev = ext[ext_col].to_numpy(float) if ext_col in ext.columns \
            else np.full(len(ext), np.nan)
        # clip the extracted trace to the probe window (reference clips at
        # stanford_time_stop so the panels compare the same pass)
        if len(pt):
            keep = et <= pt[-1] + 1.0
            et, ev = et[keep], ev[keep]
        ax.plot(pt, pv, "k-", lw=1.0, label="RTK probe")
        ax.scatter(pt, pv, color="k", s=2)
        ax.plot(et, ev, lw=1.0, alpha=0.85, label="extracted")
        ax.scatter(et, ev, s=2, alpha=0.85)
        ax.set_title(video, fontsize=9)
        ax.set_xlabel("elapsed time (s)", fontsize=8)
        ax.set_ylabel(f"{variable} ({unit})", fontsize=8)
        ax.tick_params(labelsize=7)
        for v in (pv, ev):
            v = v[np.isfinite(v)]
            if v.size:
                lo, hi = min(lo, v.min()), max(hi, v.max())
        drawn.append(ax)
    if np.isfinite(lo) and np.isfinite(hi):
        step = 5.0 if variable == "speed" else 1.0
        lo = step * np.floor(lo / step)
        hi = step * np.ceil(hi / step)
        for ax in drawn:
            ax.set_ylim(lo, hi)
    if drawn:
        drawn[0].legend(fontsize=7)
    _finish(fig, f"{variable}_comparison", args, out_dir)


def plot_error_summary(vstats: dict, args, out_dir: Path) -> None:
    """Per-video mean +/- std positional and speed errors as errorbar panels
    (reference plot_positional_and_speed_errors)."""
    import matplotlib.pyplot as plt

    videos = sorted(vstats)
    xs = np.arange(len(videos))
    fig, (a0, a1) = plt.subplots(1, 2, figsize=(max(8, 1.2 * len(videos)), 4))
    a0.errorbar(xs, [vstats[v]["pos_mean"] for v in videos],
                yerr=[vstats[v]["pos_std"] for v in videos], fmt="o", capsize=3)
    a0.set_ylabel("positional error (m)")
    a1.errorbar(xs, [vstats[v]["spd_mean"] for v in videos],
                yerr=[vstats[v]["spd_std"] for v in videos], fmt="o", capsize=3)
    a1.set_ylabel("|speed error| (km/h)")
    for ax in (a0, a1):
        ax.set_xticks(xs)
        ax.set_xticklabels(videos, rotation=45, ha="right", fontsize=7)
        ax.grid(alpha=0.3)
    _finish(fig, "positional_and_speed_errors", args, out_dir)


def plot_sweep(sweep: dict, args, out_dir: Path) -> None:
    """Per-intersection sweep panels with both best-parameter markers
    (reference plot_tuned_speed_errors: one panel per intersection, the
    argmin-mean and argmin-std settings marked)."""
    fig, axs = _video_grid(len(sweep), cols=3)
    for ax, (inter, (grid, means, stds)) in zip(axs.flat, sorted(sweep.items())):
        ax.plot(grid, means, label="mean |err|")
        ax.plot(grid, stds, "--", alpha=0.7, label="std")
        i_m = int(np.nanargmin(means))
        i_s = int(np.nanargmin(stds))
        ax.axvline(grid[i_m], color="C0", ls=":", alpha=0.8)
        ax.axvline(grid[i_s], color="C1", ls=":", alpha=0.8)
        ax.set_title(f"intersection {inter} "
                     f"(best mean {grid[i_m]:g}, best std {grid[i_s]:g})",
                     fontsize=8)
        ax.set_xlabel("smoothing parameter", fontsize=8)
        ax.set_ylabel("speed error (km/h)", fontsize=8)
        ax.tick_params(labelsize=7)
    axs.flat[0].legend(fontsize=7)
    _finish(fig, "speed_error_sweep", args, out_dir)


def plot_sampling_diff(pairs: dict, args, out_dir: Path) -> None:
    """Debug view: successive-timestamp deltas for the probe logs and the
    extracted CSVs, with mean/std guides (reference plot_sampling_diff,
    gated on --debug like the reference)."""
    import matplotlib.pyplot as plt

    fig, (a0, a1) = plt.subplots(1, 2, figsize=(13, 5))
    probe_d = [pd.to_datetime(p["Timestamp"]).diff().dt.total_seconds().dropna()
               for p, _ in pairs.values() if "Timestamp" in p.columns]
    ext_d = []
    for _, e in pairs.values():
        if "Timestamp" in e.columns and e["Timestamp"].notna().all():
            ext_d.append(pd.to_datetime(e["Timestamp"]).diff()
                         .dt.total_seconds().dropna())
    for ax, series, title in ((a0, probe_d, "probe"), (a1, ext_d, "extracted")):
        if not series:
            ax.set_title(f"{title}: no timestamps")
            continue
        cat = pd.concat(series).reset_index(drop=True)
        ax.plot(cat, color="black", lw=0.7)
        m, s = cat.mean(), cat.std()
        ax.axhline(m, color="r", ls="--", label=f"mean {m:.3f}")
        ax.axhline(m + s, color="g", ls="--", label=f"+/- std {s:.3f}")
        ax.axhline(m - s, color="g", ls="--")
        ax.set_xlabel("sample")
        ax.set_ylabel("time difference (s)")
        ax.set_title(f"sampling differences: {title}")
        ax.legend(fontsize=7)
    _finish(fig, "sampling_diff", args, out_dir)


def save_plots(pairs: dict, vstats: dict, sweep: dict | None, args,
               out_dir: Path) -> None:
    """The reference's full plot surface: per-video trajectories (selected
    coordinate frame), all-passes speed-colored overview, per-video speed and
    acceleration traces, per-video error summary, per-intersection sweep
    panels, and (--debug) sampling diagnostics."""
    import matplotlib

    if not args.show:
        matplotlib.use("Agg")

    plot_trajectories(pairs, args, out_dir)
    plot_trajectories_all(pairs, args, out_dir)
    plot_kinematics(pairs, args, out_dir, "speed")
    plot_kinematics(pairs, args, out_dir, "acceleration")
    plot_error_summary(vstats, args, out_dir)
    if sweep:
        plot_sweep(sweep, args, out_dir)
    if args.debug:
        plot_sampling_diff(pairs, args, out_dir)
    if args.save:
        print(f"Plots -> {out_dir}")


# ---------------------------------------------------------------------------
# Sweep (reference tune_smoothing_parameters)
# ---------------------------------------------------------------------------

def tune(pairs: dict, filter_type: str, grid: np.ndarray, fps: float,
         stop_threshold: float):
    """For every smoothing setting: recompute extracted speeds from raw
    positions, re-evaluate speed errors, aggregate per intersection. Report
    the best setting under both reference criteria."""
    sweep = {}  # inter -> (grid, mean_abs, std)
    imeta = {}
    by_inter: dict[str, list[str]] = {}
    for video in pairs:
        by_inter.setdefault(video[0], []).append(video)
    for inter, videos in sorted(by_inter.items()):
        means, stds = [], []
        for param in grid:
            errs = []
            for video in videos:
                probe_f, ext = pairs[video]
                ext2 = ext.copy()
                ext2["Vehicle_Speed"] = smoothed_speed(ext, param, filter_type, fps)
                _, spd = trajectory_errors(probe_f, ext2, stop_threshold)
                errs.append(spd)
            err = np.abs(np.concatenate(errs))
            means.append(np.nanmean(err))
            stds.append(np.nanstd(err))
        sweep[inter] = (grid, np.asarray(means), np.asarray(stds))
        imeta[inter] = sum(path_length(pairs[v][0]) for v in videos)

    for crit, idx_fn in (("mean |speed error|", lambda m, s: int(np.nanargmin(m))),
                         ("speed error std", lambda m, s: int(np.nanargmin(s)))):
        print(f"\nBest smoothing ({filter_type}) by lowest {crit}:")
        best_sum = best_weighted = weight_sum = 0.0
        for inter, (g, means, stds) in sorted(sweep.items()):
            i = idx_fn(means, stds)
            print(f"  intersection {inter}: param {g[i]:g} "
                  f"-> {means[i]:.3f} +/- {stds[i]:.3f} km/h")
            best_sum += g[i]
            best_weighted += g[i] * imeta[inter]
            weight_sum += imeta[inter]
        print(f"  average best param: {best_sum / len(sweep):.2f}; "
              f"length-weighted: {best_weighted / max(weight_sum, 1e-9):.2f}")
    return sweep


# ---------------------------------------------------------------------------
# Input assembly
# ---------------------------------------------------------------------------

def pairs_from_dataset(args) -> dict[str, tuple[pd.DataFrame, pd.DataFrame]]:
    """{video: (refined probe window, extracted AV trajectory)} from a data
    tree + probe map."""
    if args.probe_map is None:
        raise SystemExit("dataset mode needs --probe-map (video -> {id,start,end})")
    probe_map = load_probe_map(args.probe_map)
    probe = load_rtk_logs(args.data / "av_trajectories", args.local_crs)
    results = args.data / args.results_folder
    pairs = {}
    for video, spec in probe_map.items():
        csv = next(iter(sorted(results.glob(f"{video}*.csv"))), None)
        if csv is None:
            print(f"warning: no pipeline CSV for '{video}' under {results}")
            continue
        df = pd.read_csv(csv)
        ext = df[df["Vehicle_ID"] == int(spec["id"])]
        if "Visibility" in ext.columns:
            ext = ext[ext["Visibility"] == 1]
        if len(ext) < 2:
            print(f"warning: vehicle {spec['id']} absent/short in {csv.name}")
            continue
        window = probe[(probe["Timestamp"] >= pd.to_datetime(spec["start"]))
                       & (probe["Timestamp"] <= pd.to_datetime(spec["end"]))]
        pairs[video] = (refine_window(window, ext), ext.reset_index(drop=True))
    if not pairs:
        raise SystemExit("no usable (probe, extraction) pairs")
    return pairs


def pairs_from_single_csv(args) -> dict[str, tuple[pd.DataFrame, pd.DataFrame]]:
    """Simple mode: auto-match the probe to the pipeline vehicle with the
    lowest mean frame-aligned position error."""
    if args.probe is None:
        raise SystemExit("single-CSV mode needs --probe probe.csv (frame,x,y[,speed_kmh])")
    pipeline = pd.read_csv(args.data)
    probe = pd.read_csv(args.probe).rename(columns={"x": "Local_X", "y": "Local_Y"})
    if "Timestamp" not in probe.columns:
        probe["Timestamp"] = pd.to_datetime(probe["frame"] / args.fps, unit="s")
    best_id, best_err, best_n = None, np.inf, 0
    for vid, grp in pipeline.groupby("Vehicle_ID"):
        joined = grp.merge(probe, left_on="Frame_Number", right_on="frame",
                           suffixes=("", "_gt"))
        if len(joined) < 10:
            continue
        err = np.hypot(joined.Local_X - joined.Local_X_gt,
                       joined.Local_Y - joined.Local_Y_gt).mean()
        if err < best_err:
            best_id, best_err, best_n = vid, err, len(joined)
    if best_id is None:
        raise SystemExit("no pipeline vehicle overlaps the probe log")
    print(f"Probe matched to Vehicle_ID {best_id}: mean aligned position error "
          f"{best_err:.3f} m over {best_n} frames")
    ext = pipeline[pipeline["Vehicle_ID"] == best_id].reset_index(drop=True)
    video = args.data.stem.split(".")[0] or "V"
    return {video: (refine_window(probe, ext), ext)}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("data", type=Path,
                        help="Dataset directory (with av_trajectories/ + results) "
                             "or a single georeferenced pipeline CSV")
    parser.add_argument("--probe", type=Path, default=None,
                        help="[single-CSV mode] probe CSV: frame,x,y[,speed_kmh]")
    parser.add_argument("--probe-map", type=Path, default=None,
                        help="[dataset mode] YAML/JSON {video: {id,start,end}}")
    parser.add_argument("--results-folder", default="results",
                        help="Subfolder with the pipeline CSVs (default: results)")
    parser.add_argument("--local-crs", default="epsg:5186",
                        help="Projected CRS for RTK lon/lat -> local metres")
    parser.add_argument("--fps", type=float, default=DEFAULT_FPS)
    parser.add_argument("--tune", "-t", action="store_true",
                        help="Sweep the smoothing grid instead of the default "
                             "setting only")
    parser.add_argument("--filter", "-f", choices=("gaussian", "savgol"),
                        default="gaussian")
    parser.add_argument("--grid", type=float, nargs="+", default=None,
                        help="Override the sweep grid (default: the reference's "
                             "1..25/0.5 gaussian or 30..80/3 savgol)")
    parser.add_argument("--stop-threshold", type=float, default=STOP_THRESHOLD_KMH,
                        help="Probe fixes below this speed [km/h] are excluded")
    parser.add_argument("--save", action="store_true",
                        help="Write LaTeX tables + PDF plots next to the results")
    parser.add_argument("--show", action="store_true",
                        help="Display plots interactively (reference --show)")
    parser.add_argument("--coords", choices=("local", "global", "ortho"),
                        default="local",
                        help="Trajectory plot frame: local metres, global "
                             "lon/lat, or orthophoto pixels (reference --coords)")
    parser.add_argument("--ortho-image", type=Path, default=None,
                        help="[--coords ortho] orthophoto raster drawn under "
                             "the pixel trajectories")
    parser.add_argument("--smooth", type=float, default=None,
                        help="Recompute extracted speed+acceleration from raw "
                             "positions with this smoothing parameter before "
                             "the analysis (e.g. the tuned sigma)")
    parser.add_argument("--debug", "-d", action="store_true",
                        help="Extra diagnostics: sampling-difference plots "
                             "(reference --debug)")
    parser.add_argument("--out", type=Path, default=None,
                        help="Output folder for --save (default: <data>/plots)")
    parser.add_argument("--cfg", "-c", type=Path, default=None,
                        help="Pipeline config: resolves the results subfolder "
                             "name from output.folder (reference --cfg); "
                             "--results-folder overrides")
    parser.add_argument("--log-path", "-lp", type=Path, default=None,
                        help="Log file or directory (default: platform log dir)")
    parser.add_argument("--quiet", "-q", action="store_true",
                        help="Console shows NOTICE-and-up only")
    args = parser.parse_args()

    from geotrax_tpu.utils.logging_utils import NOTICE_LEVEL, setup_logger

    logger = setup_logger(Path(__file__).stem, verbose=False,
                          log_path=args.log_path)
    if args.quiet:
        import logging

        for h in logger.handlers:
            if isinstance(h, logging.StreamHandler) and not isinstance(
                    h, logging.FileHandler):
                h.setLevel(NOTICE_LEVEL)

    if args.cfg is not None and args.results_folder == "results":
        # reference --cfg semantics: the pipeline config's output.folder names
        # the per-video results subfolder the stages wrote to
        import yaml

        from geotrax_tpu.utils.config_utils import resolve_config_path

        cfg = yaml.safe_load(Path(resolve_config_path(args.cfg)).read_text())
        args.results_folder = (cfg.get("output", {}) or {}).get("folder", "results")

    pairs = (pairs_from_dataset(args) if args.data.is_dir()
             else pairs_from_single_csv(args))

    if args.smooth is not None:
        pairs = {v: (p, compute_kinematics(e, args.smooth, args.filter, args.fps))
                 for v, (p, e) in pairs.items()}

    vstats, istats, imeta = summarize(pairs, args.stop_threshold)
    print_stats(vstats, istats, imeta)

    sweep = None
    if args.tune:
        grid = np.asarray(args.grid, float) if args.grid else default_grid(args.filter)
        sweep = tune(pairs, args.filter, grid, args.fps, args.stop_threshold)

    out = args.out or ((args.data if args.data.is_dir() else args.data.parent) / "plots")
    if args.save:
        save_latex(vstats, istats, imeta, out)
    if args.save or args.show:
        save_plots(pairs, vstats, sweep, args, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
