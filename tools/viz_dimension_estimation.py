"""Step-by-step visualization of the azimuth dimension estimator.

Capability parity with reference tools/viz_dimension_estimation.py: for one
track in a results .txt, plot each stage of the 5-step estimator
(geotrax_tpu/pipeline/postprocess.py) — the raw per-frame length/width
samples, the visibility filter, the azimuth walk with accepted/rejected
segments, and the final Q25 estimate — into a single PDF.

Usage:
  python tools/viz_dimension_estimation.py TRACKS.txt --id 3 [-c default] [-o out.pdf]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403

from geotrax_tpu.pipeline.postprocess import CARDINALS, _azimuth_mask  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("tracks", type=Path, help="Results .txt (14/15 columns)")
    parser.add_argument("--id", type=int, required=True, help="Track id to visualize")
    parser.add_argument("--cfg", "-c", default="default")
    parser.add_argument("--frame-size", type=int, nargs=2, default=[3840, 2160],
                        metavar=("W", "H"))
    parser.add_argument("--out", "-o", type=Path, default=None)
    args = parser.parse_args()

    import logging

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from geotrax_tpu.utils.config_utils import load_config

    cfg = load_config(args.cfg, logging.getLogger("viz_dim"))
    dim = cfg["extraction"]["dimension_estimation"]

    data = np.loadtxt(args.tracks, delimiter=",")
    rows = data[data[:, 1] == args.id]
    if not len(rows):
        print(f"Track {args.id} not found.")
        return 1
    rows = rows[np.argsort(rows[:, 0])]
    w_frame, h_frame = args.frame_size
    eps = float(dim["eps"])

    vis = (
        (rows[:, 2] - rows[:, 4] / 2 > eps) & (rows[:, 3] - rows[:, 5] / 2 > eps)
        & (rows[:, 2] + rows[:, 4] / 2 < w_frame - 1 - eps)
        & (rows[:, 3] + rows[:, 5] / 2 < h_frame - 1 - eps)
    )
    valid = rows[vis]
    lengths = np.maximum(valid[:, 4], valid[:, 5])
    widths = np.minimum(valid[:, 4], valid[:, 5])
    radius = float(dim["r0"]) / float(dim["gsd"])
    mask, saw = _azimuth_mask(valid[:, 6], valid[:, 7], radius,
                              np.deg2rad(float(dim["theta_bar"])))

    fig, axes = plt.subplots(2, 2, figsize=(13, 9))
    ax = axes[0, 0]
    ax.plot(rows[:, 6], rows[:, 7], "-", color="#999", lw=0.8, label="trajectory")
    ax.scatter(valid[mask, 6], valid[mask, 7], s=10, color="#2ca02c", label="accepted")
    ax.scatter(valid[~mask, 6], valid[~mask, 7], s=10, color="#e84343", label="rejected")
    ax.invert_yaxis()
    ax.set_title(f"Track {args.id}: azimuth walk (r0/gsd = {radius:.0f} px)")
    ax.legend()

    ax = axes[0, 1]
    frames = valid[:, 0]
    ax.plot(frames, lengths, label="max(w,h)", color="#3274d9")
    ax.plot(frames, widths, label="min(w,h)", color="#ff9d00")
    ax.scatter(frames[~mask], lengths[~mask], s=14, color="#e84343", zorder=3)
    if mask.any():
        l_est = np.percentile(lengths[mask], 25)
        w_est = np.percentile(widths[mask], 25)
        ax.axhline(l_est, ls="--", color="#3274d9")
        ax.axhline(w_est, ls="--", color="#ff9d00")
        ax.set_title(f"samples + Q25 estimate: L={l_est:.1f}px W={w_est:.1f}px")
    else:
        ax.set_title("no accepted samples (stationary fallback applies)"
                     if saw else "azimuth never computed")
    ax.legend()

    ax = axes[1, 0]
    ax.bar(["rows", "visible", "accepted"],
           [len(rows), int(vis.sum()), int(mask.sum())],
           color=["#7f7f7f", "#3274d9", "#2ca02c"])
    ax.set_title("filter funnel")

    ax = axes[1, 1]
    if len(valid) > 1:
        d = np.diff(np.stack([valid[:, 6], valid[:, 7]], 1), axis=0)
        az = np.arctan2(-d[:, 1], d[:, 0])
        ax.hist(np.rad2deg(az), bins=36, color="#9954bb")
        for c in np.rad2deg(CARDINALS):
            ax.axvline(c, color="#2ca02c", ls=":")
    ax.set_title("step azimuths vs cardinal directions")

    out = args.out or args.tracks.with_name(f"{args.tracks.stem}_dim_track{args.id}.pdf")
    fig.savefig(out, bbox_inches="tight")
    print(f"Wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
