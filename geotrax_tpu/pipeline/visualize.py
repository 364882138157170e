"""`geotrax visualize` — annotated videos in 5 rendering modes.

Stage parity with reference geotrax/visualize.py:131-966: modes 0 original /
1 stabilized / 2 static reference frame / 3 rotated (oriented) boxes on the
original frame / 4 rotated boxes on the stabilized frame; fading track tails,
labels (id/class/speed/lane/conf), dashed outlines for fallback and
interpolated boxes, polygon clipping of edge-touching oriented boxes, optional
trajectory-overlay intro, live preview. Frame warping runs on-device
(geotrax_tpu/ops/warp.py); drawing is host-side.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from geotrax_tpu.utils.cli_utils import add_common_args
from geotrax_tpu.utils.logging_utils import setup_logger


def add_visualization_args(group, include_frame_range: bool = True) -> None:
    """Shared visualization flags for `visualize` and `batch`
    (parity with reference visualize.py:986-1041)."""
    opt = argparse.BooleanOptionalAction
    group.add_argument("--save", "-s", action=opt, default=None,
                       help="Save the annotated output video to file.")
    group.add_argument("--show", "-sh", action=opt, default=None,
                       help="Open a live preview window during processing.")
    group.add_argument("--viz-mode", "-vm", type=int, nargs="+", default=None,
                       choices=[0, 1, 2, 3, 4], metavar="MODE",
                       help="Frame source(s): 0 original, 1 stabilized, 2 reference frame, "
                            "3/4 rotated boxes on original/stabilized frame. One video per mode.")
    group.add_argument("--plot-trajectories", "-pt", action=opt, default=None,
                       help="Overlay trajectory positions on the first frame.")
    group.add_argument("--plot-delay", "-pd", type=int, default=None,
                       help="Frames to hold the trajectory overlay.")
    group.add_argument("--show-conf", "-sc", action=opt, default=None,
                       help="Include detection confidence in box labels.")
    group.add_argument("--show-lanes", "-sl", action=opt, default=None,
                       help="Include lane ID in box labels (requires georeferencing).")
    group.add_argument("--show-class-names", "-scn", action=opt, default=None,
                       help="Include class name in box labels.")
    group.add_argument("--hide-labels", "-hl", action=opt, default=None,
                       help="Suppress all label text overlays.")
    group.add_argument("--hide-tracks", "-ht", action=opt, default=None,
                       help="Suppress track tail lines.")
    group.add_argument("--hide-speed", "-hs", action=opt, default=None,
                       help="Suppress speed values in labels.")
    group.add_argument("--speed-unit", "-su", type=str, default=None, choices=["km/h", "mi/h"],
                       help="Speed display unit.")
    group.add_argument("--speed-deadzone", "-sdz", type=float, default=None,
                       help="Floor displayed speeds <= this value to 0; 0 disables.")
    group.add_argument("--class-filter", "-cf", type=int, nargs="+", default=None,
                       help="Class IDs to exclude from visualization.")
    group.add_argument("--tail-length", "-tl", type=int, default=None,
                       help="Track tail length [frames].")
    group.add_argument("--line-width", "-lw", type=int, default=None,
                       help="Box and track stroke width [px].")
    group.add_argument("--heading-smoothing", "-hsm", type=int, default=None,
                       help="(modes 3/4) Gaussian smoothing window [frames] for headings.")
    group.add_argument("--heading-min-speed", "-hms", type=float, default=None,
                       help="(modes 3/4) Min smoothed pixel speed for a reliable heading.")
    group.add_argument("--edge-clip-margin", "-ecm", type=float, default=None,
                       help="(modes 3/4) Edge-touch distance [px] that triggers oriented-box clipping.")
    group.add_argument("--edge-clip-smoothing", "-ecs", type=float, default=None,
                       help="(modes 3/4) Gaussian window [frames] for smoothing the clip rectangle.")
    if include_frame_range:
        group.add_argument("--cut-frame-left", "-cfl", type=int, default=None,
                           help="Skip the first N frames.")
        group.add_argument("--cut-frame-right", "-cfr", type=int, default=None,
                           help="Stop processing after this frame.")


def resolve_viz_modes(args: argparse.Namespace, logger) -> list:
    """Normalized viz modes, reading the config default when --viz-mode was not
    given; the resolved value is cached on args (parity with reference
    visualize.py:197-206)."""
    if args.viz_mode is None:
        from geotrax_tpu.utils.config_utils import load_config

        args.viz_mode = load_config(args.cfg, logger)["visualization"]["viz_mode"]
    return normalize_viz_modes(args.viz_mode, logger)


def normalize_viz_modes(viz_mode, logger) -> list:
    """Coerce a mode or list of modes into an ordered, de-duplicated list of
    valid mode ids; exits on invalid or empty input."""
    modes = list(viz_mode) if isinstance(viz_mode, (list, tuple)) else [viz_mode]
    valid: list[int] = []
    for mode in modes:
        if mode not in (0, 1, 2, 3, 4):
            logger.critical(f"Invalid visualization mode '{mode}'. Valid modes: 0-4.")
            sys.exit(1)
        if mode not in valid:
            valid.append(mode)
    if not valid:
        logger.critical("No visualization mode specified.")
        sys.exit(1)
    return valid


def visualize_results(args: argparse.Namespace, logger) -> None:
    """Run the visualization stage for one video (library entry point)."""
    from geotrax_tpu.pipeline._visualize_impl import run_visualization

    run_visualization(args, logger)


def parse_cli_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Tracking results visualization (TPU-native)")
    parser.add_argument("source", type=Path, help="Path to the input video file.")
    optional = parser.add_argument_group("Optional arguments")
    add_common_args(optional)
    optional.add_argument("--model", "-m", nargs="+", default=None, metavar="MODEL",
                          help="Model used only to resolve vehicle class names.")
    optional.add_argument("--class-names", "-cn", nargs="+", default=None, metavar="ID=NAME|FILE",
                          help="Class-id -> name mapping: a .yaml/.json file or ID=NAME pairs.")
    viz = parser.add_argument_group("Visualization arguments")
    add_visualization_args(viz)
    return parser.parse_args()


def main() -> int:
    args = parse_cli_args()
    logger = setup_logger("geotrax.visualize", args.verbose, args.log_path)
    visualize_results(args, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
