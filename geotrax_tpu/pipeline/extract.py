"""`geotrax extract` — detection, tracking, and stabilization (pixel coords).

Stage parity with reference geotrax/extract.py:114-568. The TPU-native design
replaces the per-frame Python loop over cv2 + ultralytics + stabilo with a
host decode prefetch ring feeding a jitted device step (preprocess -> YOLOv8
forward -> NMS -> tracker update -> stabilization), with post-processing
(short-track removal, confidence-weighted class vote, azimuth dimension
estimation, gap interpolation) running as vectorized array ops.

Outputs (identical schemas to the reference, README "Output file formats"):
  results/<stem>.txt            12/14/15-col tracks
  results/<stem>_vid_transf.txt 10-col per-frame homographies
  <stem>.yaml                   run metadata next to the video
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from geotrax_tpu.utils.cli_utils import add_common_args
from geotrax_tpu.utils.logging_utils import setup_logger


def add_processing_args(group) -> None:
    """Shared detection/frame-range flags for `extract` and `batch`
    (parity with reference extract.py:571-584). All default to None and are
    backfilled from the config."""
    group.add_argument("--model", "-m", nargs="+", default=None, metavar="MODEL",
                       help="Detection model: local path (.pt/.npz) or hf://<org>/<repo>/<file> reference.")
    group.add_argument("--class-names", "-cn", nargs="+", default=None, metavar="ID=NAME|FILE",
                       help="Class-id -> name override: .yaml/.json file or inline ID=NAME pairs.")
    group.add_argument("--conf", "-co", type=float, default=None,
                       help="Detection confidence threshold (cfg -> ultralytics -> conf).")
    group.add_argument("--classes", "-cls", nargs="+", type=int, default=None,
                       help="Class IDs to extract (cfg -> ultralytics -> classes).")
    group.add_argument("--cut-frame-left", "-cfl", type=int, default=None,
                       help="Skip the first N frames (cfg -> processing -> cut_frame_left).")
    group.add_argument("--cut-frame-right", "-cfr", type=int, default=None,
                       help="Stop after this frame (cfg -> processing -> cut_frame_right).")
    group.add_argument("--tiles", "-t", type=int, default=None,
                       help="Detect over N overlapping vertical tiles merged by a global NMS "
                            "(small-object accuracy at 4K; cfg -> ultralytics -> tiles).")
    group.add_argument("--interpolate", action=argparse.BooleanOptionalAction, default=None,
                       help="Fill per-track frame gaps by linear interpolation (adds is_interpolated column).")
    group.add_argument("--profile", type=str, default=None, metavar="DIR",
                       help="Capture a JAX profiler trace of the extraction hot loop into DIR "
                            "(open with TensorBoard / xprof).")


def detect_track_stabilize(args: argparse.Namespace, logger) -> None:
    """Run the extraction stage for one video (library entry point)."""
    from geotrax_tpu.pipeline._extract_impl import run_extraction

    run_extraction(args, logger)


def parse_cli_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Vehicle detection, tracking, and stabilization (TPU-native)")
    parser.add_argument("source", type=Path, help="Path to the input video file.")
    optional = parser.add_argument_group("Optional arguments")
    add_common_args(optional)
    processing = parser.add_argument_group("Processing arguments")
    add_processing_args(processing)
    return parser.parse_args()


def main() -> int:
    args = parse_cli_args()
    logger = setup_logger("geotrax.extract", args.verbose, args.log_path)
    detect_track_stabilize(args, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
