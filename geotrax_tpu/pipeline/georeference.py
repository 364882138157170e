"""`geotrax georeference` — pixel tracks to WGS84 + local CRS with kinematics.

Stage parity with reference geotrax/georeference.py:109-889: stabilized pixel
tracks are mapped to the orthophoto via a (cached) master-frame two-hop
homography, then to geographic coordinates via the ortho's affine parameters,
then to a local projected CRS; speed/acceleration with scipy-compatible
smoothing, real-world dimension conversion, visibility, lane/section
assignment; writes the 17-column CSV and the geo homography file. The CRS
reprojection, smoothing, homography application and point-in-polygon tests
run as jitted JAX (see geotrax_tpu/ops/tmerc.py, filters.py, homography.py,
polygon.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from geotrax_tpu.utils.cli_utils import add_common_args
from geotrax_tpu.utils.logging_utils import setup_logger


def add_georeferencing_args(group) -> None:
    """Shared georeferencing flags for `georeference` and `batch`
    (parity with reference georeference.py:892-905)."""
    group.add_argument("--ortho-folder", "-orf", type=Path, default=None,
                       help="Folder with orthophotos (.png, .tif, .txt); default auto-detect ORTHOPHOTOS.")
    group.add_argument("--geo-source", "-gs", choices=["metadata-tif", "text-file", "center-text-file"],
                       default=None, help="Source of georeferencing parameters (default: auto-detect).")
    group.add_argument("--ref-frame", "-rf", type=int, default=None,
                       help="Reference frame number (must match the stabilization reference frame).")
    group.add_argument("--no-master", "-nm", action="store_const", const=True, default=None,
                       help="Disable the master-frame approach regardless of config.")
    group.add_argument("--master-folder", "-mf", type=Path, default=None,
                       help="Folder containing master frame files (.png).")
    group.add_argument("--recompute", "-r", action="store_const", const=True, default=None,
                       help="Force recompute of the master->ortho homography even if cached.")
    group.add_argument("--segmentation-folder", "-osf", type=Path, default=None,
                       help="Folder with lane-segmentation CSV files for lane assignment.")


def georeference(args: argparse.Namespace, logger) -> None:
    """Run the georeferencing stage for one video (library entry point)."""
    from geotrax_tpu.pipeline._georeference_impl import run_georeferencing

    run_georeferencing(args, logger)


def parse_cli_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Georeference tracking data using orthophotos (TPU-native)")
    parser.add_argument("source", type=Path, help="Path to the input video file.")
    optional = parser.add_argument_group("Optional arguments")
    add_common_args(optional)
    georef = parser.add_argument_group("Georeferencing arguments")
    add_georeferencing_args(georef)
    return parser.parse_args()


def main() -> int:
    args = parse_cli_args()
    logger = setup_logger("geotrax.georeference", args.verbose, args.log_path)
    georeference(args, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
