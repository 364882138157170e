"""`geotrax plot` — trajectory / kinematics / distribution plots.

Stage parity with reference geotrax/plot.py:115-786: trajectory maps in every
coordinate system produced by the pipeline, violin speed/accel distributions,
class counts, dimension boxplots, per-vehicle kinematics detail, per-file or
aggregated per location ID, threshold-violation reporting, PDF output to a
plots/ sub-folder.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from geotrax_tpu.utils.cli_utils import DEFAULT_CFG, add_common_args
from geotrax_tpu.utils.logging_utils import setup_logger


def default_plot_args(**overrides) -> argparse.Namespace:
    """Namespace carrying this stage's defaults (single source of truth for
    callers like `geotrax batch`; parity with reference plot.py:758-786)."""
    defaults = {
        "input": None,
        "save": None,
        "show": None,
        "cfg": DEFAULT_CFG,
        "output_folder": None,
        "log_path": None,
        "verbose": False,
        "aggregate": None,
        "ortho_folder": None,
        "segmentation_folder": None,
        "segmentations": None,
        "id": 0,
        "points": None,
        "class_filter": None,
        "model": None,
        "class_names": None,
    }
    defaults.update(overrides)
    return argparse.Namespace(**defaults)


def add_plotting_args(group, dest_prefix: str = "") -> None:
    """Shared plotting flags for `plot` and `batch` (parity with reference
    plot.py:788-810). ``dest_prefix='plot_'`` avoids attribute collisions in
    batch's combined parser."""
    opt = argparse.BooleanOptionalAction
    group.add_argument("--plot-save", "-ps", dest=f"{dest_prefix}save", action=opt, default=None,
                       help="Save the plots as .pdf files.")
    group.add_argument("--plot-show", "-psh", dest=f"{dest_prefix}show", action=opt, default=None,
                       help="Show plots in an interactive window.")
    group.add_argument("--plot-aggregate", "-pa", dest=f"{dest_prefix}aggregate", action=opt, default=None,
                       help="Merge trajectories from all videos sharing a location ID into one plot.")
    group.add_argument("--plot-points", "-pp", dest=f"{dest_prefix}points", action=opt, default=None,
                       help="Plot discrete trajectory points instead of connected lines.")
    group.add_argument("--plot-segmentations", "-pseg", dest=f"{dest_prefix}segmentations", action=opt,
                       default=None, help="Also plot on the lane segmentation overlay PNG.")
    group.add_argument("--plot-class-filter", "-pcf", dest=f"{dest_prefix}class_filter",
                       type=int, nargs="+", default=None,
                       help="Class IDs to exclude from plots.")


def generate_plots(args: argparse.Namespace, logger) -> None:
    """Run the plotting stage (library entry point)."""
    from geotrax_tpu.pipeline._plot_impl import run_plotting

    run_plotting(args, logger)


def parse_cli_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Trajectory and distribution plotting (TPU-native)")
    parser.add_argument("input", type=Path,
                        help="A video file, a .txt/.csv results file, or a folder containing any of these.")
    optional = parser.add_argument_group("Optional arguments")
    add_common_args(optional)
    optional.add_argument("--model", "-m", nargs="+", default=None, metavar="MODEL",
                          help="Model used only to resolve vehicle class names.")
    optional.add_argument("--class-names", "-cn", nargs="+", default=None, metavar="ID=NAME|FILE",
                          help="Class-id -> name mapping.")
    background = parser.add_argument_group("Plot background arguments")
    background.add_argument("--ortho-folder", "-orf", type=Path, default=None,
                            help="Folder with orthophoto images used as plot backgrounds.")
    background.add_argument("--segmentation-folder", "-osf", type=Path, default=None,
                            help="Folder with lane segmentation CSVs and overlay PNGs.")
    plotting = parser.add_argument_group("Plotting arguments")
    add_plotting_args(plotting)
    plotting.add_argument("--id", "-i", type=int, default=0,
                          help="Vehicle ID to print/plot in detail (non-folder input only).")
    return parser.parse_args()


def main() -> int:
    args = parse_cli_args()
    logger = setup_logger("geotrax.plot", args.verbose, args.log_path)
    generate_plots(args, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
