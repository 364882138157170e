"""Shared CLI argument groups (parity with reference geotrax/utils/cli_utils.py:14-32).

Every stage exposes the same --cfg/--output-folder/--log-path/--verbose group;
stage-specific shared groups live in the stage modules so `batch` and the
individual stages expose identical flags.
"""

from __future__ import annotations

import argparse
from pathlib import Path

DEFAULT_CFG = "default"


def add_common_args(group, output_folder: bool = True) -> None:
    """Register the flags every stage shares on an argparse parser or group."""
    group.add_argument(
        "--cfg", "-c", type=str, default=DEFAULT_CFG,
        help="Pipeline config: a preset name (default/confident/lenient/stable) or a YAML path",
    )
    if output_folder:
        group.add_argument(
            "--output-folder", "-of", type=str, default=None,
            help="Output folder: bare name (created next to each input video) or absolute path",
        )
    group.add_argument("--log-path", "-lp", type=Path, default=None, help="Override the log-file directory")
    group.add_argument("--verbose", "-v", action="store_true", help="Debug-level console logging")
