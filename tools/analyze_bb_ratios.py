"""Per-class bounding-box length/width ratio statistics (the tau_c source).

Capability parity with reference tools/analyze_bb_ratios.py: over a YOLO
label folder, aggregate the max(w,h)/min(w,h) aspect ratio per class and
report quantiles — the basis for the dimension estimator's stationary
fallback thresholds (cfg extraction.dimension_estimation.tau_c).

Usage:
  python tools/analyze_bb_ratios.py LABELS_DIR [--classes car bus truck motorcycle]
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403

from geotrax_tpu.train.data import load_label  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("labels", type=Path, help="Folder of YOLO label .txt files")
    parser.add_argument("--classes", nargs="+", default=["car", "bus", "truck", "motorcycle"])
    args = parser.parse_args()

    ratios = defaultdict(list)
    for txt in sorted(Path(args.labels).rglob("*.txt")):
        for cls, _cx, _cy, w, h in load_label(txt):
            if w > 0 and h > 0:
                ratios[int(cls)].append(max(w, h) / min(w, h))

    if not ratios:
        print("No labels found.")
        return 1
    print(f"{'class':<12}{'n':>8}{'mean':>8}{'p10':>8}{'p25':>8}{'median':>8}{'p75':>8}")
    for cls in sorted(ratios):
        r = np.asarray(ratios[cls])
        name = args.classes[cls] if cls < len(args.classes) else str(cls)
        print(f"{name:<12}{len(r):>8}{r.mean():>8.2f}{np.percentile(r, 10):>8.2f}"
              f"{np.percentile(r, 25):>8.2f}{np.median(r):>8.2f}{np.percentile(r, 75):>8.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
