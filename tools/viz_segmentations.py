"""Overlay lane/section polygons from segmentation CSVs onto orthophotos.

Capability parity with reference tools/viz_segmentations.py: for each
orthophoto `<loc>.png` with a matching `<loc>.csv` (10 columns: section,
lane, 4 corner points) draw the lane quads and section/lane labels, writing
the overlay PNG used as a plotting background (cfg plotting.use_segmentations).

Usage:
  python tools/viz_segmentations.py ORTHO_FOLDER [-sf SEG_FOLDER] [-o OUT]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from _common import *  # noqa: F401,F403

from geotrax_tpu.utils.data_utils import PlotColors  # noqa: E402


def overlay(ortho: np.ndarray, seg: pd.DataFrame) -> np.ndarray:
    import cv2

    out = ortho.copy()
    colors = PlotColors()
    layer = out.copy()
    for i, row in seg.iterrows():
        quad = np.array([
            [row.iloc[2], row.iloc[3]], [row.iloc[4], row.iloc[5]],
            [row.iloc[6], row.iloc[7]], [row.iloc[8], row.iloc[9]],
        ], np.int32)
        hex_color = colors(int(row.iloc[1]) if str(row.iloc[1]).isdigit() else i)
        bgr = tuple(int(hex_color[j:j + 2], 16) for j in (5, 3, 1))
        cv2.fillPoly(layer, [quad], bgr)
        cv2.polylines(out, [quad], True, bgr, 2)
        center = quad.mean(axis=0).astype(int)
        cv2.putText(out, f"{row.iloc[0]}/{row.iloc[1]}", tuple(center),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 2)
    cv2.addWeighted(layer, 0.35, out, 0.65, 0, out)
    return out


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("ortho_folder", type=Path)
    parser.add_argument("--segmentation-folder", "-sf", type=Path, default=None)
    parser.add_argument("--out", "-o", type=Path, default=None,
                        help="Output folder (default: the segmentation folder)")
    args = parser.parse_args()

    seg_folder = args.segmentation_folder or args.ortho_folder / "segmentations"
    out_folder = args.out or seg_folder
    out_folder.mkdir(parents=True, exist_ok=True)

    from geotrax_tpu.io.geoassets import load_image, save_image

    count = 0
    for csv_path in sorted(Path(seg_folder).glob("*.csv")):
        ortho_path = args.ortho_folder / f"{csv_path.stem}.png"
        if not ortho_path.exists():
            print(f"skip {csv_path.stem}: no orthophoto")
            continue
        seg = pd.read_csv(csv_path).iloc[:, :10]
        img = overlay(load_image(ortho_path), seg)
        save_image(out_folder / f"{csv_path.stem}.png", img)
        print(f"{csv_path.stem}: {len(seg)} lanes -> {out_folder / (csv_path.stem + '.png')}")
        count += 1
    if not count:
        print("No segmentation CSVs found.")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
