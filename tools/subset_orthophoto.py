"""Square PNG cutouts from a large (Geo)TIFF/PNG orthophoto + center files.

Capability parity with reference tools/subset_orthophoto.py (SURVEY.md §2.7):
given the big orthophoto mosaic and per-location center coordinates, write a
square cutout `<loc>.png` plus `<loc>_center.txt` holding the cutout center
in mosaic pixels — the inputs the georeferencing stage's 'center-text-file'
geo source consumes (geotrax_tpu/io/geoassets.py).

Usage:
  python tools/subset_orthophoto.py MOSAIC --centers "U=7000,6000" "K=9000,4500" \
      --width 15000 --out data/orthophotos [--resize 0.2]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403 — sys.path setup


def cut(mosaic: np.ndarray, cx: int, cy: int, width: int) -> np.ndarray:
    half = width // 2
    h, w = mosaic.shape[:2]
    x0, y0 = max(cx - half, 0), max(cy - half, 0)
    x1, y1 = min(cx + half, w), min(cy + half, h)
    out = np.zeros((width, width, mosaic.shape[2]), mosaic.dtype)
    out[y0 - (cy - half):y1 - (cy - half), x0 - (cx - half):x1 - (cx - half)] = mosaic[y0:y1, x0:x1]
    return out


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("mosaic", type=Path, help="Large orthophoto image")
    parser.add_argument("--centers", nargs="+", required=True,
                        help="LOC=cx,cy entries (mosaic pixel coordinates)")
    parser.add_argument("--width", type=int, default=15000, help="Cutout width [px]")
    parser.add_argument("--out", type=Path, default=Path("."), help="Output folder")
    parser.add_argument("--resize", type=float, default=None,
                        help="Optional downscale factor for the written PNG")
    args = parser.parse_args()

    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(args.mosaic) as img:
        mosaic = np.asarray(img.convert("RGB"))
    args.out.mkdir(parents=True, exist_ok=True)

    for entry in args.centers:
        loc, coords = entry.split("=")
        cx, cy = (int(v) for v in coords.split(","))
        cutout = cut(mosaic, cx, cy, args.width)
        img = Image.fromarray(cutout)
        if args.resize:
            size = int(args.width * args.resize)
            img = img.resize((size, size))
        img.save(args.out / f"{loc}.png")
        (args.out / f"{loc}_center.txt").write_text(f"{cx} {cy}\n")
        print(f"{loc}: cutout {args.width}px at ({cx},{cy}) -> {args.out / (loc + '.png')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
