"""Render YOLO labels onto their images for inspection.

Capability parity with reference tools/viz_annotations.py (which imports
find_max_annotations, mirrored here): draws class-colored boxes, optionally
only for the N most-annotated images.

Usage:
  python tools/viz_annotations.py IMAGES_DIR LABELS_DIR -o OUT_DIR [--top 20]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403
from find_max_annotations import find_max_annotations  # noqa: E402

from geotrax_tpu.train.data import load_label  # noqa: E402
from geotrax_tpu.utils.data_utils import VizColors  # noqa: E402


def render(image_path: Path, label_path: Path) -> np.ndarray:
    import cv2

    from geotrax_tpu.io.geoassets import load_image

    img = np.ascontiguousarray(load_image(image_path)[..., ::-1])
    h, w = img.shape[:2]
    for cls, cx, cy, bw, bh in load_label(label_path):
        x0, y0 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
        x1, y1 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
        cv2.rectangle(img, (x0, y0), (x1, y1), VizColors.bgr(int(cls)), 2)
    return img[..., ::-1]


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("images", type=Path)
    parser.add_argument("labels", type=Path)
    parser.add_argument("--out", "-o", type=Path, required=True)
    parser.add_argument("--top", type=int, default=None,
                        help="Only render the N most-annotated images")
    args = parser.parse_args()

    from geotrax_tpu.io.geoassets import save_image

    label_files = [p for _, p in find_max_annotations(args.labels)]
    if args.top:
        label_files = label_files[: args.top]
    args.out.mkdir(parents=True, exist_ok=True)
    rendered = 0
    for lbl in label_files:
        for ext in (".jpg", ".jpeg", ".png", ".bmp"):
            img_path = args.images / (lbl.stem + ext)
            if img_path.exists():
                save_image(args.out / (lbl.stem + ".png"), render(img_path, lbl))
                rendered += 1
                break
    print(f"Rendered {rendered} annotated image(s) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
