"""COCO JSON annotation cleanup.

Capability parity with reference tools/fix_json_annotations.py: drop
degenerate boxes (zero/negative extent), clip boxes to image bounds,
re-sequence annotation ids, and optionally convert OBB (8-point segments)
to HBB bounding boxes.

Usage:
  python tools/fix_json_annotations.py ANN.json [-o FIXED.json] [--obb-to-hbb]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from _common import *  # noqa: F401,F403


def fix(coco: dict, obb_to_hbb: bool = False) -> tuple[dict, dict]:
    sizes = {img["id"]: (img["width"], img["height"]) for img in coco.get("images", [])}
    kept = []
    stats = {"dropped": 0, "clipped": 0, "converted": 0}
    for ann in coco.get("annotations", []):
        if obb_to_hbb and ann.get("segmentation"):
            seg = ann["segmentation"][0]
            xs, ys = seg[0::2], seg[1::2]
            ann["bbox"] = [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)]
            stats["converted"] += 1
        x, y, w, h = ann["bbox"]
        if w <= 0 or h <= 0:
            stats["dropped"] += 1
            continue
        img_w, img_h = sizes.get(ann["image_id"], (float("inf"), float("inf")))
        x2, y2 = min(x + w, img_w), min(y + h, img_h)
        x, y = max(x, 0), max(y, 0)
        if (x, y, x2 - x, y2 - y) != tuple(ann["bbox"]):
            stats["clipped"] += 1
        if x2 - x <= 0 or y2 - y <= 0:
            stats["dropped"] += 1
            continue
        ann["bbox"] = [round(x, 2), round(y, 2), round(x2 - x, 2), round(y2 - y, 2)]
        ann["area"] = round((x2 - x) * (y2 - y), 2)
        kept.append(ann)
    for i, ann in enumerate(kept, start=1):
        ann["id"] = i
    coco["annotations"] = kept
    return coco, stats


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("json_file", type=Path)
    parser.add_argument("--out", "-o", type=Path, default=None)
    parser.add_argument("--obb-to-hbb", action="store_true")
    args = parser.parse_args()

    coco = json.loads(args.json_file.read_text())
    fixed, stats = fix(coco, args.obb_to_hbb)
    out = args.out or args.json_file
    out.write_text(json.dumps(fixed, indent=2))
    print(f"{stats['dropped']} dropped, {stats['clipped']} clipped, "
          f"{stats['converted']} OBB->HBB -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
