"""Convert a YOLO-format dataset split into a COCO detection JSON.

Capability parity with reference tools/yolo_to_coco.py.

Usage:
  python tools/yolo_to_coco.py DATASET_DIR --split train \
      --classes car bus truck motorcycle -o annotations.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from _common import *  # noqa: F401,F403

from geotrax_tpu.train.data import list_samples, load_label  # noqa: E402


def convert(dataset_dir: Path, split: str, class_names: list) -> dict:
    from PIL import Image

    images, annotations = [], []
    ann_id = 1
    for img_id, (img_path, lbl_path) in enumerate(list_samples(dataset_dir, split), start=1):
        with Image.open(img_path) as img:
            w, h = img.size
        images.append({"id": img_id, "file_name": img_path.name, "width": w, "height": h})
        for cls, cx, cy, bw, bh in load_label(lbl_path).astype(float):
            x0 = float((cx - bw / 2) * w)
            y0 = float((cy - bh / 2) * h)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": int(cls) + 1,
                "bbox": [round(x0, 2), round(y0, 2), round(float(bw * w), 2), round(float(bh * h), 2)],
                "area": round(float(bw * w * bh * h), 2), "iscrowd": 0,
            })
            ann_id += 1
    categories = [{"id": i + 1, "name": n} for i, n in enumerate(class_names)]
    return {"images": images, "annotations": annotations, "categories": categories}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("dataset", type=Path)
    parser.add_argument("--split", default="train")
    parser.add_argument("--classes", nargs="+", default=["car", "bus", "truck", "motorcycle"])
    parser.add_argument("--out", "-o", type=Path, default=None)
    args = parser.parse_args()

    coco = convert(args.dataset, args.split, args.classes)
    out = args.out or args.dataset / f"{args.split}_coco.json"
    out.write_text(json.dumps(coco, indent=2))
    print(f"{len(coco['images'])} images, {len(coco['annotations'])} annotations -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
