"""Pre-label images with the detector, writing YOLO-format txt labels.

Capability parity with reference tools/annotate_frames.py: run the detector
over an image folder, write `labels/*.txt` (cls cx cy w h normalized),
optionally render the detections for review.

Usage:
  python tools/annotate_frames.py IMAGES_DIR --model weights.npz \
      [-c default] [--viz] [-o OUT_DIR]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403, sys.path

from geotrax_tpu.utils.logging_utils import setup_logger  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("images", type=Path)
    parser.add_argument("--model", "-m", required=True)
    parser.add_argument("--cfg", "-c", default="default")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--imgsz", type=int, default=None)
    parser.add_argument("--out", "-o", type=Path, default=None,
                        help="Output root (default: next to the images)")
    parser.add_argument("--viz", action="store_true", help="Also render the detections")
    args = parser.parse_args()

    logger = setup_logger("annotate_frames", dry_run=True)
    from geotrax_tpu.io.geoassets import load_image, save_image
    from geotrax_tpu.models.detector import Detector
    from geotrax_tpu.utils.config_utils import load_config

    detect_cfg = dict(load_config(args.cfg, logger).get("ultralytics", {}))
    detect_cfg["conf"] = args.conf
    if args.imgsz:
        detect_cfg["imgsz"] = args.imgsz
    detector = Detector(Path(args.model), detect_cfg, logger)

    out_root = args.out or args.images.parent
    labels_dir = out_root / "labels"
    labels_dir.mkdir(parents=True, exist_ok=True)
    viz_dir = out_root / "viz"
    if args.viz:
        viz_dir.mkdir(parents=True, exist_ok=True)

    from _common import iter_images

    n_images = n_boxes = 0
    for img_path in iter_images(args.images):
        img = load_image(img_path)
        h, w = img.shape[:2]
        det = detector(img)
        valid = np.asarray(det["valid"])
        boxes = np.asarray(det["boxes_xywh"])[valid]
        classes = np.asarray(det["classes"])[valid]
        lines = [
            f"{int(c)} {b[0] / w:.6f} {b[1] / h:.6f} {b[2] / w:.6f} {b[3] / h:.6f}"
            for b, c in zip(boxes, classes)
        ]
        (labels_dir / f"{img_path.stem}.txt").write_text("\n".join(lines))
        n_images += 1
        n_boxes += len(lines)
        if args.viz:
            import cv2

            from geotrax_tpu.utils.data_utils import VizColors

            canvas = np.ascontiguousarray(img[..., ::-1])
            for b, c in zip(boxes, classes):
                x0, y0 = int(b[0] - b[2] / 2), int(b[1] - b[3] / 2)
                x1, y1 = int(b[0] + b[2] / 2), int(b[1] + b[3] / 2)
                cv2.rectangle(canvas, (x0, y0), (x1, y1), VizColors.bgr(int(c)), 2)
            save_image(viz_dir / f"{img_path.stem}.png", canvas[..., ::-1])

    print(f"Annotated {n_images} image(s), {n_boxes} box(es) -> {labels_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
