"""Bounding-box center error between two YOLO label sets (labels vs preds).

Capability parity with reference tools/compute_bb_center_error.py: match
boxes greedily by IoU per image and report the center-offset statistics in
pixels (requires image sizes; assumed square --imgsz unless images given).

Usage:
  python tools/compute_bb_center_error.py GT_LABELS PRED_LABELS --imgsz 1920
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403

from geotrax_tpu.train.data import load_label  # noqa: E402
from geotrax_tpu.train.metrics import _iou_np, _xywh_to_xyxy  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("gt_labels", type=Path)
    parser.add_argument("pred_labels", type=Path)
    parser.add_argument("--imgsz", type=int, default=1920)
    parser.add_argument("--iou", type=float, default=0.5, help="Match threshold")
    args = parser.parse_args()

    errors = []
    matched = missed = 0
    for gt_file in sorted(Path(args.gt_labels).glob("*.txt")):
        pred_file = Path(args.pred_labels) / gt_file.name
        gt = load_label(gt_file)[:, 1:5] * args.imgsz
        pred = load_label(pred_file)[:, 1:5] * args.imgsz if pred_file.exists() else np.zeros((0, 4))
        if not len(gt):
            continue
        if not len(pred):
            missed += len(gt)
            continue
        ious = _iou_np(_xywh_to_xyxy(gt), _xywh_to_xyxy(pred))
        used = np.zeros(len(pred), bool)
        for gi in np.argsort(-ious.max(axis=1)):
            order = np.argsort(-ious[gi])
            hit = next((pi for pi in order if ious[gi, pi] >= args.iou and not used[pi]), None)
            if hit is None:
                missed += 1
                continue
            used[hit] = True
            matched += 1
            errors.append(np.linalg.norm(gt[gi, :2] - pred[hit, :2]))

    if not errors:
        print("No matched boxes.")
        return 1
    e = np.asarray(errors)
    print(f"matched {matched}, missed {missed}")
    print(f"center error [px]: mean {e.mean():.2f}  median {np.median(e):.2f}  "
          f"p90 {np.percentile(e, 90):.2f}  max {e.max():.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
