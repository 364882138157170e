#!/usr/bin/env bash
# Training launcher — counterpart of the reference's train/train.sh (which
# wraps the ultralytics CLI). Wraps `python -m geotrax_tpu.train` with the
# same conveniences: model-variant matrix, fine-tune from a checkpoint,
# resumable output dirs.
#
# Usage:
#   train/train.sh -d DATASET_DIR [-m yolov8s|yolov8n|...|weights.pt]
#                  [-e EPOCHS] [-b BATCH] [-i IMGSZ] [-o OUT_DIR] [-c CFG]
set -euo pipefail

DATA="" MODEL="" EPOCHS="" BATCH="" IMGSZ="" OUT="runs/train" CFG="default" EXTRA=()
while getopts "d:m:e:b:i:o:c:" opt; do
  case $opt in
    d) DATA=$OPTARG ;;
    m) MODEL=$OPTARG ;;
    e) EPOCHS=$OPTARG ;;
    b) BATCH=$OPTARG ;;
    i) IMGSZ=$OPTARG ;;
    o) OUT=$OPTARG ;;
    c) CFG=$OPTARG ;;
    *) echo "usage: $0 -d DATASET [-m MODEL] [-e EPOCHS] [-b BATCH] [-i IMGSZ] [-o OUT] [-c CFG]"; exit 2 ;;
  esac
done
[[ -n "$DATA" ]] || { echo "error: -d DATASET_DIR is required"; exit 2; }

ARGS=(--data "$DATA" --cfg "$CFG" --out "$OUT")
if [[ -n "$MODEL" ]]; then
  case $MODEL in
    yolov8?) ARGS+=(--variant "${MODEL: -1}") ;;   # variant name -> from scratch
    *)       ARGS+=(--model "$MODEL") ;;           # checkpoint path -> fine-tune
  esac
fi
[[ -n "$EPOCHS" ]] && ARGS+=(--epochs "$EPOCHS")
[[ -n "$BATCH"  ]] && ARGS+=(--batch "$BATCH")
[[ -n "$IMGSZ"  ]] && ARGS+=(--imgsz "$IMGSZ")

exec python -m geotrax_tpu.train "${ARGS[@]}"
