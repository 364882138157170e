#!/usr/bin/env bash
# Recursive checkpoint export — counterpart of the reference's
# train/export.sh (.pt -> ONNX/TensorRT there; .pt -> native .npz here).
#
# Usage: train/export.sh CHECKPOINT_DIR [--bf16] [--check IMGSZ]
set -euo pipefail

DIR=${1:?usage: export.sh CHECKPOINT_DIR [--bf16] [--check IMGSZ]}
shift || true
TOOLS="$(dirname "$0")/../../tools"

find "$DIR" -name '*.pt' | while read -r ckpt; do
  out="${ckpt%.pt}.npz"
  echo "exporting $ckpt -> $out"
  python "$TOOLS/export_model.py" "$ckpt" -o "$out" "$@"
done
